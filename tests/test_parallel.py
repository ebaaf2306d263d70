"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md §4c)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stratanet2_tpu.parallel import make_mesh, batch_sharding, replicate


class TestMesh:
    def test_eight_virtual_devices(self):
        assert len(jax.devices()) == 8

    def test_dryrun_multichip_inproc(self):
        """Under conftest's preset 8-device env the step runs in-process."""
        import __graft_entry__ as g

        g.dryrun_multichip(8)

    def test_dryrun_multichip_driver_env(self):
        """Regression for the round-1 driver failure (MULTICHIP_r01.json):
        dryrun_multichip must succeed in a FRESH interpreter that starts
        with a 1-device backend — the entry point must bootstrap the
        virtual mesh itself via subprocess re-exec. The child is pinned to
        CPU (and the axon sitecustomize kept off its PYTHONPATH) so the
        test can never touch the TPU relay under a killable timeout."""
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = {
            k: v
            for k, v in os.environ.items()
            if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")
        }
        env["PYTHONPATH"] = repo
        # belt-and-braces: PYTHONPATH without /root/.axon_site already keeps
        # the axon sitecustomize (and thus any relay RPC the 600 s timeout
        # could SIGKILL mid-flight) out of the child; pin CPU explicitly so
        # a future sitecustomize relocation cannot reintroduce it
        env["JAX_PLATFORMS"] = "cpu"
        r = subprocess.run(
            [
                sys.executable,
                "-c",
                "import __graft_entry__ as g; g.dryrun_multichip(8)",
            ],
            env=env,
            cwd=repo,
            capture_output=True,
            text=True,
            timeout=600,
        )
        assert r.returncode == 0, f"rc={r.returncode}\n{r.stdout}\n{r.stderr}"
        assert "dryrun_multichip OK" in r.stdout

    def test_dp_forward_matches_single_device(self):
        """Data-parallel sharded forward == replicated forward (bitwise-level
        tolerance): the sharding must not change the math."""
        from tests.synthetic import tiny_config
        from stratanet2_tpu.models import init_pointnet2, pointnet2_forward

        cfg = tiny_config()
        mcfg = cfg.model
        model = init_pointnet2(jax.random.PRNGKey(0), mcfg)
        b, n = 8, mcfg.subsample_size
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        cloud = jax.random.uniform(k1, (b, n, 8))
        xyz = jax.random.uniform(k2, (b, n, 3), minval=-10, maxval=10)

        cov_ref, proba_ref, _ = pointnet2_forward(model, cloud, xyz, mcfg, train=False)

        mesh = make_mesh(8)
        with mesh:
            model_r = replicate(mesh, model)
            cloud_s = jax.device_put(cloud, batch_sharding(mesh, 3))
            xyz_s = jax.device_put(xyz, batch_sharding(mesh, 3))
            cov_dp, proba_dp, _ = pointnet2_forward(
                model_r, cloud_s, xyz_s, mcfg, train=False
            )
        np.testing.assert_allclose(
            np.asarray(cov_ref), np.asarray(cov_dp), rtol=1e-5, atol=1e-6
        )

    def test_train_full_with_mesh(self, tmp_path):
        """The actual training loop runs data-parallel over the 8-device
        mesh and produces finite losses + a checkpoint."""
        import numpy as np

        from tests.synthetic import make_plot_dataset, tiny_config
        from stratanet2_tpu.learning.kde import fit_kde_mixture_from_dataset
        from stratanet2_tpu.learning.train import train_full
        from stratanet2_tpu.utils.experiment import MetricSink

        cfg = tiny_config()  # batch_size=4; mesh of 4 devices divides it
        ds = make_plot_dataset(np.random.default_rng(0), n_plots=8, n_points=300)
        kde = fit_kde_mixture_from_dataset(ds)
        ids = np.array(sorted(ds.keys()))
        mesh = make_mesh(4)
        sink = MetricSink(str(tmp_path))
        _, train_losses, test_losses, _ = train_full(
            ds, ids[:6], ids[6:], cfg, kde, str(tmp_path), sink,
            fold_id=1, mesh=mesh,
        )
        assert all(np.isfinite(d["total_loss"]) for d in train_losses)
        import os

        assert os.path.exists(tmp_path / "PCC_model_fold_n=1.pt")

    def test_sharded_predict_matches_single_device(self, rng):
        from tests.synthetic import tiny_config
        from stratanet2_tpu.inference.predict import make_predict_step
        from stratanet2_tpu.models import init_pointnet2

        cfg = tiny_config()
        model = init_pointnet2(jax.random.PRNGKey(0), cfg.model)
        b, n = 8, cfg.model.subsample_size
        cloud = jnp.asarray(rng.uniform(0, 1, (b, n, 10)).astype(np.float32))
        xyz = jnp.asarray(rng.uniform(-10, 10, (b, n, 3)).astype(np.float32))
        single = make_predict_step(cfg)
        sharded = make_predict_step(cfg, mesh=make_mesh(8))
        r1, p1 = single(model, cloud, xyz)
        r2, p2 = sharded(model, cloud, xyz)
        np.testing.assert_allclose(
            np.nan_to_num(np.asarray(r1)), np.nan_to_num(np.asarray(r2)),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5, atol=1e-6)

    def test_dp_grads_match_single_device(self):
        """Gradients under batch sharding equal single-device gradients —
        XLA's implicit psum replaces hand-written allreduce."""
        from tests.synthetic import make_plot_dataset, tiny_config
        from stratanet2_tpu.learning.kde import fit_kde_mixture
        from stratanet2_tpu.learning.losses import total_loss
        from stratanet2_tpu.models import init_pointnet2, pointnet2_forward
        from stratanet2_tpu.ops import plotwise_coverages

        cfg = tiny_config()
        mcfg = cfg.model
        kde = fit_kde_mixture(np.random.default_rng(0).uniform(0, 20, 1000))
        kg, kp = jnp.asarray(kde.grid), jnp.asarray(kde.pdfs)
        model = init_pointnet2(jax.random.PRNGKey(0), mcfg)
        b, n = 8, mcfg.subsample_size
        rng = np.random.default_rng(0)
        cloud = jnp.asarray(rng.uniform(0, 1, (b, n, 10)), jnp.float32)
        xyz = jnp.asarray(rng.uniform(-10, 10, (b, n, 3)), jnp.float32)
        gt = jnp.asarray(rng.uniform(0, 1, (b, 4)), jnp.float32)

        def loss_fn(params, cloud, xyz, gt):
            cov, proba, _ = pointnet2_forward(
                type(model)(params, model.state), cloud[..., 2:], xyz, mcfg, train=True
            )
            pred = plotwise_coverages(cov, cloud[..., :2], mcfg.diam_pix)
            loss, _ = total_loss(pred, gt, proba, cloud[..., 2] * mcfg.z_max, kg, kp, 0.1, 0.04)
            return loss

        g_ref = jax.grad(loss_fn)(model.params, cloud, xyz, gt)

        mesh = make_mesh(8)
        with mesh:
            params_r = replicate(mesh, model.params)
            args_s = [
                jax.device_put(a, batch_sharding(mesh, a.ndim))
                for a in (cloud, xyz, gt)
            ]
            g_dp = jax.jit(jax.grad(loss_fn))(params_r, *args_s)

        for a, b_ in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_dp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=1e-6)


class TestShardBatch:
    def test_mixed_leaf_ranks(self):
        """shard_batch must tolerate rank-0 and non-array leaves riding a
        batch dict (advisor r3: P('batch') on a 0-d value crashed)."""
        import jax
        import numpy as np

        from stratanet2_tpu.parallel import make_mesh, shard_batch

        mesh = make_mesh(8)
        tree = {
            "cloud": np.ones((8, 16, 3), np.float32),
            "epoch": 3,
            "name": "plot_a",  # non-array leaf passes through
        }
        out = shard_batch(mesh, tree)
        assert out["name"] == "plot_a"
        assert int(jax.device_get(out["epoch"])) == 3
        shardings = out["cloud"].sharding
        assert shardings.spec[0] == "batch"

    def test_make_mesh_rejects_oversized(self):
        import pytest

        from stratanet2_tpu.parallel import make_mesh

        with pytest.raises(AssertionError, match="devices available"):
            make_mesh(1024)
