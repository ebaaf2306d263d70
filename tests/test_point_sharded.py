"""Point-axis (context-parallel analogue) sharding tests on the 8-device
virtual mesh: sharded results must equal the single-device ops exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stratanet2_tpu.ops import ball_query, plotwise_coverages, raster_projection
from stratanet2_tpu.parallel.point_sharded import (
    ball_query_point_sharded,
    make_point_mesh,
    plotwise_coverages_point_sharded,
    raster_projection_point_sharded,
)


class TestPointSharded:
    def test_ball_query_matches_grouped_semantics(self, rng):
        mesh = make_point_mesh(8)
        n, c, k, r = 512, 32, 16, 1.0
        pts = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        cen = jnp.asarray(rng.normal(size=(c, 3)).astype(np.float32))
        gi, gm = ball_query_point_sharded(mesh, cen, pts, r, k)
        gi, gm = np.asarray(gi), np.asarray(gm)
        # semantics: nearest-in-radius per contiguous N/k block (device-
        # aligned grouped selection == ops grouped with the same groups)
        li, lm = ball_query(cen, pts, r, k, method="grouped")
        np.testing.assert_array_equal(gm, np.asarray(lm))
        d2 = np.sum((np.asarray(pts)[None] - np.asarray(cen)[:, None]) ** 2, -1)
        for cc in range(c):
            got = gi[cc][gm[cc]]
            want = np.asarray(li)[cc][np.asarray(lm)[cc]]
            np.testing.assert_allclose(
                np.sort(d2[cc][got]), np.sort(d2[cc][want]), rtol=1e-5
            )

    def test_plotwise_coverages_exact(self, rng):
        mesh = make_point_mesh(8)
        n = 800
        cov = jnp.asarray(rng.uniform(size=(n, 4)).astype(np.float32))
        xy = jnp.asarray(rng.uniform(-1, 1, size=(n, 2)).astype(np.float32))
        want = np.asarray(plotwise_coverages(cov[None], xy[None], 20))[0]
        got = np.asarray(
            plotwise_coverages_point_sharded(
                mesh, cov, xy, 20, xy.min(axis=0), xy.max(axis=0)
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_raster_projection_exact(self, rng):
        mesh = make_point_mesh(8)
        n = 640
        cov = jnp.asarray(rng.uniform(size=(n, 4)).astype(np.float32))
        xy = jnp.asarray(rng.uniform(-0.9, 0.9, size=(n, 2)).astype(np.float32))
        want = np.asarray(raster_projection(xy, cov, 20, 20))
        got = np.asarray(raster_projection_point_sharded(mesh, xy, cov, 20, 20))
        np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
        np.testing.assert_allclose(
            np.nan_to_num(got), np.nan_to_num(want), rtol=1e-6
        )


class TestPointShardedForward:
    """End-to-end point-sharded forward on a (batch x points) 2-D mesh
    (VERDICT round-1 item 4). The sharded plan (local FPS per shard == the
    partitioned FPS approximation, per-shard grouped ball query == the
    global contiguous groups when N % k1 == 0) makes sharded == unsharded
    exact when the unsharded run uses fps_parts == point-mesh size."""

    def _run(self, rng, db, dp):
        from dataclasses import replace

        from tests.synthetic import tiny_config
        from stratanet2_tpu.models import init_pointnet2, pointnet2_forward
        from stratanet2_tpu.parallel.point_sharded import (
            make_mesh_2d,
            pointnet2_forward_point_sharded,
        )

        cfg = tiny_config()
        mcfg = replace(
            cfg.model, subsample_size=512, fps_parts=dp, fps_min_part_samples=1
        )
        model = init_pointnet2(jax.random.PRNGKey(0), mcfg)
        b, n = 2 * db, mcfg.subsample_size
        assert n % mcfg.k1 == 0  # per-shard groups == global groups
        cloud = jnp.asarray(rng.uniform(0, 1, (b, n, 8)).astype(np.float32))
        xyz = jnp.asarray(rng.uniform(-10, 10, (b, n, 3)).astype(np.float32))

        cov_ref, proba_ref, _ = pointnet2_forward(
            model, cloud, xyz, mcfg, train=False
        )

        mesh = make_mesh_2d(db, dp)
        cov_sh, proba_sh = pointnet2_forward_point_sharded(
            model, cloud, xyz, mcfg, mesh
        )
        np.testing.assert_allclose(
            np.asarray(cov_sh), np.asarray(cov_ref), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(proba_sh), np.asarray(proba_ref), rtol=1e-5, atol=1e-6
        )

    def test_forward_matches_unsharded_2x4(self, rng):
        self._run(rng, db=2, dp=4)

    def test_forward_matches_unsharded_1x8(self, rng):
        self._run(rng, db=1, dp=8)

    def test_point_sharded_predict_step_matches_plain(self, rng):
        """The CLI-reachable point-sharded predict step (predict
        --point_sharded) matches the plain step: sharded forward + standard
        projections under one jit (r2 weak #7 — previously a library-only
        capability)."""
        from dataclasses import replace

        from tests.synthetic import tiny_config
        from stratanet2_tpu.inference.predict import (
            make_point_sharded_predict_step,
            make_predict_step,
        )
        from stratanet2_tpu.models import init_pointnet2

        cfg = tiny_config()
        cfg = replace(
            cfg,
            model=replace(
                cfg.model, subsample_size=512, fps_parts=8,
                fps_min_part_samples=1,
            ),
        )
        model = init_pointnet2(jax.random.PRNGKey(0), cfg.model)
        b, n = 2, cfg.model.subsample_size
        cloud = jnp.asarray(rng.uniform(0, 1, (b, n, 10)).astype(np.float32))
        xyz = jnp.asarray(rng.uniform(-9, 9, (b, n, 3)).astype(np.float32))

        plain = make_predict_step(cfg)
        sharded = make_point_sharded_predict_step(cfg, 8)
        r0, p0 = plain(model, cloud, xyz)
        r1, p1 = sharded(model, cloud, xyz)
        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p0), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(r1), np.asarray(r0), rtol=1e-5, atol=1e-6
        )

    def test_point_sharded_predict_step_validates_divisibility(self):
        from dataclasses import replace

        from tests.synthetic import tiny_config
        from stratanet2_tpu.inference.predict import (
            make_point_sharded_predict_step,
        )

        cfg = tiny_config()
        cfg = replace(cfg, model=replace(cfg.model, subsample_size=500))
        with pytest.raises(ValueError, match="divisible"):
            make_point_sharded_predict_step(cfg, 8)


class TestPointShardedTrainStep:
    """Context-parallel TRAINING: the point-sharded train step (forward +
    projection + 3-term loss + backward + Adam inside one shard_map)
    reproduces the unsharded make_train_step under the eval-forward
    exactness conditions (unsharded fps_parts == dp, N % k1 == 0)."""

    def _run(self, rng, db, dp):
        from dataclasses import replace

        from tests.synthetic import tiny_config
        from stratanet2_tpu.learning.kde import fit_kde_mixture
        from stratanet2_tpu.learning.train import (
            init_train_state,
            make_optimizer,
            make_train_step,
        )
        from stratanet2_tpu.parallel.point_sharded import (
            make_mesh_2d,
            make_point_sharded_train_step,
        )

        cfg = tiny_config()
        cfg = replace(
            cfg,
            model=replace(
                cfg.model, subsample_size=512, fps_parts=dp,
                fps_min_part_samples=1,
            ),
            train=replace(cfg.train, batch_size=2 * db),
        )
        mcfg = cfg.model
        assert mcfg.subsample_size % mcfg.k1 == 0

        kde = fit_kde_mixture(np.random.default_rng(0).uniform(0, 20, 2000))
        # SGD, not Adam: Adam's first update is ~sign(grad)*lr, so fp-noise
        # sign flips on near-zero gradients dominate a params comparison;
        # with SGD the param delta IS -lr*grad, directly comparable.
        import optax

        optimizer = optax.sgd(0.05)
        b, n = cfg.train.batch_size, mcfg.subsample_size
        cloud = jnp.asarray(rng.uniform(0, 1, (b, n, 10)).astype(np.float32))
        xyz = jnp.asarray(rng.uniform(-10, 10, (b, n, 3)).astype(np.float32))
        gt = jnp.asarray(rng.uniform(0, 1, (b, 4)).astype(np.float32))
        key = jax.random.PRNGKey(7)

        ts_ref = init_train_state(cfg, optimizer, seed=3)
        step_ref = make_train_step(cfg, optimizer, kde)
        ts_ref, comps_ref = step_ref(ts_ref, cloud, xyz, gt, key)

        mesh = make_mesh_2d(db, dp)
        ts_sh = init_train_state(cfg, optimizer, seed=3)
        step_sh = make_point_sharded_train_step(cfg, optimizer, kde, mesh)
        with mesh:
            ts_sh, comps_sh = step_sh(ts_sh, cloud, xyz, gt, key)

        comps_ref = jax.device_get(comps_ref)
        comps_sh = jax.device_get(comps_sh)
        for k in ("total_loss", "MAE_loss", "log_loss", "entropy_loss"):
            np.testing.assert_allclose(
                comps_sh[k], comps_ref[k], rtol=2e-5, atol=1e-6, err_msg=k
            )
        ts0 = init_train_state(cfg, optimizer, seed=3)
        jax.tree_util.tree_map(
            lambda a, b_, p0: np.testing.assert_allclose(
                np.asarray(a) - np.asarray(p0),
                np.asarray(b_) - np.asarray(p0),
                rtol=2e-3, atol=5e-7,
            ),
            jax.device_get(ts_sh.params), jax.device_get(ts_ref.params),
            jax.device_get(ts0.params),
        )
        # BN running stats pooled identically. rtol 3e-3: the shifted
        # one-pass variance cancels catastrophically on the FIRST step
        # (shift = initial running mean = 0), amplifying psum-vs-local
        # reduction-order noise; a wrong pooling (e.g. a missing psum or a
        # D-factor) would be orders of magnitude larger.
        jax.tree_util.tree_map(
            lambda a, b_: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=3e-3, atol=1e-5
            ),
            jax.device_get(ts_sh.model_state), jax.device_get(ts_ref.model_state),
        )

    def test_train_step_matches_unsharded_2x4(self, rng):
        self._run(rng, db=2, dp=4)

    def test_train_step_matches_unsharded_1x8(self, rng):
        self._run(rng, db=1, dp=8)


class TestPointShardedTrainFull:
    def test_train_full_point_sharded_matches_plain(self, rng, tmp_path):
        """train_full(point_sharded=True) (the cli.main --point_sharded
        path) reproduces the plain loop's loss trajectory under the
        exactness conditions (plain fps_parts == device count)."""
        from dataclasses import replace

        from tests.synthetic import make_plot_dataset, tiny_config
        from stratanet2_tpu.learning.kde import fit_kde_mixture_from_dataset
        from stratanet2_tpu.learning import train as T
        from stratanet2_tpu.utils.experiment import MetricSink

        cfg = tiny_config()
        cfg = replace(
            cfg,
            model=replace(
                cfg.model, subsample_size=512, fps_parts=8,
                fps_min_part_samples=1,
            ),
            train=replace(cfg.train, n_epoch=2, n_epoch_test=2),
            data=replace(cfg.data, device_resident="false"),
        )
        ds = make_plot_dataset(np.random.default_rng(31), n_plots=6, n_points=300)
        kde = fit_kde_mixture_from_dataset(ds)
        ids = np.array(sorted(ds.keys()))

        def run(tag, psh):
            T._PROGRAM_CACHE.clear()
            out = tmp_path / tag
            out.mkdir()
            sink = MetricSink(str(out))
            _, train_losses, test_losses, _ = T.train_full(
                ds, ids[:4], ids[4:], cfg, kde, str(out), sink, fold_id=1,
                point_sharded=psh,
            )
            return train_losses, test_losses

        tr_a, te_a = run("plain", False)
        tr_b, te_b = run("psh", True)
        for da, db in zip(tr_a, tr_b):
            np.testing.assert_allclose(
                da["total_loss"], db["total_loss"], rtol=3e-3
            )
        for da, db in zip(te_a, te_b):
            np.testing.assert_allclose(
                da["total_loss"], db["total_loss"], rtol=3e-3
            )


class TestPointShardedWiring:
    """Round-3 review fixes: eligibility fallback, mesh memoization, head
    dropout in the sharded step."""

    def test_make_mesh_2d_memoized(self):
        from stratanet2_tpu.parallel.point_sharded import make_mesh_2d

        # one Mesh object per shape: learning/train._cached_programs keys
        # jitted programs on id(mesh), so a fresh Mesh per fold would
        # defeat the cross-fold program cache
        assert make_mesh_2d(1, 8) is make_mesh_2d(1, 8)
        assert make_mesh_2d(2, 4) is make_mesh_2d(2, 4)

    def test_point_sharded_eligible_reasons(self):
        from dataclasses import replace

        from tests.synthetic import tiny_config
        from stratanet2_tpu.learning.train import point_sharded_eligible

        cfg = tiny_config()  # N=256, k1=8, n_centroids1 from DEV profile
        ok, why = point_sharded_eligible(cfg)
        n_dev = len(jax.devices())
        if cfg.model.n_centroids1 % n_dev == 0:
            assert ok, why
        bad = replace(cfg, model=replace(cfg.model, subsample_size=2 * n_dev + 1))
        ok, why = point_sharded_eligible(bad)
        assert not ok and "divisible" in why

    def test_head_dropout_active_in_sharded_step(self, rng):
        """drop > 0: different rng keys give different losses (the head
        dropout of models/pointnet2.py:391 runs in the sharded step too);
        drop == 0 stays deterministic."""
        from dataclasses import replace

        import optax

        from tests.synthetic import tiny_config
        from stratanet2_tpu.learning.kde import fit_kde_mixture
        from stratanet2_tpu.learning.train import init_train_state
        from stratanet2_tpu.parallel.point_sharded import (
            make_mesh_2d,
            make_point_sharded_train_step,
        )

        kde = fit_kde_mixture(np.random.default_rng(0).uniform(0, 20, 2000))
        optimizer = optax.sgd(0.05)
        mesh = make_mesh_2d(1, 8)

        def loss_for(drop, key):
            cfg = tiny_config()
            cfg = replace(
                cfg,
                model=replace(
                    cfg.model, subsample_size=512, fps_parts=8,
                    fps_min_part_samples=1, drop=drop,
                ),
                train=replace(cfg.train, batch_size=2),
            )
            b, n = cfg.train.batch_size, cfg.model.subsample_size
            r = np.random.default_rng(5)
            cloud = jnp.asarray(r.uniform(0, 1, (b, n, 10)).astype(np.float32))
            xyz = jnp.asarray(r.uniform(-10, 10, (b, n, 3)).astype(np.float32))
            gt = jnp.asarray(r.uniform(0, 1, (b, 4)).astype(np.float32))
            ts = init_train_state(cfg, optimizer, seed=3)
            step = make_point_sharded_train_step(cfg, optimizer, kde, mesh)
            with mesh:
                _, comps = step(ts, cloud, xyz, gt, jax.random.PRNGKey(key))
            return float(jax.device_get(comps["total_loss"]))

        assert loss_for(0.5, 0) != loss_for(0.5, 1)
        assert loss_for(0.0, 0) == loss_for(0.0, 1)

    def test_train_full_ineligible_falls_back_to_standard(
        self, rng, tmp_path, caplog
    ):
        """point_sharded=True with an ineligible geometry falls back to the
        FULL standard path (DP mesh honored, device-resident auto intact)
        instead of a silent single-device run."""
        import logging
        from dataclasses import replace

        from tests.synthetic import make_plot_dataset, tiny_config
        from stratanet2_tpu.learning.kde import fit_kde_mixture_from_dataset
        from stratanet2_tpu.learning import train as T
        from stratanet2_tpu.parallel import make_mesh
        from stratanet2_tpu.utils.experiment import MetricSink

        cfg = tiny_config()
        cfg = replace(
            cfg,
            # subsample_size 252 is not divisible by 8 devices
            model=replace(cfg.model, subsample_size=252),
            train=replace(cfg.train, n_epoch=1, n_epoch_test=1, batch_size=8),
        )
        ds = make_plot_dataset(np.random.default_rng(31), n_plots=6, n_points=300)
        kde = fit_kde_mixture_from_dataset(ds)
        ids = np.array(sorted(ds.keys()))
        mesh = make_mesh()
        T._PROGRAM_CACHE.clear()
        sink = MetricSink(str(tmp_path))
        with caplog.at_level(logging.WARNING):
            _, train_losses, _, _ = T.train_full(
                ds, ids[:4], ids[4:], cfg, kde, str(tmp_path), sink,
                fold_id=1, mesh=mesh, point_sharded=True,
            )
        assert any(
            "point-sharded training unavailable" in r.message
            and "divisible" in r.message
            for r in caplog.records
        )
        assert len(train_losses) == 1  # the standard path ran to completion
        # the program cache holds a standard-path entry, not point_sharded
        assert all(k[-1] != "point_sharded" for k in T._PROGRAM_CACHE)
