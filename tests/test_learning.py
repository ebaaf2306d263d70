"""Learning-engine tests: KDE prior, loss functions (numpy oracles of the
reference math), metrics bins, and an end-to-end training smoke run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stratanet2_tpu.learning import kde as K
from stratanet2_tpu.learning import losses as L
from stratanet2_tpu.learning import metrics as M


class TestKde:
    def test_density_matches_direct_gaussian_sum(self, rng):
        z = rng.uniform(0, 20, 3000)
        mix = K.fit_kde_mixture(z)
        # direct weighted KDE oracle at a few query points
        z_sym = np.sort(np.concatenate([-z, z]))
        w1, w2, w3 = K._strata_weights(z_sym)
        q = np.array([0.1, 1.0, 3.0, 10.0])

        def direct(w, at):
            d = np.exp(-0.5 * ((at[:, None] - z_sym[None, :]) / K.BW) ** 2)
            return (d * w[None, :]).sum(1) / (K.BW * np.sqrt(2 * np.pi))

        # global max over a dense grid (the mixture's normalizer,
        # kde_mixture.py:96-99)
        dense = mix.grid[::7]
        mx = max(direct(w, dense).max() for w in (w1, w2, w3))
        y1, y2, y3 = direct(w1, q), direct(w2, q), direct(w3, q)
        assert np.max(mix.pdfs) == pytest.approx(1.0)
        p1, p2, p3 = mix.predict(q)
        for got, want in [(p1, y1 / mx), (p2, y2 / mx), (p3, y3 / mx)]:
            np.testing.assert_allclose(got, want, rtol=0.05, atol=5e-3)

    def test_strata_gating(self, rng):
        z = rng.uniform(0, 20, 5000)
        mix = K.fit_kde_mixture(z)
        p_g, p_m, p_h = mix.predict(np.array([0.2, 1.0, 8.0]))
        # ground pdf dominates near 0, medium in 0.5-1.5, high above
        assert p_g[0] > p_m[0] and p_g[0] > p_h[0]
        assert p_m[1] > p_g[1]
        assert p_h[2] > p_g[2] and p_h[2] > p_m[2]


class TestLosses:
    def test_absolute_loss_oracle(self, rng):
        pred = rng.uniform(0, 1, (6, 4)).astype(np.float32)
        gt = rng.uniform(0, 1, (6, 4)).astype(np.float32)
        got = float(L.absolute_loss(jnp.asarray(pred), jnp.asarray(gt)))
        want = np.sqrt((pred[:, [0, 2, 3]] - gt[:, [0, 2, 3]]) ** 2 + 1e-4).mean(0).mean()
        assert got == pytest.approx(float(want), rel=1e-5)

    def test_entropy_loss_oracle(self, rng):
        p = rng.uniform(0.01, 0.99, (50, 4)).astype(np.float32)
        got = float(L.entropy_loss(jnp.asarray(p)))
        q = p[:, 2:]
        want = -(q * np.log(q + 1e-4) + (1 - q) * np.log(1 - q + 1e-4)).mean()
        assert got == pytest.approx(float(want), rel=1e-5)

    def test_nll_loss_oracle(self, rng):
        grid = np.linspace(-1, 30, 500).astype(np.float32)
        pdfs = rng.uniform(0.01, 1, (3, 500)).astype(np.float32)
        proba = rng.dirichlet(np.ones(4), 40).astype(np.float32)
        z = rng.uniform(0, 25, 40).astype(np.float32)
        got, (p_all, pdf_all) = L.nll_loss(
            jnp.asarray(proba), jnp.asarray(z), jnp.asarray(grid), jnp.asarray(pdfs)
        )
        pg = np.interp(z, grid, pdfs[0])
        pm = np.interp(z, grid, pdfs[1])
        ph = np.interp(z, grid, pdfs[2])
        p = np.stack([proba[:, 0] + proba[:, 1], proba[:, 2], proba[:, 3]], 1)
        lik = (p * np.stack([pg, pm, ph], 1)).sum(1)
        assert float(got) == pytest.approx(float(-np.log(lik).mean()), rel=1e-4)
        assert p_all.shape == (40, 3) and pdf_all.shape == (40, 3)


class TestMetrics:
    def test_bins_borders_match_reference(self):
        np.testing.assert_allclose(
            M.bins_borders, [0.05, 0.18, 0.29, 0.42, 0.63, 0.83, 0.95, 1.05]
        )

    def test_closest_center(self):
        assert M.closest_class_center(0.47) == 0.5
        assert M.closest_class_center(0.0) == 0.0
        np.testing.assert_allclose(
            M.closest_class_center(np.array([0.12, 0.99])), [0.10, 1.0]
        )

    def test_mae_variants(self):
        # GT class 0.50 spans [0.42, 0.63]
        assert M.mae2(0.5, 0.5) == 0.0
        assert M.mae2(0.64, 0.5) == pytest.approx(0.01)
        assert M.mae2(0.40, 0.5) == pytest.approx(0.02)
        # neighbors of 0.50 are 0.33 [0.29,0.42] and 0.75 [0.63,0.83]
        assert M.mae3(0.30, 0.5) == 0.0
        assert M.mae3(0.85, 0.5) == pytest.approx(0.02)
        assert M.accuracy(0.45, 0.5) == 1
        assert M.accuracy(0.3, 0.5) == 0
        assert M.accuracy2(0.35, 0.5) == 1  # within 10pp margin
        assert M.accuracy3(0.3, 0.5) == 1  # within neighbor bounds

    def test_indicator_dataframes(self, rng):
        import pandas as pd

        n = 30
        df = pd.DataFrame(
            {
                "pl_id": [f"p{i}" for i in range(n)],
                **{
                    f"pred_{s}": rng.uniform(0, 1, n)
                    for s in ("veg_b", "veg_moy", "veg_h")
                },
                **{
                    f"vt_{s}": M.closest_class_center(rng.uniform(0, 1, n))
                    for s in ("veg_b", "veg_moy", "veg_h")
                },
            }
        )
        df = M.calculate_performance_indicators_v1(df)
        df = M.calculate_performance_indicators_v2(df)
        df = M.calculate_performance_indicators_v3(df)
        assert {"error_all", "acc_all", "error2_all", "acc2_all", "acc3_all"} <= set(df)
        # MAE ordering invariant: error3 <= error2 <= error
        assert np.all(df["error3_veg_b"] <= df["error2_veg_b"] + 1e-12)
        assert np.all(df["error2_veg_b"] <= df["error_veg_b"] + 1e-12)
        cm = M.compute_confusion_matrix(df, "veg_b")
        assert cm.shape == (8, 8)

    def test_confusion_pngs_do_not_clobber_across_folds(self, rng, tmp_path):
        """Training evals pass qualified=True so each fold/epoch keeps its
        own PNGs (the reference relied on Comet's per-step image log for
        this; a file-only sink must disambiguate in the name). Offline
        metascripts keep the bare reference-parity name."""
        import pandas as pd

        n = 12
        df = pd.DataFrame(
            {
                "pl_id": [f"p{i}" for i in range(n)],
                **{
                    f"pred_{s}": rng.uniform(0, 1, n)
                    for s in ("veg_b", "veg_moy", "veg_h")
                },
                **{
                    f"vt_{s}": M.closest_class_center(rng.uniform(0, 1, n))
                    for s in ("veg_b", "veg_moy", "veg_h")
                },
            }
        )
        out = str(tmp_path)
        M.log_confusion_matrices(df, out, fold_id=1, epoch=50, qualified=True)
        M.log_confusion_matrices(df, out, fold_id=2, epoch=50, qualified=True)
        M.log_confusion_matrices(df, out)  # metascript-style bare name
        import os

        names = sorted(os.listdir(out))
        for s in ("veg_b", "veg_moy", "veg_h"):
            assert f"confusion_true_{s}_fold_1_ep_50.png" in names
            assert f"confusion_true_{s}_fold_2_ep_50.png" in names
            assert f"confusion_true_{s}.png" in names

    def test_continuous_gt_skips_class_indicators(self, rng):
        import pandas as pd

        df = pd.DataFrame(
            {
                **{f"pred_{s}": rng.uniform(0, 1, 5) for s in M.STRATA},
                **{f"vt_{s}": [0.11, 0.22, 0.44, 0.57, 0.68] for s in M.STRATA},
            }
        )
        df = M.calculate_performance_indicators_v1(df)
        assert "error_all" in df and "acc_all" not in df
        with pytest.raises(KeyError):
            M.calculate_performance_indicators_v2(df)


class TestTrainSmoke:
    def test_train_full_end_to_end(self, tmp_path):
        from tests.synthetic import make_plot_dataset, tiny_config
        from stratanet2_tpu.learning.kde import fit_kde_mixture_from_dataset
        from stratanet2_tpu.learning.train import train_full
        from stratanet2_tpu.utils.experiment import MetricSink

        cfg = tiny_config()
        ds = make_plot_dataset(np.random.default_rng(0), n_plots=8, n_points=300)
        kde = fit_kde_mixture_from_dataset(ds)
        ids = np.array(sorted(ds.keys()))
        sink = MetricSink(str(tmp_path))
        ts, train_losses, test_losses, cloud_infos = train_full(
            ds, ids[:6], ids[6:], cfg, kde, str(tmp_path), sink, fold_id=1
        )
        assert len(train_losses) == cfg.train.n_epoch
        assert all(np.isfinite(d["total_loss"]) for d in train_losses)
        assert len(cloud_infos) == 2
        assert {"pred_veg_b", "vt_veg_h"} <= set(cloud_infos[0])
        import os

        assert os.path.exists(tmp_path / "PCC_model_fold_n=1.pt")
        # loss should not explode across 2 epochs
        assert train_losses[-1]["total_loss"] < train_losses[0]["total_loss"] * 3
        # last-epoch MAE histograms (reference learning/test.py:166-193)
        assert os.path.exists(tmp_path / "img" / "mae_histograms_fold_1.png")
        import json

        with open(tmp_path / "metrics.jsonl") as f:
            recorded = [json.loads(line) for line in f]
        hist = [r for r in recorded if "val_MAE_veg_moy_hist_counts" in r.get("metrics", {})]
        assert hist, "MAE histogram counts missing from the metric sink"
        counts = hist[-1]["metrics"]["val_MAE_veg_moy_hist_counts"]
        assert sum(counts) == len(cloud_infos)


class TestProgramCache:
    def test_cross_fold_cache_reuse_is_equivalent(self, tmp_path):
        """train_full's cross-fold program cache (learning/train.
        _PROGRAM_CACHE) must not change results: fold B trained with the
        programs cached by fold A equals fold B trained with a cleared
        cache."""
        from dataclasses import replace

        import numpy as np

        from tests.synthetic import make_plot_dataset, tiny_config
        from stratanet2_tpu.learning import train as T
        from stratanet2_tpu.learning.kde import fit_kde_mixture_from_dataset
        from stratanet2_tpu.utils.experiment import MetricSink

        cfg = tiny_config()
        cfg = replace(cfg, train=replace(cfg.train, n_epoch=2, n_epoch_test=2))
        ds = make_plot_dataset(np.random.default_rng(21), n_plots=10, n_points=250)
        kde = fit_kde_mixture_from_dataset(ds)
        ids = np.array(sorted(ds.keys()))
        folds = [(ids[:8], ids[8:]), (ids[2:], ids[:2])]

        def run(tag, clear_between):
            T._PROGRAM_CACHE.clear()
            outs = []
            for i, (tr, va) in enumerate(folds):
                if clear_between and i:
                    T._PROGRAM_CACHE.clear()
                out = tmp_path / f"{tag}_{i}"
                out.mkdir()
                sink = MetricSink(str(out))
                _, train_losses, test_losses, _ = T.train_full(
                    ds, tr, va, cfg, kde, str(out), sink, fold_id=i + 1
                )
                outs.append((train_losses, test_losses))
            return outs

        a = run("cached", clear_between=False)
        b = run("fresh", clear_between=True)
        for (tra, tea), (trb, teb) in zip(a, b):
            for da, db in zip(tra, trb):
                np.testing.assert_allclose(
                    da["total_loss"], db["total_loss"], rtol=1e-6
                )
            for da, db in zip(tea, teb):
                np.testing.assert_allclose(
                    da["total_loss"], db["total_loss"], rtol=1e-6
                )

def test_train_one_epoch_empty_loader_reports_zeroed_losses():
    """Fewer train plots than batch_size -> the drop_last loader yields no
    batches; the epoch must report the TRAIN loss schema (zeroed) — the
    same keys losses.total_loss emits on a real epoch, NOT eval's LOSS_KEYS
    (mixing schemas across folds pollutes the cross-fold DataFrame with
    spurious MAE_veg_* columns and drops entropy_loss)."""
    import jax

    from stratanet2_tpu.learning.train import train_one_epoch

    def no_step(*a):
        raise AssertionError("no batches expected")

    ts, means = train_one_epoch(no_step, _fake_ts(), [], jax.random.PRNGKey(0))
    train_schema = {"total_loss", "MAE_loss", "log_loss", "entropy_loss"}
    assert {k for k in means if k not in ("step", "points_per_sec")} == train_schema
    for k in train_schema:
        assert means[k] == 0.0
    assert means["step"] == 0


def _fake_ts():
    import jax.numpy as jnp

    from stratanet2_tpu.learning.train import TrainState

    return TrainState({}, {}, {}, jnp.asarray(0, jnp.int32))


class TestChainedTrainProgram:
    def test_scan_chained_steps_match_sequential(self, tmp_path):
        """bench.py config 3 chains train steps inside one lax.scan program
        (per-call dispatch through the axon relay is 2-7 ms of noise); the
        chained program must walk the SAME trajectory as sequential jitted
        step calls."""
        from dataclasses import replace

        from stratanet2_tpu.config import Config
        from stratanet2_tpu.learning.kde import fit_kde_mixture
        from stratanet2_tpu.learning.train import (
            init_train_state,
            make_optimizer,
            make_train_step,
        )

        cfg = Config(mode="DEV")
        cfg = replace(
            cfg,
            model=replace(cfg.model, subsample_size=128, k1=8, k2=8),
            train=replace(cfg.train, batch_size=2),
        )
        rng = np.random.default_rng(0)
        b, n = cfg.train.batch_size, cfg.model.subsample_size
        cloud = jnp.asarray(rng.random((b, n, 10), np.float32))
        xyz = jnp.asarray(rng.random((b, n, 3), np.float32) * 10.0)
        gt = jnp.asarray(rng.random((b, 4), np.float32))
        kde = fit_kde_mixture(rng.uniform(0, 20, 1000))
        opt = make_optimizer(cfg, steps_per_epoch=4)
        step = make_train_step(cfg, opt, kde)
        n_steps = 3
        keys = jax.random.split(jax.random.PRNGKey(7), n_steps)

        ts_seq = init_train_state(cfg, opt, seed=0)
        for k in keys:
            ts_seq, _ = step(ts_seq, cloud, xyz, gt, k)

        @jax.jit
        def chain(ts, cloud, xyz, gt, keys):
            def body(carry, k):
                nts, comps = step(carry, cloud, xyz, gt, k)
                return nts, comps["total_loss"]

            return jax.lax.scan(body, ts, keys)

        ts_chain, losses = chain(
            init_train_state(cfg, opt, seed=0), cloud, xyz, gt, keys
        )
        assert losses.shape == (n_steps,) and bool(jnp.all(jnp.isfinite(losses)))
        for a, c in zip(
            jax.tree_util.tree_leaves(ts_seq.params),
            jax.tree_util.tree_leaves(ts_chain.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=2e-5, atol=2e-6
            )
