"""Data-layer tests: LAS round-trip, exact z-normalization, per-item pipeline."""

import numpy as np
import pytest

from stratanet2_tpu.config import ModelConfig
from stratanet2_tpu.data import las, transforms
from tests.synthetic import make_plot_cloud


class TestLas:
    def test_roundtrip(self, rng, tmp_path):
        n = 137
        fields = {
            "x": rng.uniform(0, 1000, n),
            "y": rng.uniform(0, 1000, n),
            "z": rng.uniform(0, 30, n),
            "red": rng.integers(0, 65535, n),
            "green": rng.integers(0, 65535, n),
            "blue": rng.integers(0, 65535, n),
            "nir": rng.integers(0, 65535, n),
            "intensity": rng.integers(0, 32767, n),
            "return_num": rng.integers(1, 5, n),
            "num_returns": rng.integers(1, 7, n),
        }
        p = str(tmp_path / "t.las")
        las.write_las(p, fields)
        out = las.read_las(p)
        np.testing.assert_allclose(out.x, fields["x"], atol=0.006)  # cm quantization
        np.testing.assert_allclose(out.y, fields["y"], atol=0.006)
        np.testing.assert_allclose(out.z, fields["z"], atol=0.006)
        for name in ("red", "green", "blue", "nir", "intensity", "return_num", "num_returns"):
            np.testing.assert_array_equal(getattr(out, name), fields[name])


class TestLasLegacyFormats:
    def _build(self, fmt: int, rng, n=13):
        """Hand-assemble a minimal LAS 1.2 file of legacy point format
        `fmt` (2 = core+RGB, 3 = core+GPS+RGB) — the archive formats the
        reader supports but the (format-8-only) writer cannot produce."""
        import struct

        gps = 8 if fmt == 3 else 0
        rec_len = 20 + gps + 6
        header = bytearray(227)
        header[0:4] = b"LASF"
        header[24], header[25] = 1, 2  # version
        struct.pack_into("<H", header, 94, 227)  # header size
        struct.pack_into("<I", header, 96, 227)  # offset to points
        header[104] = fmt
        struct.pack_into("<H", header, 105, rec_len)
        struct.pack_into("<I", header, 107, n)
        struct.pack_into("<3d", header, 131, 0.01, 0.01, 0.01)  # scales
        struct.pack_into("<3d", header, 155, 100.0, 200.0, 0.0)  # offsets
        xi = rng.integers(-50000, 50000, n)
        yi = rng.integers(-50000, 50000, n)
        zi = rng.integers(0, 3000, n)
        inten = rng.integers(0, 30000, n)
        rn, nr = rng.integers(1, 6, n), rng.integers(1, 8, n)
        rgb = rng.integers(0, 65535, (n, 3))
        body = bytearray()
        for i in range(n):
            body += struct.pack("<iiiH", xi[i], yi[i], zi[i], inten[i])
            body += bytes([(nr[i] << 3) | rn[i], 0, 0, 0, 0, 0])  # flags..
            if gps:
                body += struct.pack("<d", 123.0)
            body += struct.pack("<3H", *rgb[i])
        expected = {
            "x": xi * 0.01 + 100.0, "y": yi * 0.01 + 200.0, "z": zi * 0.01,
            "intensity": inten, "return_num": rn, "num_returns": nr,
            "red": rgb[:, 0], "green": rgb[:, 1], "blue": rgb[:, 2],
        }
        return bytes(header) + bytes(body), expected

    @pytest.mark.parametrize("fmt", [2, 3])
    def test_read_legacy_format(self, fmt, tmp_path):
        rng = np.random.default_rng(fmt)
        blob, want = self._build(fmt, rng)
        p = tmp_path / f"legacy{fmt}.las"
        p.write_bytes(blob)
        from stratanet2_tpu.data import las

        out = las.read_las(str(p))
        np.testing.assert_allclose(out.x, want["x"], atol=1e-9)
        np.testing.assert_allclose(out.y, want["y"], atol=1e-9)
        np.testing.assert_allclose(out.z, want["z"], atol=1e-9)
        for name in ("intensity", "return_num", "num_returns", "red", "green", "blue"):
            np.testing.assert_array_equal(getattr(out, name), want[name])
        np.testing.assert_array_equal(out.nir, np.zeros(len(out.x)))


class TestZNorm:
    def test_matches_bruteforce(self, rng):
        n = 800
        xy = rng.uniform(0, 30, (n, 2))
        z = rng.uniform(0, 25, n)
        r = 1.5
        got = transforms.min_z_in_radius_numpy(xy, z, r)
        # brute-force oracle (the reference loop, utils/load_data.py:244-248)
        want = np.array(
            [z[np.sum((xy - xy[i]) ** 2, 1) <= r * r].min() for i in range(n)]
        )
        np.testing.assert_allclose(got, want)

    def test_self_is_neighbor(self, rng):
        xy = rng.uniform(0, 100, (50, 2))  # sparse: most points isolated
        z = rng.uniform(0, 10, 50)
        got = transforms.min_z_in_radius_numpy(xy, z, 0.01)
        np.testing.assert_allclose(got, z)

    def test_normalize_z(self, rng):
        cloud = make_plot_cloud(rng, n=300)
        out = transforms.normalize_z_with_minz_in_a_radius(cloud, 1.5)
        assert np.all(out[2] >= 0)
        assert np.all(out[2] <= cloud[2])  # subtracting a min <= z


class TestItemPipeline:
    def test_fake_ground_points(self):
        cloud = np.ones((10, 5), np.float32)
        out = transforms.add_fake_empty_ground_points(cloud, 20, 10)
        # pixel centers with r < 10 in a 20x20 grid: 316 (reference grid math,
        # data_loader/loader.py:90-105)
        # pin the REFERENCE count (316) rather than recomputing it through
        # the same helper the implementation uses — a grid-math regression
        # would otherwise shift implementation and expectation in lockstep
        k = 316
        assert out.shape == (10, 5 + k)
        assert np.all(out[2, 5:] == 0)  # fake z = 0
        assert np.all(out[3:, 5:] == 0)  # zero features

    def test_rescale(self, rng):
        cloud = make_plot_cloud(rng, n=100)
        out = transforms.rescale_cloud(cloud.copy(), z_max=24.24)
        np.testing.assert_allclose(out[0], cloud[0] / 10, rtol=1e-6)
        np.testing.assert_allclose(out[2], cloud[2] / 24.24, rtol=1e-5)
        assert np.all(out[3:7] <= 1.0)
        np.testing.assert_allclose(out[8], (cloud[8] - 1) / 6, rtol=1e-6)

    def test_augment_preserves_radii(self, rng):
        cloud = make_plot_cloud(rng, n=200)
        cloud = transforms.center_cloud(cloud, [cloud[0].mean(), cloud[1].mean()])
        xyz = cloud[:3].copy()
        g = np.random.default_rng(3)
        _, xyz2 = transforms.augment(cloud.copy(), xyz.copy(), g)
        r1 = np.sqrt(xyz[0] ** 2 + xyz[1] ** 2)
        r2 = np.sqrt(xyz2[0] ** 2 + xyz2[1] ** 2)
        np.testing.assert_allclose(r1, r2, rtol=1e-4)  # rotation+flip are isometries
        np.testing.assert_array_equal(xyz[2], xyz2[2])

    def test_sample_cloud_sizes(self, rng):
        g = np.random.default_rng(0)
        big = np.ones((10, 500), np.float32)
        out, idx = transforms.sample_cloud(big, 128, g)
        assert out.shape == (10, 128) and len(set(idx.tolist())) == 128
        small = np.ones((10, 50), np.float32)
        out, idx = transforms.sample_cloud(small, 128, g)
        assert out.shape == (10, 128)
        assert set(idx[:50].tolist()) == set(range(50))  # all originals kept

    def test_load_cloud_item_shapes(self, rng):
        from tests.synthetic import make_plot_dataset, tiny_config

        cfg = tiny_config()
        ds = make_plot_dataset(np.random.default_rng(0), n_plots=1)
        item = transforms.load_cloud_item(
            ds["PLOT_000"], cfg.model, train=True, rng=np.random.default_rng(1)
        )
        n = cfg.model.subsample_size
        assert item["cloud"].shape == (n, 10)
        assert item["xyz"].shape == (n, 3)
        # xyz is centered: within the 10m plot radius plus noise
        assert np.abs(item["xyz"][:, :2]).max() < 12.0
        # cloud xy is rescaled /10
        assert np.abs(item["cloud"][:, :2]).max() < 1.2

    def test_absolute_lambert93_coords_center_exactly(self, rng):
        """Absolute Lambert-93 coordinates (y ~ 6.5e6 m: float32 spacing
        0.5 m) must be centered in float64 — relative coordinates come out
        exact, not quantized to a 0.5 m grid."""
        from tests.synthetic import tiny_config

        import dataclasses

        cfg = tiny_config()
        n = 256
        # subsample larger than n + fake points so no original is dropped
        mcfg = dataclasses.replace(cfg.model, subsample_size=2048)
        rel = rng.uniform(-9, 9, (2, n))
        cloud = np.zeros((10, n), np.float64)
        cloud[0] = 368000.0 + rel[0]  # typical French easting
        cloud[1] = 6505000.0 + rel[1]  # northing in the 0.5m-spacing zone
        cloud[2] = rng.uniform(0.5, 5, n)  # fake ground points sit at z=0
        data = {
            "cloud": cloud,
            "plot_center": np.array([368000.0, 6505000.0]),
            "plot_id": "PP_ABS",
            "coverages": np.empty(0),
        }
        item = transforms.load_cloud_item(
            data, mcfg, train=False, rng=np.random.default_rng(0)
        )
        got = item["xyz"][item["xyz"][:, 2] > 1e-9, :2]  # real points only
        want = rel.T.astype(np.float32)
        # every retained relative coordinate must match an original to
        # float32 roundoff (~1e-6), not the 0.25 m absolute-coord grid the
        # old float32-before-centering path produced
        d = np.abs(got[:, None, :] - want[None, :, :]).sum(-1).min(1)
        assert d.max() < 1e-4, d.max()

    def test_collate_mixed_coverages_fails_loudly(self):
        from tests.synthetic import make_plot_dataset, tiny_config
        from stratanet2_tpu.data.loader import PlotLoader

        cfg = tiny_config()
        ds = make_plot_dataset(np.random.default_rng(0), n_plots=4)
        ids = sorted(ds)
        ds[ids[2]]["coverages"] = np.empty(0)  # one plot loses its GT
        loader = PlotLoader(ds, cfg, plot_ids=ids, train=False, batch_size=4, seed=0)
        with pytest.raises(ValueError, match=ids[2]):
            for _ in loader:
                pass


class TestTransferDtype:
    def test_float16_transfer_roundtrip(self):
        """transfer_dtype=float16 halves the wire bytes; train/eval/predict
        steps cast back to f32 on device, and the quantization stays ~1e-3
        relative on the rescaled features."""
        from dataclasses import replace

        import jax
        import jax.numpy as jnp

        from tests.synthetic import make_plot_cloud, tiny_config
        from stratanet2_tpu.data.loader import PlotLoader
        from stratanet2_tpu.inference.predict import make_predict_step
        from stratanet2_tpu.models import init_pointnet2

        cfg = tiny_config()
        cfg16 = replace(cfg, data=replace(cfg.data, transfer_dtype="float16"))
        rng = np.random.default_rng(3)
        dataset = {}
        for i in range(2):
            c = make_plot_cloud(rng, n=400, center=(i * 40.0, 0.0))
            dataset[f"P{i}"] = {
                "cloud": c, "coverages": np.array([]),
                "plot_center": np.array([i * 40.0, 0.0]),
                "plot_id": f"P{i}", "N_points_in_cloud": c.shape[1], "index": i,
            }
        b32 = next(iter(PlotLoader(dataset, cfg, train=False)))
        b16 = next(iter(PlotLoader(dataset, cfg16, train=False)))
        assert b16["cloud"].dtype == np.float16 and b16["xyz"].dtype == np.float16
        assert b32["cloud"].dtype == np.float32
        np.testing.assert_allclose(
            b16["xyz"].astype(np.float32), b32["xyz"], rtol=1e-3, atol=2e-2
        )

        model = init_pointnet2(jax.random.PRNGKey(0), cfg.model)
        step = make_predict_step(cfg)
        r32, p32 = step(model, jnp.asarray(b32["cloud"]), jnp.asarray(b32["xyz"]))
        r16, p16 = step(model, jnp.asarray(b16["cloud"]), jnp.asarray(b16["xyz"]))
        assert r16.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(p16), np.asarray(p32), atol=0.02
        )


class TestDeviceDataset:
    """Device-resident dataset (data/device_dataset.py): the HBM-resident
    build must reproduce the host pipeline's deterministic prefix, and the
    key-sort subsample must match sample_cloud's distribution semantics
    (data_loader/loader.py:233-246)."""

    def _dataset(self, rng, n_plots=6, n_points=300):
        from tests.synthetic import make_plot_dataset

        return make_plot_dataset(rng, n_plots=n_plots, n_points=n_points)

    def test_build_matches_host_prefix(self):
        """feats/xyz rows [:n] equal the host center->fake->rescale prefix
        (load_cloud_item with augmentation and subsampling stripped)."""
        import numpy as np

        from tests.synthetic import tiny_config
        from stratanet2_tpu.data.device_dataset import build_device_dataset
        from stratanet2_tpu.data.transforms import (
            add_fake_empty_ground_points,
            center_cloud,
            rescale_cloud,
        )

        rng = np.random.default_rng(0)
        ds = self._dataset(rng)
        cfg = tiny_config()
        pids = sorted(ds.keys())
        dd = build_device_dataset(ds, pids, cfg.model)
        for p, pid in enumerate(pids):
            cloud = np.asarray(ds[pid]["cloud"], np.float32)
            cloud = center_cloud(cloud, ds[pid]["plot_center"])
            cloud = add_fake_empty_ground_points(
                cloud, cfg.model.diam_meters, cfg.model.n_input_feats
            )
            xyz = cloud[:3].copy()
            cloud = rescale_cloud(cloud, cfg.model.z_max)
            n = int(dd.n[p])
            assert n == cloud.shape[1]
            np.testing.assert_allclose(
                np.asarray(dd.feats[p, :n]), cloud.T, rtol=1e-6
            )
            np.testing.assert_allclose(np.asarray(dd.xyz[p, :n]), xyz.T, rtol=1e-6)
            # cycle padding repeats real rows
            m = dd.feats.shape[1]
            if m > n:
                np.testing.assert_allclose(
                    np.asarray(dd.feats[p, n:]), cloud.T[np.arange(m - n) % n]
                )

    def test_build_rejects_mixed_coverages(self):
        """A malformed GT entry mixed into a supervised fold must raise, not
        silently zero the whole (P, 0) table (advisor r3)."""
        import numpy as np
        import pytest

        from tests.synthetic import tiny_config
        from stratanet2_tpu.data.device_dataset import build_device_dataset

        rng = np.random.default_rng(3)
        ds = self._dataset(rng)
        pids = sorted(ds.keys())
        ds[pids[1]] = dict(ds[pids[1]], coverages=np.zeros(3, np.float32))
        with pytest.raises(ValueError, match="malformed"):
            build_device_dataset(ds, pids, tiny_config().model)
        # uniformly wrong width (every plot size 3) must ALSO raise — only
        # size 0 marks a legitimate no-GT (SSL) plot
        for pid in pids:
            ds[pid] = dict(ds[pid], coverages=np.zeros(3, np.float32))
        with pytest.raises(ValueError, match="malformed"):
            build_device_dataset(ds, pids, tiny_config().model)
        # all-empty (SSL) folds still build with a (P, 0) table
        for pid in pids:
            ds[pid] = {k: v for k, v in ds[pid].items() if k != "coverages"}
        dd = build_device_dataset(ds, pids, tiny_config().model)
        assert dd.coverages.shape == (len(pids), 0)

    def test_eval_sampler_picks_uniform_original_subset(self):
        import numpy as np
        import jax

        from tests.synthetic import tiny_config
        from stratanet2_tpu.data.device_dataset import (
            build_device_dataset,
            make_device_sampler,
        )

        rng = np.random.default_rng(1)
        ds = self._dataset(rng, n_plots=4, n_points=400)
        cfg = tiny_config()
        pids = sorted(ds.keys())
        dd = build_device_dataset(ds, pids, cfg.model)
        sample = make_device_sampler(cfg.model, train=False)
        batch = sample(dd, np.arange(4, dtype=np.int32), jax.random.PRNGKey(7))
        N = cfg.model.subsample_size
        assert batch["cloud"].shape == (4, N, cfg.model.n_input_feats)
        assert batch["xyz"].shape == (4, N, 3)
        for p in range(4):
            n = int(dd.n[p])
            rows = {tuple(r) for r in np.asarray(dd.feats[p, :n]).round(6).tolist()}
            got = np.asarray(batch["cloud"][p]).round(6)
            assert all(tuple(r) in rows for r in got.tolist())
            if n >= N:  # exact subset without replacement -> all distinct
                assert len({tuple(r) for r in got.tolist()}) == N

    def test_undersized_plot_keeps_all_originals(self):
        import numpy as np
        import jax

        from tests.synthetic import tiny_config
        from stratanet2_tpu.data.device_dataset import (
            build_device_dataset,
            make_device_sampler,
        )

        from dataclasses import replace

        rng = np.random.default_rng(2)
        ds = self._dataset(rng, n_plots=2, n_points=60)
        # 60 real + ~316 fake ground points < subsample_size=512
        cfg = tiny_config()
        cfg = replace(cfg, model=replace(cfg.model, subsample_size=512))
        pids = sorted(ds.keys())
        dd = build_device_dataset(ds, pids, cfg.model)
        sample = make_device_sampler(cfg.model, train=False)
        batch = sample(dd, np.arange(2, dtype=np.int32), jax.random.PRNGKey(3))
        for p in range(2):
            n = int(dd.n[p])
            orig = np.asarray(dd.feats[p, :n]).round(6)
            got = {tuple(r) for r in np.asarray(batch["cloud"][p]).round(6).tolist()}
            missing = [i for i in range(n) if tuple(orig[i].tolist()) not in got]
            assert not missing, f"originals dropped: {missing[:5]}"

    def test_train_full_device_resident(self, tmp_path):
        """End-to-end: train_full with data.device_resident=True runs the
        one-program-per-epoch path and produces finite, stable losses plus
        the usual checkpoint artifacts."""
        from dataclasses import replace

        import numpy as np

        from tests.synthetic import make_plot_dataset, tiny_config
        from stratanet2_tpu.learning.kde import fit_kde_mixture_from_dataset
        from stratanet2_tpu.learning.train import train_full
        from stratanet2_tpu.utils.experiment import MetricSink

        cfg = tiny_config()
        cfg = replace(cfg, data=replace(cfg.data, device_resident=True))
        ds = make_plot_dataset(np.random.default_rng(5), n_plots=8, n_points=300)
        kde = fit_kde_mixture_from_dataset(ds)
        ids = np.array(sorted(ds.keys()))
        sink = MetricSink(str(tmp_path))
        ts, train_losses, test_losses, _ = train_full(
            ds, ids[:6], ids[6:], cfg, kde, str(tmp_path), sink, fold_id=1
        )
        assert len(train_losses) == cfg.train.n_epoch
        assert all(np.isfinite(d["total_loss"]) for d in train_losses)
        assert train_losses[-1]["total_loss"] < train_losses[0]["total_loss"] * 3
        import os

        assert os.path.exists(tmp_path / "PCC_model_fold_n=1.pt")

    def test_device_epoch_dp_matches_single(self, tmp_path):
        """make_device_epoch(mesh=...) over a 4-device batch-sharded mesh
        reproduces the single-device epoch exactly (same RNG streams; GSPMD
        only changes the reduction placement)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from tests.synthetic import make_plot_dataset, tiny_config
        from stratanet2_tpu.data.device_dataset import (
            build_device_dataset,
            epoch_index_table,
            make_device_epoch,
        )
        from stratanet2_tpu.learning.kde import fit_kde_mixture_from_dataset
        from stratanet2_tpu.learning.train import (
            init_train_state,
            make_optimizer,
            make_train_step,
        )
        from stratanet2_tpu.parallel.mesh import make_mesh

        cfg = tiny_config()
        ds = make_plot_dataset(np.random.default_rng(9), n_plots=8, n_points=300)
        kde = fit_kde_mixture_from_dataset(ds)
        pids = sorted(ds.keys())
        dd = build_device_dataset(ds, pids, cfg.model)
        optimizer = make_optimizer(cfg, steps_per_epoch=2)
        step = make_train_step(cfg, optimizer, kde, jit=False)

        idx = jnp.asarray(epoch_index_table(len(pids), cfg.train.batch_size, 0, 1))
        key = jax.random.PRNGKey(11)

        ts1 = init_train_state(cfg, optimizer, seed=3)
        ef1 = make_device_epoch(cfg, step)
        ts1, sums1 = ef1(ts1, dd.feats, dd.xyz, dd.n, dd.coverages, idx, key)

        mesh = make_mesh(4)
        ts2 = init_train_state(cfg, optimizer, seed=3)
        ef2 = make_device_epoch(cfg, step, mesh=mesh)
        ts2, sums2 = ef2(ts2, dd.feats, dd.xyz, dd.n, dd.coverages, idx, key)

        for k_, v in jax.device_get(sums1).items():
            np.testing.assert_allclose(
                v, jax.device_get(sums2)[k_], rtol=2e-5, atol=1e-6, err_msg=k_
            )
        p1 = jax.device_get(ts1.params)
        p2 = jax.device_get(ts2.params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6),
            p1, p2,
        )

    def test_device_resident_auto_resolution(self, tmp_path):
        """'auto' engages when the estimated fold footprint fits the cap and
        backs off above it; explicit 'true'/'false' force the choice."""
        from dataclasses import replace

        import numpy as np

        from tests.synthetic import make_plot_dataset, tiny_config
        from stratanet2_tpu.learning.kde import fit_kde_mixture_from_dataset
        from stratanet2_tpu.learning.train import train_full
        from stratanet2_tpu.utils.experiment import MetricSink

        ds = make_plot_dataset(np.random.default_rng(7), n_plots=8, n_points=300)
        kde = fit_kde_mixture_from_dataset(ds)
        ids = np.array(sorted(ds.keys()))

        for dr, cap, expect in [
            ("auto", 2_000_000_000, True),
            ("auto", 1, False),
            ("false", 2_000_000_000, False),
        ]:
            cfg = tiny_config()
            cfg = replace(
                cfg,
                data=replace(
                    cfg.data, device_resident=dr, device_resident_max_bytes=cap
                ),
                train=replace(cfg.train, n_epoch=1, n_epoch_test=5),
            )
            out = tmp_path / f"run_{dr}_{cap}"
            out.mkdir()
            sink = MetricSink(str(out))
            import logging

            records = []
            h = logging.Handler()
            h.emit = lambda rec: records.append(rec.getMessage())
            lg = logging.getLogger("stratanet2_tpu")
            prev_level = lg.level
            lg.setLevel(logging.INFO)
            lg.addHandler(h)
            try:
                train_full(ds, ids[:6], ids[6:], cfg, kde, str(out), sink, fold_id=1)
            finally:
                lg.removeHandler(h)
                lg.setLevel(prev_level)
            used = any("Device-resident dataset" in m for m in records)
            assert used == expect, (dr, cap, records[:5])


class TestDeviceEval:
    """Device-resident eval program (data/device_dataset.make_device_eval +
    learning/evaluate's fast path)."""

    def test_device_eval_matches_eval_step_on_same_batches(self):
        """The one-program eval equals the host-loader eval step fed the
        SAME sampled batches (validates the scan composition; the math body
        is shared via make_eval_core)."""
        import numpy as np
        import jax
        import jax.numpy as jnp

        from tests.synthetic import make_plot_dataset, tiny_config
        from stratanet2_tpu.data.device_dataset import (
            build_device_dataset,
            eval_index_table,
            make_device_eval,
            _augment_subsample_one,
        )
        from stratanet2_tpu.learning.kde import fit_kde_mixture
        from stratanet2_tpu.learning.train import make_eval_core, make_eval_step
        from stratanet2_tpu.models import init_pointnet2

        rng = np.random.default_rng(3)
        cfg = tiny_config()
        ds = make_plot_dataset(rng, n_plots=6, n_points=300)
        pids = sorted(ds.keys())
        dd = build_device_dataset(ds, pids, cfg.model)
        kde = fit_kde_mixture(rng.uniform(0, 15, 2000))
        model = init_pointnet2(jax.random.PRNGKey(0), cfg.model)

        run = make_device_eval(cfg, make_eval_core(cfg, kde))
        idx, valid = eval_index_table(len(pids), cfg.train.batch_size)
        key = jax.random.PRNGKey(42)
        preds, comps = run(
            model, dd.feats, dd.xyz, dd.n, dd.coverages, jnp.asarray(idx), key
        )

        # reproduce each batch's subsample with the same per-batch keys and
        # feed the host-loader eval step
        eval_step = make_eval_step(cfg, kde)
        for i in range(idx.shape[0]):
            keys = jax.random.split(jax.random.fold_in(key, i), idx.shape[1])
            cloud_b, xyz_b = jax.vmap(
                lambda f, x, n, k: _augment_subsample_one(
                    f, x, n, k, cfg.model.subsample_size, False
                )
            )(dd.feats[idx[i]], dd.xyz[idx[i]], dd.n[idx[i]], keys)
            pred_pl, _, _, comps_b, _, _ = eval_step(
                model, cloud_b, xyz_b, dd.coverages[idx[i]]
            )
            np.testing.assert_allclose(
                np.asarray(preds[i]), np.asarray(pred_pl), rtol=1e-6, atol=1e-6
            )
            for k in comps_b:
                np.testing.assert_allclose(
                    np.asarray(comps[k][i]), np.asarray(comps_b[k]),
                    rtol=1e-5, atol=1e-6, err_msg=k,
                )

    def test_evaluate_fast_path_means_and_summaries(self, tmp_path):
        """evaluate(device_eval=...) returns the same structure as the host
        path (means over exactly the val plots, one summary per plot), is
        deterministic across calls, and hits every LOSS_KEY."""
        import numpy as np
        import jax

        from tests.synthetic import make_plot_dataset, tiny_config
        from stratanet2_tpu.data.device_dataset import (
            build_device_dataset,
            make_device_eval,
        )
        from stratanet2_tpu.learning.evaluate import LOSS_KEYS, evaluate
        from stratanet2_tpu.learning.kde import fit_kde_mixture
        from stratanet2_tpu.learning.train import make_eval_core, make_eval_step
        from stratanet2_tpu.models import init_pointnet2
        from stratanet2_tpu.utils.experiment import MetricSink

        rng = np.random.default_rng(5)
        cfg = tiny_config()  # batch 4
        ds = make_plot_dataset(rng, n_plots=5, n_points=300)  # 5 % 4 != 0: pad
        pids = sorted(ds.keys())
        dd_val = build_device_dataset(ds, pids, cfg.model)
        kde = fit_kde_mixture(rng.uniform(0, 15, 2000))
        model = init_pointnet2(jax.random.PRNGKey(0), cfg.model)
        run = make_device_eval(cfg, make_eval_core(cfg, kde))
        sink = MetricSink(str(tmp_path))

        def must_not_run(*a, **kw):  # the fast path bypasses eval_step
            raise AssertionError("host eval_step called: fast path did not engage")

        means1, summ1 = evaluate(
            model, ds, pids, cfg, kde, must_not_run,
            str(tmp_path), sink, fold_id=1, epoch=2,
            device_eval=(run, dd_val),
        )
        means2, summ2 = evaluate(
            model, ds, pids, cfg, kde, must_not_run,
            str(tmp_path), sink, fold_id=1, epoch=4,
            device_eval=(run, dd_val),
        )
        sink.close()
        assert set(means1) == set(LOSS_KEYS)
        assert len(summ1) == len(pids)  # padding duplicates dropped
        assert [s["pl_id"] for s in summ1] == pids
        for k in LOSS_KEYS:
            assert np.isfinite(means1[k])
            # fixed per-fold subsample key: eval is epoch-deterministic
            np.testing.assert_allclose(means1[k], means2[k], rtol=1e-6)

        # a TRACKED plot in the val fold forces the host path (per-eval
        # interpretation figures need per-point tensors the fast path
        # does not return); tracked names NOT in the fold must not
        from dataclasses import replace

        cfg_tracked = replace(
            cfg, plot_name_to_visualize_during_training=(pids[0],)
        )
        host_called = []

        def host_step(*a, **kw):
            host_called.append(1)
            return make_eval_step(cfg, kde)(*a, **kw)

        evaluate(
            model, ds, pids, cfg_tracked, kde, host_step,
            str(tmp_path), sink2 := MetricSink(str(tmp_path)), fold_id=1,
            epoch=2, device_eval=(run, dd_val),
        )
        sink2.close()
        assert host_called, "tracked plot in fold must route to the host path"
