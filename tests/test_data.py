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
        xx, yy = transforms.get_x_y_meshgrid(20)
        k = int((np.sqrt((xx + 0 * yy) ** 2 + (yy + 0 * xx) ** 2) < 10).sum())
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
