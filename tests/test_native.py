"""Native C++ grid-index tests: build, exactness vs oracles, speed sanity."""

import time

import numpy as np
import pytest

from stratanet2_tpu.data import native, transforms


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("native gridindex unavailable (no toolchain)")
    return True


class TestNative:
    def test_minz_matches_numpy_and_bruteforce(self, built, rng):
        n = 3000
        xy = rng.uniform(0, 50, (n, 2))
        z = rng.uniform(0, 25, n)
        r = 1.5
        got = native.min_z_in_radius(xy, z, r)
        want = transforms.min_z_in_radius_numpy(xy, z, r)
        np.testing.assert_array_equal(got, want)

    def test_disk_query_matches_kdtree(self, built, rng):
        from scipy.spatial import cKDTree

        n, m = 5000, 40
        xy = rng.uniform(0, 100, (n, 2))
        centers = rng.uniform(0, 100, (m, 2))
        r = 10.0
        offsets, indices = native.disk_query(xy, centers, r)
        tree = cKDTree(xy)
        for q in range(m):
            got = np.sort(indices[offsets[q] : offsets[q + 1]])
            want = np.sort(tree.query_ball_point(centers[q], r=r))
            np.testing.assert_array_equal(got, want)

    def test_minz_faster_than_numpy_on_large_cloud(self, built, rng):
        n = 200_000
        xy = rng.uniform(0, 200, (n, 2))
        z = rng.uniform(0, 25, n)
        # best-of-3 each: single-sample wall-clock on the shared one-core
        # box is a flake source (scheduler stalls, first-call load)
        t_native = min(
            _timed(lambda: native.min_z_in_radius(xy, z, 1.5))
            for _ in range(3)
        )
        t_numpy = min(
            _timed(lambda: transforms.min_z_in_radius_numpy(xy, z, 1.5))
            for _ in range(3)
        )
        assert t_native < t_numpy, (t_native, t_numpy)

    def test_transforms_dispatch_uses_native(self, built, rng):
        cloud = np.vstack(
            [rng.uniform(0, 30, (2, 500)), rng.uniform(0, 20, (8, 500))]
        ).astype(np.float32)
        out = transforms.normalize_z_with_minz_in_a_radius(cloud, 1.5)
        assert np.all(out[2] >= 0)
