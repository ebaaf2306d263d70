"""Point-axis (context-parallel analogue) sharding tests on the 8-device
virtual mesh: sharded results must equal the single-device ops exactly."""

import numpy as np
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
