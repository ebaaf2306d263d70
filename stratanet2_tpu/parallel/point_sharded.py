"""Point-axis sharding — the point-cloud analogue of context/sequence
parallelism (SURVEY.md §2.4).

The reference handles dense inputs by subsampling to a fixed 10k points
(data_loader/loader.py:233-255); for clouds too dense to subsample without
information loss, these ops shard the POINT axis across devices with
`shard_map` and stitch results with XLA collectives over ICI:

- `ball_query_point_sharded` — centroids replicated, points sharded; each
  device selects from its local shard (its own slice of the grouped
  neighbor slots) and results concatenate along the K axis with global
  index offsets. One all-gather of (C, K_local) indices per level instead
  of moving the cloud.
- `plotwise_coverages_point_sharded` / `raster_projection_point_sharded` —
  local masked segment-max over the point shard, then `jax.lax.pmax` across
  devices: max is associative, so the fused projection stays exact.

These compose with batch-axis data parallelism on a 2-D mesh
(batch x points); tests exercise an 8-virtual-device mesh on CPU.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _shard_map_impl  # jax >= 0.5

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map_impl(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep,
        )
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from stratanet2_tpu.ops.ballquery import ball_query

POINT_AXIS = "points"


def make_point_mesh(n_devices: int) -> Mesh:
    import numpy as np

    return Mesh(np.asarray(jax.devices()[:n_devices]), (POINT_AXIS,))


def ball_query_point_sharded(
    mesh: Mesh,
    centroids: jax.Array,
    points: jax.Array,
    radius: float,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Grouped ball query with the point axis sharded over `mesh`.

    Args:
      centroids: (C, 3) replicated; points: (N, 3) sharded on axis 0;
      k must be divisible by the mesh size (each device owns k/D neighbor
      slots, selecting from its local shard — the grouped semantics of
      ops.ball_query(method='grouped') with device-aligned groups).

    Returns replicated (C, k) idx into the GLOBAL point axis + mask.
    """
    d = mesh.shape[POINT_AXIS]
    n = points.shape[0]
    assert k % d == 0, f"k={k} must be divisible by mesh size {d}"
    assert n % d == 0, f"N={n} must be divisible by mesh size {d}"
    k_local = k // d
    shard_size = n // d

    def local(c, pts_shard):
        li, lm = ball_query(c, pts_shard, radius, k_local, method="grouped")
        shard_id = jax.lax.axis_index(POINT_AXIS)
        gi = jnp.where(lm, li + shard_id * shard_size, 0)
        gi = jax.lax.all_gather(gi, POINT_AXIS, axis=1)  # (C, D, k_local)
        gm = jax.lax.all_gather(lm, POINT_AXIS, axis=1)
        return gi.reshape(c.shape[0], k), gm.reshape(c.shape[0], k)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(POINT_AXIS, None)),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return fn(centroids, points)


def plotwise_coverages_point_sharded(
    mesh: Mesh,
    coverages_pointwise: jax.Array,
    xy: jax.Array,
    diam_pix: int,
    xy_min: jax.Array,
    xy_max: jax.Array,
) -> jax.Array:
    """Point-sharded plot-level coverages (math of ops.plotwise_coverages,
    model/project_to_2d.py:7-55).

    xy bounds are passed in (computing a min/max across shards is one pmin/
    pmax; callers usually know the plot extent anyway).

    Shapes: coverages (N, 4) and xy (N, 2) sharded on the point axis.
    Returns the replicated (4,) coverages.
    """

    def local(cov, xy_s, mn, mx):
        b = jnp.floor((xy_s - mn) / (mx - mn + 1e-4) * diam_pix).astype(jnp.int32)
        b = jnp.clip(b, 0, diam_pix - 1)
        pix = b[:, 0] * diam_pix + b[:, 1]
        n_seg = diam_pix * diam_pix
        pix_max = jax.ops.segment_max(cov, pix, num_segments=n_seg)
        occupied = (
            jax.ops.segment_max(jnp.ones((cov.shape[0],), jnp.float32), pix, num_segments=n_seg)
            > 0
        )
        pix_max = jnp.where(occupied[:, None], pix_max, -jnp.inf)
        # max is associative: combine shards with pmax over ICI
        pix_max = jax.lax.pmax(pix_max, POINT_AXIS)
        occupied = jax.lax.pmax(occupied.astype(jnp.float32), POINT_AXIS) > 0
        pix_max = jnp.where(occupied[:, None], pix_max, 0.0)
        n_occ = jnp.maximum(jnp.sum(occupied.astype(jnp.float32)), 1.0)
        low = pix_max[:, 0]
        bare = jnp.where(occupied, 1.0 - low, 0.0)
        return (
            jnp.stack(
                [jnp.sum(low), jnp.sum(bare), jnp.sum(pix_max[:, 2]), jnp.sum(pix_max[:, 3])]
            )
            / n_occ
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(POINT_AXIS, None), P(POINT_AXIS, None), P(), P()),
        out_specs=P(),
        check_rep=False,
    )
    return fn(coverages_pointwise, xy, xy_min, xy_max)


def raster_projection_point_sharded(
    mesh: Mesh,
    xy_rescaled: jax.Array,
    coverages_pointwise: jax.Array,
    diam_pix: int,
    diam_meters: int,
) -> jax.Array:
    """Point-sharded raster projection (math of ops.raster_projection,
    model/project_to_2d.py:58-113): local segment-max + cross-device pmax."""

    def local(xy_s, cov):
        sf = 10.0 * diam_pix / diam_meters
        b = jnp.floor((xy_s + 1e-4) * sf + diam_meters // 2).astype(jnp.int32)
        b = jnp.clip(b, 0, diam_pix - 1)
        pix = b[:, 1] * diam_pix + b[:, 0]
        n_seg = diam_pix * diam_pix
        pix_max = jax.ops.segment_max(cov, pix, num_segments=n_seg)
        occupied = (
            jax.ops.segment_max(jnp.ones((cov.shape[0],), jnp.float32), pix, num_segments=n_seg)
            > 0
        )
        pix_max = jnp.where(occupied[:, None], pix_max, -jnp.inf)
        pix_max = jax.lax.pmax(pix_max, POINT_AXIS)
        occupied = jax.lax.pmax(occupied.astype(jnp.float32), POINT_AXIS) > 0
        sel = pix_max[:, jnp.array([0, 2, 3])]
        sel = jnp.where(occupied[:, None], sel, jnp.nan)
        return sel.T.reshape(3, diam_pix, diam_pix)[:, ::-1, :]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(POINT_AXIS, None), P(POINT_AXIS, None)),
        out_specs=P(),
        check_rep=False,
    )
    return fn(xy_rescaled, coverages_pointwise)
