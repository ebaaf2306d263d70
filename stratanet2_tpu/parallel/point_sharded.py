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
BATCH_AXIS = "batch"


def make_point_mesh(n_devices: int) -> Mesh:
    import numpy as np

    return Mesh(np.asarray(jax.devices()[:n_devices]), (POINT_AXIS,))


def make_mesh_2d(batch_devices: int, point_devices: int) -> Mesh:
    """(batch x points) 2-D mesh: data parallelism on the first axis,
    point/context parallelism on the second."""
    import numpy as np

    devs = np.asarray(jax.devices()[: batch_devices * point_devices])
    return Mesh(devs.reshape(batch_devices, point_devices), (BATCH_AXIS, POINT_AXIS))


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


# ---------------------------------------------------------------------------
# end-to-end point-sharded forward
# ---------------------------------------------------------------------------


def pointnet2_forward_point_sharded(
    model,
    cloud: jax.Array,  # (B, N, n_input_feats - 2)
    xyz: jax.Array,  # (B, N, 3)
    cfg,
    mesh: Mesh,
):
    """Eval forward with the POINT axis sharded across devices — the
    point-cloud analogue of context parallelism (SURVEY.md §2.4), composed
    end to end on a (batch x points) 2-D mesh.

    Sharding plan (each device holds (B/db, N/dp) points):
      - FPS (SA1): exact local FPS per shard + all-gather of the selected
        centroids — identical math to the single-device partitioned FPS
        (ops.fps parts=dp), so sharded == unsharded bit-for-bit when the
        unsharded run uses fps_parts == dp.
      - SA1 ball query + edge MLP: centroids replicated, points sharded;
        each device owns k1/dp grouped neighbor slots of its local shard
        (per-shard groups == the global contiguous groups when N % k1 == 0)
        and reduces its masked max; one `pmax` over ICI merges shards.
      - SA2 / SA3 / FP3 / FP2: the surviving point sets (C1, C2 centroids)
        are small — they run replicated; this is where the reference's own
        funnel already shrank the data.
      - FP1 kNN + head: targets (the N raw points) sharded, sources (C1)
        replicated — embarrassingly parallel per target.

    Eval only (BatchNorm uses running stats; training shards the batch axis
    instead — plots are i.i.d., SURVEY.md §2.4). Returns (coverages, proba)
    sharded like the inputs.

    Requirements: N % dp == 0, k1 % dp == 0, n_centroids1 % dp == 0.
    """
    import functools

    from stratanet2_tpu.models import nn
    from stratanet2_tpu.models.pointnet2 import _gather_raw
    from stratanet2_tpu.ops import farthest_point_sampling, knn_interpolate

    p, s = model.params, model.state
    mcfg = cfg if hasattr(cfg, "n_centroids1") else cfg.model
    dp = mesh.shape[POINT_AXIS]
    n = xyz.shape[1]
    assert n % dp == 0, f"N={n} must divide over {dp} point-shards"
    assert mcfg.k1 % dp == 0, f"k1={mcfg.k1} must divide over {dp}"
    assert mcfg.n_centroids1 % dp == 0, (
        f"n_centroids1={mcfg.n_centroids1} must divide over {dp}"
    )
    c1_local = mcfg.n_centroids1 // dp
    k1_local = mcfg.k1 // dp
    shard_size = n // dp

    def sa_edges_local(layers_p, layers_s, x_l, pos_l, cent, radius, k_local):
        """Local slice of the SA interior: grouped ball query over the local
        shard, edge MLP (eval BN), masked max over the local neighbor slots.
        Cross-shard merge (pmax) happens in the caller."""
        nbr_idx, nbr_mask = ball_query(
            cent, pos_l, radius, k_local, chunk=mcfg.knn_chunk, method="grouped"
        )
        x_j = _gather_raw(x_l[None], nbr_idx[None])[0]
        rel = _gather_raw(pos_l[None], nbr_idx[None])[0] - cent[:, None, :]
        h = jnp.concatenate([x_j, rel.astype(x_j.dtype)], axis=-1)
        h, _ = nn.mlp(layers_p, layers_s, h, mask=nbr_mask, train=False)
        h = jnp.where(nbr_mask[..., None], h, jnp.asarray(-1e30, h.dtype))
        return jnp.max(h, axis=1)  # (C, F')

    def local_fn(params, state, cloud_l, xyz_l):
        # shapes inside: cloud_l (B_l, N_l, F), xyz_l (B_l, N_l, 3)
        pid = jax.lax.axis_index(POINT_AXIS)

        def one(x0_l, pos0_l):
            # --- SA1: sharded ---
            idx_l = farthest_point_sampling(
                pos0_l, c1_local, use_pallas=mcfg.use_pallas
            )
            cent_l = jnp.take(pos0_l, idx_l, axis=0)  # (c1_local, 3)
            cent1 = jax.lax.all_gather(cent_l, POINT_AXIS, axis=0).reshape(
                -1, 3
            )  # (C1, 3), replicated by value
            h1_local = sa_edges_local(
                params["sa1"], state["sa1"], x0_l, pos0_l, cent1, mcfg.r1,
                k1_local,
            )
            x1 = jax.lax.pmax(h1_local, POINT_AXIS)  # (C1, F1) replicated

            # --- SA2: replicated (C1 is small) ---
            idx2 = farthest_point_sampling(
                cent1, mcfg.n_centroids2, use_pallas=mcfg.use_pallas,
                parts=mcfg.fps_parts,
                min_part_samples=mcfg.fps_min_part_samples,
            )
            cent2 = jnp.take(cent1, idx2, axis=0)
            nbr_idx, nbr_mask = ball_query(
                cent2, cent1, mcfg.r2, mcfg.k2, chunk=mcfg.knn_chunk,
                method="grouped",
            )
            x_j = jnp.take(x1, nbr_idx.reshape(-1), axis=0).reshape(
                nbr_idx.shape + (x1.shape[-1],)
            )
            rel = jnp.take(cent1, nbr_idx.reshape(-1), axis=0).reshape(
                nbr_idx.shape + (3,)
            ) - cent2[:, None, :]
            h = jnp.concatenate([x_j, rel.astype(x_j.dtype)], axis=-1)
            h, _ = nn.mlp(params["sa2"], state["sa2"], h, mask=nbr_mask, train=False)
            h = jnp.where(nbr_mask[..., None], h, jnp.asarray(-1e30, h.dtype))
            x2 = jnp.max(h, axis=1)

            # --- SA3 global + FP3 (replicated) ---
            h3, _ = nn.mlp(
                params["sa3"], state["sa3"],
                jnp.concatenate([x2, cent2.astype(x2.dtype)], axis=-1),
                train=False,
            )
            g = jnp.max(h3, axis=0)
            h = jnp.concatenate(
                [jnp.broadcast_to(g[None], (x2.shape[0], g.shape[-1])), x2],
                axis=-1,
            )
            h, _ = nn.mlp(params["fp3"], state["fp3"], h, train=False)

            # --- FP2 (replicated: targets are the C1 centroids) ---
            h = knn_interpolate(
                h[None], cent2[None], cent1[None], k=3, chunk=mcfg.knn_chunk,
                use_pallas=mcfg.use_pallas,
            )[0]
            h = jnp.concatenate([h, x1], axis=-1)
            h, _ = nn.mlp(params["fp2"], state["fp2"], h, train=False)

            # --- FP1 (sharded: local targets, replicated sources) ---
            h_l = knn_interpolate(
                h[None], cent1[None], pos0_l[None], k=3, chunk=mcfg.knn_chunk,
                use_pallas=mcfg.use_pallas,
            )[0]
            h_l = jnp.concatenate([h_l, x0_l], axis=-1)
            h_l, _ = nn.mlp(params["fp1"], state["fp1"], h_l, train=False)

            # --- head (pointwise, sharded) ---
            h_l = jax.nn.relu(nn.linear(params["lin1"], h_l))
            scores = nn.linear(params["lin2"], h_l)
            proba = jax.nn.softmax(scores[..., : mcfg.n_class], axis=-1)
            density = jax.nn.sigmoid(scores[..., mcfg.n_class :])
            return proba * density, proba

        del pid  # (axis index only needed implicitly via collectives)
        return jax.vmap(one)(cloud_l, xyz_l)

    fn = shard_map(
        functools.partial(local_fn),
        mesh=mesh,
        in_specs=(P(), P(), P(BATCH_AXIS, POINT_AXIS, None), P(BATCH_AXIS, POINT_AXIS, None)),
        out_specs=(P(BATCH_AXIS, POINT_AXIS, None), P(BATCH_AXIS, POINT_AXIS, None)),
        check_rep=False,
    )
    return fn(p, s, cloud, xyz)
