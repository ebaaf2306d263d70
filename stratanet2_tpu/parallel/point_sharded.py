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
  local dense masked max over the point shard, then `jax.lax.pmax` across
  devices: max is associative, so the fused projection stays exact.

These compose with batch-axis data parallelism on a 2-D mesh
(batch x points); tests exercise an 8-virtual-device mesh on CPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
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


@functools.lru_cache(maxsize=None)
def make_mesh_2d(batch_devices: int, point_devices: int) -> Mesh:
    """(batch x points) 2-D mesh: data parallelism on the first axis,
    point/context parallelism on the second. Memoized so repeated callers
    (e.g. one fold after another in learning/train._cached_programs, which
    keys programs on id(mesh)) reuse one Mesh object per shape."""
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
        # dense masked max instead of segment_max: XLA scatters serialize on
        # TPU (CLAUDE.md); same formulation as the train path's
        # plotwise_local below
        seg = jnp.arange(n_seg, dtype=jnp.int32)
        mask = pix[None, :] == seg[:, None]  # (n_seg, N_l)
        pix_max = jnp.max(
            jnp.where(mask[..., None], cov[None], jnp.float32(-1e30)), axis=1
        )  # (n_seg, 4)
        occupied = jnp.any(mask, axis=1)
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
    model/project_to_2d.py:58-113): local dense masked max + cross-device
    pmax."""

    def local(xy_s, cov):
        sf = 10.0 * diam_pix / diam_meters
        b = jnp.floor((xy_s + 1e-4) * sf + diam_meters // 2).astype(jnp.int32)
        b = jnp.clip(b, 0, diam_pix - 1)
        pix = b[:, 1] * diam_pix + b[:, 0]
        n_seg = diam_pix * diam_pix
        # dense masked max (no segment_max: XLA scatters serialize on TPU)
        seg = jnp.arange(n_seg, dtype=jnp.int32)
        mask = pix[None, :] == seg[:, None]  # (n_seg, N_l)
        pix_max = jnp.max(
            jnp.where(mask[..., None], cov[None], -jnp.inf), axis=1
        )  # (n_seg, 4)
        occupied = jnp.any(mask, axis=1)
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

        return jax.vmap(one)(cloud_l, xyz_l)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(BATCH_AXIS, POINT_AXIS, None), P(BATCH_AXIS, POINT_AXIS, None)),
        out_specs=(P(BATCH_AXIS, POINT_AXIS, None), P(BATCH_AXIS, POINT_AXIS, None)),
        check_rep=False,
    )
    return fn(p, s, cloud, xyz)


# ---------------------------------------------------------------------------
# point-sharded TRAINING step
# ---------------------------------------------------------------------------


def make_point_sharded_train_step(cfg, optimizer, kde, mesh: Mesh):
    """Full training step (forward + plotwise projection + 3-term loss +
    backward + Adam) with the POINT axis sharded — context-parallel
    TRAINING, not just the eval forward.

    Everything runs inside ONE `shard_map` over the (batch x points) mesh:

      - SA1 runs sharded exactly like the eval plan (local FPS == the
        partitioned-FPS approximation, per-shard grouped ball query ==
        the global contiguous groups when N % k1 == 0), but the masked max
        merges across shards with a DIFFERENTIABLE all_gather + max
        (`lax.pmax` has no transpose rule; gather+max routes the cotangent
        to the winning shard).
      - BatchNorm uses GLOBAL batch statistics: masked sums/counts `psum`
        across BOTH mesh axes (models/nn.batchnorm axis_names) — summing
        data replicated on an axis scales sums and counts equally, so the
        middle replicated stages (SA2..FP2) can use the same axis names.
      - The plotwise projection computes local per-pixel maxima over the
        shard and merges them with all_gather + max (exact: max is
        associative), with the per-plot xy extent agreed across shards.
      - Losses: the NLL / entropy means over points and the plot-level MAE
        mean over the batch become `pmean`s (equal shard sizes make the
        mean of local means exact).
      - Gradients of the replicated params come out of the loss (already
        replicated via pmean) identical on every device; optax applies the
        same update everywhere, so the TrainState stays replicated by
        value without an explicit sync.

    Exactness vs the unsharded `make_train_step`: identical under the same
    conditions as the eval forward (unsharded `fps_parts == dp`, `N % k1
    == 0`); tested to fp32 tolerance on 2x4 and 1x8 virtual meshes.

    Reference semantics: model/point_net2.py:106-153 (forward),
    learning/train.py:53-66 (step); SURVEY.md §2.4 (context-parallel
    analogue).
    """
    from stratanet2_tpu.models import nn
    from stratanet2_tpu.models.pointnet2 import (
        PointNet2Params,
        _gather,
        _sa_module,
    )
    from stratanet2_tpu.ops import farthest_point_sampling, knn_interpolate

    mcfg = cfg.model
    m_w, e_w = cfg.train.m, cfg.train.e
    kde_grid = jnp.asarray(kde.grid)
    kde_pdfs = jnp.asarray(kde.pdfs)

    db = mesh.shape[BATCH_AXIS]
    dp = mesh.shape[POINT_AXIS]
    n = mcfg.subsample_size
    assert n % dp == 0, f"N={n} must divide over {dp} point-shards"
    assert mcfg.k1 % dp == 0, f"k1={mcfg.k1} must divide over {dp}"
    assert mcfg.n_centroids1 % dp == 0
    assert cfg.train.batch_size % db == 0
    c1_local = mcfg.n_centroids1 // dp
    k1_local = mcfg.k1 // dp
    AX = (BATCH_AXIS, POINT_AXIS)

    def fwd_local(params, state, x0, pos0, rng):
        """Sharded train forward: x0 (B_l, N_l, F), pos0 (B_l, N_l, 3) ->
        (cov, proba) (B_l, N_l, 4) + new BN state (replicated by value).
        rng drives the head dropout (models/pointnet2.py:391); folded with
        both mesh axis indices so each shard draws an independent mask."""
        new_s = dict(state)
        bl = x0.shape[0]

        # --- SA1 (sharded): local FPS -> replicated centroid set ---
        idx_l = farthest_point_sampling(pos0, c1_local, use_pallas=mcfg.use_pallas)
        cent_l = _gather(pos0, idx_l)  # (B_l, c1_local, 3)
        cent1 = jax.lax.all_gather(cent_l, POINT_AXIS, axis=1).reshape(bl, -1, 3)
        nbr_idx, nbr_mask = ball_query(
            cent1, pos0, mcfg.r1, k1_local, chunk=mcfg.knn_chunk, method="grouped"
        )
        f = x0.shape[-1]
        both = _gather(
            jnp.concatenate([x0, pos0.astype(x0.dtype)], axis=-1), nbr_idx
        )  # (B_l, C1, k1_local, F+3)
        offset = jnp.pad(cent1.astype(both.dtype), ((0, 0), (0, 0), (f, 0)))
        h = both - offset[:, :, None, :]
        h, new_s["sa1"] = nn.mlp(
            params["sa1"], state["sa1"], h, mask=nbr_mask, train=True,
            axis_names=AX,
        )
        h = jnp.where(nbr_mask[..., None], h, jnp.asarray(-1e30, h.dtype))
        loc_max = jnp.max(h, axis=2)  # (B_l, C1, F1) — local neighbor slots
        x1 = jnp.max(
            jax.lax.all_gather(loc_max, POINT_AXIS, axis=0), axis=0
        )  # differentiable cross-shard max

        # --- SA2 (replicated over points; BN stats psum over both axes) ---
        x2, cent2, new_s["sa2"] = _sa_module(
            params["sa2"], state["sa2"], x1, cent1, mcfg.n_centroids2,
            mcfg.r2, mcfg.k2, True, jnp.float32, mcfg.use_pallas,
            mcfg.knn_chunk, "grouped", preproject=True,
            fps_parts=mcfg.fps_parts,
            fps_min_part_samples=mcfg.fps_min_part_samples,
            axis_names=AX,
        )

        # --- SA3 global + FP3 + FP2 (replicated; models/pointnet2.py) ---
        h3, new_s["sa3"] = nn.mlp(
            params["sa3"], state["sa3"],
            jnp.concatenate([x2, cent2.astype(x2.dtype)], axis=-1),
            train=True, axis_names=AX,
        )
        g = jnp.max(h3, axis=1)
        h = jnp.concatenate(
            [jnp.broadcast_to(g[:, None, :], (x2.shape[0], x2.shape[1], g.shape[-1])), x2],
            axis=-1,
        )
        h, new_s["fp3"] = nn.mlp(params["fp3"], state["fp3"], h, train=True, axis_names=AX)
        h = knn_interpolate(h, cent2, cent1, k=3, chunk=mcfg.knn_chunk, use_pallas=mcfg.use_pallas)
        h = jnp.concatenate([h, x1], axis=-1)
        h, new_s["fp2"] = nn.mlp(params["fp2"], state["fp2"], h, train=True, axis_names=AX)

        # --- FP1 (sharded targets, replicated sources) + head ---
        h_l = knn_interpolate(h, cent1, pos0, k=3, chunk=mcfg.knn_chunk, use_pallas=mcfg.use_pallas)
        h_l = jnp.concatenate([h_l, x0], axis=-1)
        h_l, new_s["fp1"] = nn.mlp(params["fp1"], state["fp1"], h_l, train=True, axis_names=AX)
        h_l = jax.nn.relu(nn.linear(params["lin1"], h_l))
        if mcfg.drop > 0.0:
            d_rng = jax.random.fold_in(
                jax.random.fold_in(rng, jax.lax.axis_index(BATCH_AXIS)),
                jax.lax.axis_index(POINT_AXIS),
            )
            h_l = nn.dropout(d_rng, h_l, mcfg.drop, train=True)
        scores = nn.linear(params["lin2"], h_l)
        proba = jax.nn.softmax(scores[..., : mcfg.n_class], axis=-1)
        density = jax.nn.sigmoid(scores[..., mcfg.n_class :])
        return proba * density, proba, new_s

    def plotwise_local(cov, xy):
        """Sharded plotwise coverages (ops.plotwise_coverages math,
        model/project_to_2d.py:7-55): local per-pixel max, gather+max
        merge (differentiable)."""
        diam_pix = mcfg.diam_pix
        mn = jnp.min(jax.lax.all_gather(jnp.min(xy, axis=1), POINT_AXIS, axis=0), axis=0)
        mx = jnp.max(jax.lax.all_gather(jnp.max(xy, axis=1), POINT_AXIS, axis=0), axis=0)
        b = jnp.floor(
            (xy - mn[:, None]) / (mx - mn + 1e-4)[:, None] * diam_pix
        ).astype(jnp.int32)
        b = jnp.clip(b, 0, diam_pix - 1)
        pix = b[..., 0] * diam_pix + b[..., 1]  # (B_l, N_l)
        n_seg = diam_pix * diam_pix
        seg = jnp.arange(n_seg, dtype=jnp.int32)
        mask = pix[:, None, :] == seg[None, :, None]  # (B_l, P^2, N_l)
        neg = jnp.float32(-1e30)
        pix_max = jnp.max(
            jnp.where(mask[..., None], cov[:, None], neg), axis=2
        )  # (B_l, P^2, 4)
        occ_l = jnp.any(mask, axis=2)
        pix_max = jax.lax.all_gather(pix_max, POINT_AXIS, axis=0).max(axis=0)
        occ = (
            jax.lax.all_gather(occ_l, POINT_AXIS, axis=0).any(axis=0)
        )  # (B_l, P^2)
        pix_max = jnp.where(occ[..., None], pix_max, 0.0)
        n_occ = jnp.maximum(jnp.sum(occ.astype(jnp.float32), axis=1), 1.0)
        low = pix_max[..., 0]
        bare = jnp.where(occ, 1.0 - low, 0.0)
        sums = jnp.stack(
            [low.sum(1), bare.sum(1), pix_max[..., 2].sum(1), pix_max[..., 3].sum(1)],
            axis=1,
        )
        return sums / n_occ[:, None]

    def step_local(ts, cloud_l, xyz_l, gt_l, rng):
        from stratanet2_tpu.learning.losses import (
            EPS,
            STRATA_IDX,
            nll_loss,
        )

        cloud_l = cloud_l.astype(jnp.float32)
        xyz_l = xyz_l.astype(jnp.float32)
        gt_l = gt_l.astype(jnp.float32)

        def loss_fn(params):
            cov, proba, new_state = fwd_local(
                params, ts.model_state, cloud_l[..., 2:], xyz_l, rng
            )
            pred_pl = plotwise_local(cov, cloud_l[..., :2])
            idx = jnp.asarray(STRATA_IDX)
            d = pred_pl[:, idx] - gt_l[:, idx]
            # pmean over BOTH axes: the value is already identical across
            # point-shards, but VMA tracking types all_gather+max results
            # as points-varying — the extra pmean is an identity by value
            # and makes the replication statically checkable
            l_abs = jax.lax.pmean(jnp.mean(jnp.sqrt(d * d + EPS)), AX)
            z_m = cloud_l[..., 2] * mcfg.z_max
            l_nll_local, _aux = nll_loss(proba, z_m, kde_grid, kde_pdfs)
            l_nll = jax.lax.pmean(l_nll_local, AX)
            p2 = proba[..., 2:]
            l_e_local = -jnp.mean(
                p2 * jnp.log(p2 + EPS) + (1 - p2) * jnp.log(1 - p2 + EPS)
            )
            l_e = jax.lax.pmean(l_e_local, AX)
            loss = l_abs + m_w * l_nll + e_w * l_e
            comps = {
                "total_loss": loss,
                "MAE_loss": l_abs,
                "log_loss": l_nll,
                "entropy_loss": l_e,
            }
            return loss, (comps, new_state)

        (_, (comps, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(ts.params)
        updates, new_opt = optimizer.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        return type(ts)(new_params, new_state, new_opt, ts.step + 1), comps

    # check_rep/check_vma must stay ON here: with replication tracking
    # disabled, differentiating THROUGH psum/pmean inside the local
    # function silently overcounts gradients by the device count (the
    # transpose loses the dividing pbroadcast) — measured 1-7x inflated
    # grads on every BN path before this was enabled.
    step = shard_map(
        step_local,
        mesh=mesh,
        in_specs=(
            P(),
            P(BATCH_AXIS, POINT_AXIS, None),
            P(BATCH_AXIS, POINT_AXIS, None),
            P(BATCH_AXIS, None),
            P(),
        ),
        out_specs=(P(), P()),
        check_rep=True,
    )
    return jax.jit(step, donate_argnums=(0,))
