"""PointNet2 segmentation backbone, TPU-native.

Functionally equivalent to the reference model (model/point_net2.py:70-153)
but expressed as a pure function over static-shape padded clouds:

  stage        reference                     here
  -----        ---------------------------   --------------------------------
  SA1          fps(0.25) + radius(sqrt2,     FPS (Pallas/lax) + fixed-K ball
               <=2000) + PointConv MLP       query + dense gather + shared MLP
               [11,16,16]                    + masked max over K
  SA2          same, r=sqrt8                 same, MLP [19,32]
  SA3          MLP [35,64] + global_max_pool per-cloud max over points
  FP3          knn_interpolate k=1 + skip    broadcast of the single global
               + MLP [96,64]                 feature + skip + MLP
  FP2/FP1      knn_interpolate k=3 + skip    chunked dense kNN (inverse-d^2)
               + MLP [80,34]/[42,34]         + skip + MLP
  head         lin 34->16, ReLU, dropout,    identical, incl. the fixed bias
               lin 16->5 (bias init :97-99)  init
  output       softmax(4) || sigmoid(1);     identical
               coverages = proba * density

Input convention (matches the reference data layer): `cloud` is the rescaled
feature matrix with x,y ALREADY DROPPED — (B, N, 8) = [z/z_max, r, g, b, nir,
intensity, return_num, num_returns] (model/point_net2.py:77,117-118) — and
`xyz` is the centered, z-normalized position in meters (B, N, 3).

Batch handling: the reference flattens (B, f, N) to long form with a batch
vector rebuilt on the host every step (model/point_net2.py:107-116, hot loop
#6 in SURVEY.md); here the batch axis is a real array axis, sharded across
devices by the caller.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from stratanet2_tpu.config import ModelConfig
from stratanet2_tpu.models import nn
from stratanet2_tpu.ops import ball_query, farthest_point_sampling, knn_interpolate

Params = Dict[str, Any]


class PointNet2Params(NamedTuple):
    params: Params
    state: Params  # batch-norm running statistics


def init_pointnet2(key: jax.Array, cfg: ModelConfig) -> PointNet2Params:
    """Initialize parameters. Channel plan per model/point_net2.py:81-99."""
    f_in = cfg.n_input_feats - 2  # x and y dropped
    mlp1 = [f_in + 3, 16, 16]
    mlp2 = [mlp1[-1] + 3, 32]
    mlp3 = [mlp2[-1] + 3, 64]
    mlp3_fp = [mlp3[-1] + mlp2[-1], 64]
    mlp2_fp = [mlp3_fp[-1] + mlp1[-1], 34]
    mlp1_fp = [mlp2_fp[-1] + f_in, 34]

    ks = jax.random.split(key, 8)
    p, s = {}, {}
    for name, channels, k in [
        ("sa1", mlp1, ks[0]),
        ("sa2", mlp2, ks[1]),
        ("sa3", mlp3, ks[2]),
        ("fp3", mlp3_fp, ks[3]),
        ("fp2", mlp2_fp, ks[4]),
        ("fp1", mlp1_fp, ks[5]),
    ]:
        p[name], s[name] = nn.init_mlp(k, channels)
    p["lin1"] = nn.init_linear(ks[6], mlp1_fp[-1], 16)
    p["lin2"] = nn.init_linear(ks[7], 16, cfg.n_class + 1)
    # fixed head bias init (model/point_net2.py:97-99)
    p["lin2"]["b"] = jnp.asarray(cfg.head_bias_init, jnp.float32)
    return PointNet2Params(p, s)


def count_params(p: Params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(p))


# Batched row gather with the MXU one-hot scatter as VJP — shared with the
# kNN interpolation (ops/pallas_kernels.py); kept under the historical local
# names, they are used throughout this module and in tests.
from stratanet2_tpu.ops.pallas_kernels import (  # noqa: E402
    gather_rows as _gather,
    gather_rows_raw as _gather_raw,
)


def _sa_module(
    p: Params,
    s: Params,
    x: jax.Array,
    pos: jax.Array,
    n_centroids: int,
    radius: float,
    k: int,
    train: bool,
    compute_dtype,
    use_pallas: bool,
    chunk: int,
    bq_method: str = "grouped",
    preproject: bool = False,
    fps_parts: int = 1,
    fps_min_part_samples: int = 256,
    axis_names=None,
) -> Tuple[jax.Array, jax.Array, Params]:
    """Set-abstraction: FPS -> ball query -> PointConv-style shared MLP ->
    masked max (reference SAModule, model/point_net2.py:14-29).

    Eval on TPU takes the fused Pallas path (grouped selection + gather +
    folded-BN MLP + max in VMEM, ops/pallas_kernels.sa_fused_eval); training
    and non-TPU backends use the XLA path below with identical selection
    semantics."""
    idx = farthest_point_sampling(
        pos, n_centroids, use_pallas=use_pallas, parts=fps_parts,
        min_part_samples=fps_min_part_samples,
    )
    centroids = _gather(pos, idx)  # (B, C, 3)

    ch1 = p["layers"][0]["linear"]["w"].shape[1]
    g = -(-pos.shape[1] // k)
    # the fused kernel keeps the (K, C1, G) projection table in VMEM; fall
    # back to the XLA path for clouds too large for on-chip residency
    q_bytes = k * (ch1 + 8) * (-(-g // 128) * 128) * 4
    fused_eligible = (
        axis_names is None
        and use_pallas
        and bq_method == "grouped"
        and len(p["layers"]) <= 2
        and q_bytes < 8 * 2**20
        and jax.default_backend() == "tpu"
    )
    if fused_eligible and not train:
        return (
            _sa_fused(p, s, x, pos, centroids, radius, k),
            centroids,
            s,
        )
    if fused_eligible and train:
        return _sa_train_fused_path(p, s, x, pos, centroids, radius, k)

    if use_pallas and bq_method == "grouped" and jax.default_backend() == "tpu":
        # VMEM-resident selection for the training path (no (B,C,N) HBM
        # distance matrix); selection has no gradient. Consumed in the
        # kernel-native (B, K, C) layout — K on sublanes — so the lane-major
        # kernel outputs skip two HBM relayouts (docs/KERNELS.md r3).
        from stratanet2_tpu.ops.pallas_kernels import ball_query_grouped_pallas

        nbr_idx, nbr_mask = ball_query_grouped_pallas(
            centroids, pos, radius, k, layout="kc"
        )
        k_axis = 1
    else:
        nbr_idx, nbr_mask = ball_query(
            centroids, pos, radius, k, chunk=chunk, method=bq_method
        )
        k_axis = 2
    if preproject:
        # Layer 1 distributes over the edge concat [x_j, pos_j - pos_c]:
        # pre-project per POINT (q = x@W1x + pos@W1p + b1, N rows) and per
        # centroid (cterm = pos_c@W1p), then each edge is one gather +
        # subtract — ~K x fewer layer-1 FLOPs and no (B,C,K,F+3) concat
        # tensor (same trick as the fused eval kernel). Only pays off when
        # x already requires gradients (deeper SA stages): for the first
        # stage x is the input cloud, and pre-projection would *introduce*
        # a differentiable gather whose backward scatter-add dominates.
        l1 = p["layers"][0]
        w1, b1 = l1["linear"]["w"], l1["linear"]["b"]
        f = x.shape[-1]
        q = (
            jnp.einsum("bnf,fc->bnc", x.astype(jnp.float32), w1[:f])
            + jnp.einsum("bnd,dc->bnc", pos.astype(jnp.float32), w1[f:])
            + b1
        )
        cterm = jnp.einsum("bcd,dk->bck", centroids.astype(jnp.float32), w1[f:])
        cterm_e = cterm[:, None, :, :] if k_axis == 1 else cterm[:, :, None, :]
        h = jax.nn.relu(_gather(q, nbr_idx) - cterm_e)
        h, bn1_state = nn.batchnorm(
            l1["bn"], s["layers"][0], h, nbr_mask, train, axis_names
        )
        new_layer_states = [bn1_state]
        for layer_p, layer_s in zip(p["layers"][1:], s["layers"][1:]):
            h = jax.nn.relu(nn.linear(layer_p["linear"], h, compute_dtype))
            h, ns2 = nn.batchnorm(
                layer_p["bn"], layer_s, h, nbr_mask, train, axis_names
            )
            new_layer_states.append(ns2)
        new_s = {"layers": new_layer_states}
    else:
        # ONE gather of the concatenated [x | pos] per-point table instead of
        # two (x_j and rel separately): the random-row gathers are
        # DMA-amplification-bound, and the merged 44-byte rows cost about the
        # same as the 32-byte x rows alone (step trace: the two separate
        # gathers were 2.5 + 2.1 ms at PROD). The centroid subtraction rides
        # a zero-padded offset so [x_j, rel] needs no re-concat.
        f = x.shape[-1]
        both = _gather(
            jnp.concatenate([x, pos.astype(x.dtype)], axis=-1), nbr_idx
        )  # (B, C, K, F+3) or (B, K, C, F+3) per layout
        offset = jnp.pad(centroids.astype(both.dtype), ((0, 0), (0, 0), (f, 0)))
        offset_e = offset[:, None, :, :] if k_axis == 1 else offset[:, :, None, :]
        h = both - offset_e
        h, new_s = nn.mlp(
            p, s, h, mask=nbr_mask, train=train, compute_dtype=compute_dtype,
            axis_names=axis_names,
        )
    neg = jnp.asarray(-1e30, h.dtype)
    h = jnp.where(nbr_mask[..., None], h, neg)
    out = jnp.max(h, axis=k_axis)  # (B, C, F') — each centroid is its own neighbor
    return out, centroids, new_s


def _sa_train_fused_path(p, s, x, pos, centroids, radius, k):
    """TRAIN-path fused SA interior (ops.pallas_kernels.sa_train_fused).

    The layer-1 Linear distributes over the edge concat exactly as in the
    eval kernel; BatchNorm BATCH statistics are accumulated inside the
    kernels (masked sum/sum-sq over the VMEM-resident edges) instead of
    materializing the (B, C, K, F) edge tensors in HBM (VERDICT r2 missing
    #2, ~10 ms of the PROD train step). dq/dcterm leave the custom VJP and
    flow into W1/b1/x through the einsums below by ordinary autodiff.
    Gradient equality vs the unfused path: tests/test_sa_train_fused.py."""
    from stratanet2_tpu.ops.pallas_kernels import (
        ball_query_grouped_pallas,
        sa_train_fused,
    )

    idx, mask = ball_query_grouped_pallas(centroids, pos, radius, k, layout="kc")
    l1 = p["layers"][0]
    w1, b1 = l1["linear"]["w"], l1["linear"]["b"]
    f = x.shape[-1]
    q = (
        jnp.einsum("bnf,fc->bnc", x.astype(jnp.float32), w1[:f])
        + jnp.einsum("bnd,dc->bnc", pos.astype(jnp.float32), w1[f:])
        + b1
    )
    cterm = jnp.einsum("bcd,dk->bck", centroids.astype(jnp.float32), w1[f:])
    scales = tuple(lyr["bn"]["scale"] for lyr in p["layers"])
    biases = tuple(lyr["bn"]["bias"] for lyr in p["layers"])
    if len(p["layers"]) == 2:
        w2 = p["layers"][1]["linear"]["w"]
        b2 = p["layers"][1]["linear"]["b"]
    else:
        w2 = b2 = None
    # running means feed the shifted one-pass batch stats (advisor r2:
    # after warmup the running mean tracks the batch mean, so the shift
    # removes the E[x^2]-E[x]^2 cancellation)
    shifts = tuple(ls["mean"] for ls in s["layers"])
    out, stats, me = sa_train_fused(
        q, cterm, scales, biases, w2, b2, idx, mask, k=k, bn_shifts=shifts
    )
    # BatchNorm running-state update, identical to nn.batchnorm's train
    # branch (biased batch var normalizes; unbiased var is stored).
    new_layer_states = []
    for (mean, var), layer_s in zip(stats, s["layers"]):
        unbiased = var * me / jnp.maximum(me - 1.0, 1.0)
        new_layer_states.append(
            {
                "mean": (1 - nn.BN_MOMENTUM) * layer_s["mean"]
                + nn.BN_MOMENTUM * mean,
                "var": (1 - nn.BN_MOMENTUM) * layer_s["var"]
                + nn.BN_MOMENTUM * unbiased,
            }
        )
    return out, centroids, {"layers": new_layer_states}


def _fold_bn_eval(layer_p: Params, layer_s: Params):
    """Fold eval-mode BatchNorm into a per-channel affine (a, c)."""
    a = layer_p["bn"]["scale"] * jax.lax.rsqrt(layer_s["var"] + nn.BN_EPS)
    c = layer_p["bn"]["bias"] - layer_s["mean"] * a
    return a, c


def _sa_fused(p, s, x, pos, centroids, radius, k):
    """Eval-mode fused SA interior via ops.pallas_kernels.sa_fused_eval.

    The layer-1 Linear distributes over the edge concat, so the per-point
    projection q = x@W1x + pos@W1p + b1 and the centroid term pos_c@W1p are
    computed here on the MXU; the kernel does selection + gather + the rest.
    """
    from stratanet2_tpu.ops.pallas_kernels import sa_fused_eval

    l1, s1 = p["layers"][0], s["layers"][0]
    w1, b1 = l1["linear"]["w"], l1["linear"]["b"]
    f = x.shape[-1]
    q = (
        jnp.einsum("bnf,fc->bnc", x.astype(jnp.float32), w1[:f])
        + jnp.einsum("bnd,dc->bnc", pos.astype(jnp.float32), w1[f:])
        + b1
    )
    cterm = jnp.einsum("bcd,dk->bck", centroids.astype(jnp.float32), w1[f:])
    a1, c1 = _fold_bn_eval(l1, s1)
    if len(p["layers"]) == 2:
        l2, s2 = p["layers"][1], s["layers"][1]
        w2, b2 = l2["linear"]["w"], l2["linear"]["b"]
        a2, c2 = _fold_bn_eval(l2, s2)
    else:
        w2 = b2 = a2 = c2 = None
    return sa_fused_eval(
        q, pos, centroids, cterm, a1, c1, w2, b2, a2, c2, radius, k
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "train", "return_embeddings")
)
def pointnet2_forward(
    model: PointNet2Params,
    cloud: jax.Array,
    xyz: jax.Array,
    cfg: ModelConfig,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    return_embeddings: bool = False,
):
    """Forward pass.

    Args:
      model: (params, bn_state).
      cloud: (B, N, n_input_feats - 2) rescaled features, x/y dropped.
      xyz: (B, N, 3) centered positions in meters.
      cfg: static model config.
      train: batch-stats mode + dropout.
      rng: dropout key (needed only if train and cfg.drop > 0).

    Returns:
      (coverages_pointwise (B,N,4), proba_pointwise (B,N,4), new_state)
      and, if return_embeddings, the (B, 64) global feature as a 4th output
      (reference `last_G_tensor`, model/point_net2.py:134-135).
    """
    p, s = model.params, model.state
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    new_s = dict(s)

    x0, pos0 = cloud, xyz

    x1, pos1, new_s["sa1"] = _sa_module(
        p["sa1"], s["sa1"], x0, pos0, cfg.n_centroids1, cfg.r1, cfg.k1,
        train, dt, cfg.use_pallas, cfg.knn_chunk, cfg.ball_query_method,
        fps_parts=cfg.fps_parts, fps_min_part_samples=cfg.fps_min_part_samples,
    )
    x2, pos2, new_s["sa2"] = _sa_module(
        p["sa2"], s["sa2"], x1, pos1, cfg.n_centroids2, cfg.r2, cfg.k2,
        train, dt, cfg.use_pallas, cfg.knn_chunk, cfg.ball_query_method,
        preproject=True,  # x1 requires grads anyway; save edge-lin1 work
        fps_parts=cfg.fps_parts, fps_min_part_samples=cfg.fps_min_part_samples,
    )

    # Global SA (model/point_net2.py:32-42): MLP on [x, pos], per-cloud max.
    h3, new_s["sa3"] = nn.mlp(
        p["sa3"], s["sa3"],
        jnp.concatenate([x2, pos2.astype(x2.dtype)], axis=-1),
        train=train, compute_dtype=dt,
    )
    g = jnp.max(h3, axis=1)  # (B, 64) global feature

    # FP3: k=1 interpolation from the single global point == broadcast
    # (model/point_net2.py:91, knn_interpolate k=1 from one source point).
    h = jnp.concatenate([jnp.broadcast_to(g[:, None, :], (x2.shape[0], x2.shape[1], g.shape[-1])), x2], axis=-1)
    h, new_s["fp3"] = nn.mlp(p["fp3"], s["fp3"], h, train=train, compute_dtype=dt)

    # FP2: 625 -> 2500, k=3 (model/point_net2.py:92).
    h = knn_interpolate(h, pos2, pos1, k=3, chunk=cfg.knn_chunk, use_pallas=cfg.use_pallas)
    h = jnp.concatenate([h, x1], axis=-1)
    h, new_s["fp2"] = nn.mlp(p["fp2"], s["fp2"], h, train=train, compute_dtype=dt)

    # FP1: 2500 -> N, k=3 (model/point_net2.py:93).
    h = knn_interpolate(h, pos1, pos0, k=3, chunk=cfg.knn_chunk, use_pallas=cfg.use_pallas)
    h = jnp.concatenate([h, x0], axis=-1)
    h, new_s["fp1"] = nn.mlp(p["fp1"], s["fp1"], h, train=train, compute_dtype=dt)

    # Head (model/point_net2.py:141-153).
    h = jax.nn.relu(nn.linear(p["lin1"], h, dt))
    h = nn.dropout(rng, h, cfg.drop, train)
    scores = nn.linear(p["lin2"], h, dt)

    proba = jax.nn.softmax(scores[..., : cfg.n_class], axis=-1)
    density = jax.nn.sigmoid(scores[..., cfg.n_class :])
    coverages = proba * density

    new_model_state = new_s
    if return_embeddings:
        return coverages, proba, new_model_state, g
    return coverages, proba, new_model_state
