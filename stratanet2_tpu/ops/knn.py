"""k-NN inverse-distance-squared feature interpolation.

TPU-native equivalent of `torch_geometric.nn.knn_interpolate` (reference
model/point_net2.py:63, k=1 for FP3 and k=3 for FP2/FP1). Semantics match
torch_geometric: for each target position find the k nearest source
positions, weight their features by 1 / max(d^2, 1e-16), normalize by the
weight sum.

Implemented as chunked dense distance tiles + `top_k`, which compiles to
gathers/matmuls — no scatter, no variable-length lists.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stratanet2_tpu.ops._chunk import chunked_map

_EPS = 1e-16


def _iterative_min_k(d2: jax.Array, k: int):
    """Exact k smallest per row by k argmin passes. (R, N) -> ((R, k), (R, k))."""
    iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, d2.ndim - 1)
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmin(d2, axis=-1)
        v = jnp.min(d2, axis=-1)
        vals.append(v)
        idxs.append(i.astype(jnp.int32))
        d2 = jnp.where(iota == i[..., None], jnp.inf, d2)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


@functools.partial(jax.jit, static_argnames=("k", "chunk", "use_pallas"))
def knn_interpolate(
    x_src: jax.Array,
    pos_src: jax.Array,
    pos_tgt: jax.Array,
    k: int = 3,
    chunk: int = 1024,
    use_pallas: bool = False,
) -> jax.Array:
    """Interpolate source features onto target positions.

    Args:
      x_src: (..., S, F) source features.
      pos_src: (..., S, 3) source positions.
      pos_tgt: (..., T, 3) target positions.
      k: static number of neighbors (k <= S).
      chunk: target-chunk size bounding the (chunk, S) distance tile.

    Returns:
      (..., T, F) interpolated features.
    """
    if use_pallas and pos_tgt.ndim == 3 and jax.default_backend() == "tpu":
        from stratanet2_tpu.ops.pallas_kernels import knn_interpolate_pallas

        return knn_interpolate_pallas(x_src, pos_src, pos_tgt, k=k)
    if pos_tgt.ndim == 2:
        return _knn_single(x_src, pos_src, pos_tgt, k, chunk)
    fn = functools.partial(_knn_single, k=k, chunk=chunk)
    for _ in range(pos_tgt.ndim - 2):
        fn = jax.vmap(fn)
    return fn(x_src, pos_src, pos_tgt)


def _knn_single(x_src, pos_src, pos_tgt, k, chunk):
    pos_src = pos_src.astype(jnp.float32)
    src_sq = jnp.sum(pos_src * pos_src, axis=-1)

    def one_chunk(t):
        t = t.astype(jnp.float32)
        # precision=HIGHEST: see ballquery.py — bf16 default matmuls perturb
        # distances enough to reorder near-equidistant neighbors.
        tp = jax.lax.dot_general(
            t, pos_src.T,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        d2 = jnp.sum(t * t, axis=-1, keepdims=True) - 2.0 * tp + src_sq[None, :]
        d2 = jnp.maximum(d2, 0.0)
        # exact k smallest via iterative argmin — for the tiny k of the FP
        # stages (1/3) this is ~20x faster on TPU than lax.top_k and exact,
        # matching torch_geometric's exact kNN.
        d2_min, idx = _iterative_min_k(d2, k)
        w = 1.0 / jnp.maximum(d2_min, _EPS)
        feats = x_src[idx]  # (Tc, k, F)
        out = jnp.sum(feats * w[..., None], axis=-2) / jnp.sum(w, axis=-1, keepdims=True)
        return out.astype(x_src.dtype)

    return chunked_map(one_chunk, pos_tgt, chunk)
