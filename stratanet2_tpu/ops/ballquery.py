"""Fixed-K ball query (radius neighbor search).

TPU-native equivalent of `torch_cluster.radius` (reference
model/point_net2.py:23-25, max_num_neighbors=2000). The reference emits a
variable-length edge list; here each centroid gets exactly K neighbor slots
with a validity mask — the shape the downstream PointConv consumes as dense
gathers + masked max, which is what XLA tiles well.

Selection policy: the K *nearest* points within the radius (the reference
keeps an arbitrary first-2000 subset; with max aggregation downstream the
nearest-K subset is a strictly better-behaved choice and empirically
equivalent). Centroids with fewer than K in-radius neighbors get masked
slots; index 0 is used as a safe gather index for masked slots.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stratanet2_tpu.ops._chunk import chunked_map

_BIG = 1e30


@functools.partial(jax.jit, static_argnames=("k", "chunk", "method"))
def ball_query(
    centroids: jax.Array,
    points: jax.Array,
    radius: float,
    k: int,
    chunk: int = 1024,
    method: str = "nearest",
):
    """Find up to `k` in-radius neighbors of each centroid.

    Args:
      centroids: (..., C, 3) query positions.
      points: (..., N, 3) database positions.
      radius: ball radius (same units as positions).
      k: static neighbor cap.
      chunk: centroid-chunk size bounding the (chunk, N) distance tile.
      method:
        "nearest" — the k nearest in-radius points (approx_min_k on TPU).
        "grouped" — partition the N points into k contiguous groups and take
          the nearest in-radius point of each group. Since the data layer
          shuffles point order (random subsampling), groups are random
          subsets: the selected set spans the whole ball instead of its
          densest core, closer to the reference's arbitrary <=2000-neighbor
          subset (model/point_net2.py:24), and it needs a single VPU argmin
          pass instead of a top-k — the TPU-native choice.

    Returns:
      idx: (..., C, k) int32 indices into N (0 where masked).
      mask: (..., C, k) bool validity.
    """
    single = functools.partial(
        _ball_query_grouped if method == "grouped" else _ball_query_single,
        radius=radius, k=k, chunk=chunk,
    )
    if centroids.ndim == 2:
        return single(centroids, points)
    fn = single
    for _ in range(centroids.ndim - 2):
        fn = jax.vmap(fn)
    return fn(centroids, points)


def _ball_query_grouped(centroids, points, radius, k, chunk):
    points = points.astype(jnp.float32)
    n = points.shape[0]
    g = -(-n // k)  # group size; the last group is padded with +inf scores
    r2 = jnp.float32(radius) ** 2
    pts_sq = jnp.sum(points * points, axis=-1)

    def one_chunk(c):
        c = c.astype(jnp.float32)
        cp = jax.lax.dot_general(
            c, points.T,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        d2 = jnp.sum(c * c, axis=-1, keepdims=True) - 2.0 * cp + pts_sq[None, :]
        d2 = jnp.maximum(d2, 0.0)
        score = jnp.where(d2 <= r2, d2, _BIG)  # (Cc, N)
        if k * g != n:
            score = jnp.concatenate(
                [score, jnp.full((score.shape[0], k * g - n), _BIG)], axis=1
            )
        sg = score.reshape(score.shape[0], k, g)
        within = jnp.argmin(sg, axis=-1).astype(jnp.int32)  # (Cc, k)
        smin = jnp.min(sg, axis=-1)
        base = (jnp.arange(k, dtype=jnp.int32) * g)[None, :]
        idx = base + within
        mask = smin < _BIG * 0.5
        return jnp.where(mask, idx, 0), mask

    return chunked_map(one_chunk, centroids, chunk)


def _ball_query_single(centroids, points, radius, k, chunk):
    points = points.astype(jnp.float32)
    r2 = jnp.float32(radius) ** 2
    pts_sq = jnp.sum(points * points, axis=-1)  # (N,)

    def one_chunk(c):
        c = c.astype(jnp.float32)
        # squared distances via the expanded form: MXU-friendly (C,3)x(3,N).
        # precision=HIGHEST: TPU matmuls default to bf16 inputs, which
        # perturbs distances by ~2^-8 relative — enough to swap neighbors
        # at the radius boundary.
        cp = jax.lax.dot_general(
            c, points.T,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        d2 = jnp.sum(c * c, axis=-1, keepdims=True) - 2.0 * cp + pts_sq[None, :]
        d2 = jnp.maximum(d2, 0.0)
        score = jnp.where(d2 <= r2, d2, _BIG)
        # approx_min_k: TPU-native partial selection (~20x faster than
        # lax.top_k here). Recall < 1 only reorders which in-radius points
        # fill the K slots — the reference itself keeps an arbitrary <=2000
        # subset (model/point_net2.py:24), and the downstream aggregation is
        # a masked max, so exact nearest-K is not required. On TPU the
        # selection runs on bf16 scores (halves the HBM traffic of the score
        # matrix); the radius mask itself stays exact f32.
        if jax.default_backend() == "tpu":
            score = score.astype(jnp.bfloat16)
        val, idx = jax.lax.approx_min_k(score, k, aggregate_to_topk=True)
        mask = val.astype(jnp.float32) < _BIG * 0.5
        idx = jnp.where(mask, idx, 0)
        return idx.astype(jnp.int32), mask

    return chunked_map(one_chunk, centroids, chunk)
