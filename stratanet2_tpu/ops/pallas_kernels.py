"""Pallas TPU kernels for the point-cloud hot loops.

`fps_pallas` — farthest point sampling with the running min-distance cache
resident in VMEM for the whole selection loop. The lax fallback
(`ops.fps._fps_lax`) re-reads the (B, N) distance array from HBM every
iteration (~2 GB of traffic for B=20, N=10k, S=2.5k); this kernel keeps
xyz (B,3,N ~ 2.4 MB) and the cache (B,N ~ 0.8 MB) on-chip, so the loop is
VPU-bound.

The kernel is batched: one grid step processes ALL clouds per FPS iteration
(the selection loop is sequential, so batching across B is the only
parallelism available — same reasoning as the reference's per-batch CUDA
kernel, torch_cluster fps).

Per iteration (all shapes (B, N), VPU element ops):
  1. one-hot of last selected index -> selected xyz via masked row-sums
  2. squared distance to selected point
  3. min into the cache
  4. per-row argmax -> next index
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fps_kernel(n_samples: int, n_valid: int):
    def kernel(start_ref, xyz_ref, out_ref, dist_ref):
        # xyz_ref: (B, 3, Np) VMEM; start_ref: (B, 1) VMEM int32
        # out_ref: (n_samples, B) int32 VMEM; dist_ref: (B, Np) f32 scratch
        b, _, npad = xyz_ref.shape
        col = jax.lax.broadcasted_iota(jnp.int32, (b, npad), dimension=1)
        valid = col < n_valid

        # init: cache=+inf on valid, -1 on padding (never selected)
        dist_ref[:, :] = jnp.where(valid, jnp.float32(3.4e38), jnp.float32(-1.0))

        start = start_ref[:, 0]  # (B,)
        out_ref[0, :] = start

        def body(i, last):
            # last: (B,) int32 indices of the most recent selection
            onehot = (col == last[:, None]).astype(jnp.float32)  # (B, Np)
            x = xyz_ref[:, 0, :]
            y = xyz_ref[:, 1, :]
            z = xyz_ref[:, 2, :]
            sx = jnp.sum(x * onehot, axis=1, keepdims=True)
            sy = jnp.sum(y * onehot, axis=1, keepdims=True)
            sz = jnp.sum(z * onehot, axis=1, keepdims=True)
            d2 = (x - sx) ** 2 + (y - sy) ** 2 + (z - sz) ** 2
            cache = jnp.minimum(dist_ref[:, :], jnp.where(valid, d2, -1.0))
            dist_ref[:, :] = cache
            nxt = jnp.argmax(cache, axis=1).astype(jnp.int32)  # (B,)
            out_ref[i, :] = nxt
            return nxt

        jax.lax.fori_loop(1, n_samples, body, start)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_samples",))
def fps_pallas_batched(
    xyz: jax.Array, n_samples: int, start_idx: jax.Array
) -> jax.Array:
    """FPS over a batch of clouds.

    Args:
      xyz: (B, N, 3) float positions.
      n_samples: static selection count.
      start_idx: (B,) int32 first indices.

    Returns:
      (B, n_samples) int32 indices.
    """
    b, n, _ = xyz.shape
    npad = _round_up(n, _LANE)
    xt = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (B, 3, N)
    if npad != n:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, npad - n)))
    start = start_idx.astype(jnp.int32).reshape(b, 1)

    out = pl.pallas_call(
        _fps_kernel(n_samples, n),
        out_shape=jax.ShapeDtypeStruct((n_samples, b), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b, npad), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(start, xt)
    return out.T


def fps_pallas(xyz: jax.Array, n_samples: int, start_idx: jax.Array) -> jax.Array:
    """Single-cloud wrapper: (N, 3) -> (n_samples,)."""
    return fps_pallas_batched(xyz[None], n_samples, jnp.reshape(start_idx, (1,)))[0]
