"""Leading-axis chunking helper to bound transient memory of dense distance
matrices (C x N tiles) without dynamic shapes: pad to a multiple of the chunk
size, `lax.map` over chunks, unpad. Everything stays static-shape for XLA."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def chunked_map(fn: Callable, x: jax.Array, chunk: int):
    """Apply `fn` over chunks of the leading axis of `x`.

    fn maps (chunk, ...) -> pytree of (chunk, ...); returns the concatenated
    pytree with the original (unpadded) leading size.
    """
    n = x.shape[0]
    if n <= chunk:
        return fn(x)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    if pad:
        x = jnp.concatenate([x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])], axis=0)
    x = x.reshape((n_chunks, chunk) + x.shape[1:])
    out = jax.lax.map(fn, x)
    return jax.tree_util.tree_map(
        lambda a: a.reshape((n_chunks * chunk,) + a.shape[2:])[:n], out
    )
