"""Micro-profile of the projection/loss ops at PROD geometry (b=20 x 10k).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_projection.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from stratanet2_tpu.ops import plotwise_coverages, batched_raster_projection


def timeit(fn, *args, iters=10, trials=3):
    float(fn(*args))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def chain(fn, iters):
    @jax.jit
    def many(x, *rest):
        def body(_, carry):
            acc, x_ = carry
            s = fn(x_, *rest)
            return acc + s, x_ + s * 1e-20

        acc, _ = jax.lax.fori_loop(0, iters, body, (0.0, x))
        return acc

    return many


def main():
    b, n, p = 20, 10000, 20
    rng = np.random.default_rng(0)
    cov = jnp.asarray(rng.uniform(0, 1, (b, n, 4)), jnp.float32)
    xy = jnp.asarray(rng.uniform(-1, 1, (b, n, 2)), jnp.float32)
    iters = 10

    def fwd(c):
        return plotwise_coverages(c, xy, p).sum()

    def fwdbwd(c):
        return jax.grad(lambda c_: plotwise_coverages(c_, xy, p).sum())(c).sum()

    def rast(c):
        return jnp.nansum(batched_raster_projection(xy, c, p, p))

    rows = [
        ("plotwise fwd", timeit(chain(fwd, iters), cov, iters=iters)),
        ("plotwise fwd+bwd", timeit(chain(fwdbwd, iters), cov, iters=iters)),
        ("raster projection fwd", timeit(chain(rast, iters), cov, iters=iters)),
    ]
    print(f"b={b} n={n} P={p}, backend={jax.default_backend()}")
    for name, dt in rows:
        print(f"{name:<28} {dt*1e3:>8.2f} ms")


if __name__ == "__main__":
    main()
