"""Per-stage micro-benchmark of sa_fused_eval at bench config-1 geometry.

The round-4 eval trace shows sa_fused (SA1+SA2 summed — both pallas_calls
share a name) at 4.20 ms/step at b=128 x 4096, vs ~2.5-3.5 ms modeled
no-overlap (VERDICT r4 weak #1). This script times each SA stage
SEPARATELY with the same chaining discipline as bench.py (the relay
charges ~33 ms per scalar fetch; a tiny perturbation of q defeats CSE of
the loop body), so the gap can be attributed and attacked per stage.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/sa_bench.py \
      [--batch 128] [--subsample 4096] [--iters 50]
"""

from __future__ import annotations

import argparse
import time
from dataclasses import replace

import numpy as np


def time_stage(name, fn, args, iters):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(q, *rest):
        def body(_, carry):
            acc, qc = carry
            out = fn(qc, *rest)
            s = out.sum()
            return (acc + s, qc + s * 1e-20)

        acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0.0), q))
        return acc

    float(many(*args))  # compile + warm
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(*args))
        dt = min(dt, time.perf_counter() - t0)
    ms = dt / iters * 1e3
    print(f"{name:34s} {ms:7.3f} ms/call")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--subsample", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=50)
    ns = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from stratanet2_tpu.config import Config
    from stratanet2_tpu.ops.pallas_kernels import sa_fused_eval
    from stratanet2_tpu.utils.experiment import enable_compilation_cache

    enable_compilation_cache()
    cfg = replace(Config().model, subsample_size=ns.subsample)
    b = ns.batch
    rng = np.random.default_rng(0)

    # SA1: N pts -> C1 centroids, k1 groups, two-layer 16->16 MLP
    n1, c1 = cfg.subsample_size, cfg.n_centroids1
    ch1 = 16
    q1 = jnp.asarray(rng.standard_normal((b, n1, ch1)), jnp.float32)
    xyz1 = jnp.asarray(rng.uniform(-10, 10, (b, n1, 3)), jnp.float32)
    cent1 = xyz1[:, :c1]
    cterm1 = jnp.asarray(rng.standard_normal((b, c1, ch1)), jnp.float32)
    a1 = jnp.ones((ch1,), jnp.float32)
    c1v = jnp.zeros((ch1,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((ch1, ch1)) * 0.1, jnp.float32)
    b2 = jnp.zeros((ch1,), jnp.float32)

    def sa1(q, xyz, cent, cterm):
        return sa_fused_eval(
            q, xyz, cent, cterm, a1, c1v, w2, b2, a1, c1v,
            radius=cfg.r1, k=cfg.k1,
        )

    # SA2: C1 -> C2, k2 groups, single-layer 32 MLP
    n2, c2 = c1, cfg.n_centroids2
    ch2 = 32
    q2 = jnp.asarray(rng.standard_normal((b, n2, ch2)), jnp.float32)
    xyz2 = xyz1[:, :n2]
    cent2 = xyz2[:, :c2]
    cterm2 = jnp.asarray(rng.standard_normal((b, c2, ch2)), jnp.float32)
    a2 = jnp.ones((ch2,), jnp.float32)
    c2v = jnp.zeros((ch2,), jnp.float32)

    def sa2(q, xyz, cent, cterm):
        return sa_fused_eval(
            q, xyz, cent, cterm, a2, c2v, None, None, None, None,
            radius=cfg.r2, k=cfg.k2,
        )

    m1 = time_stage(
        f"SA1 b={b} n={n1} c={c1} k={cfg.k1}", sa1,
        (q1, xyz1, cent1, cterm1), ns.iters,
    )
    m2 = time_stage(
        f"SA2 b={b} n={n2} c={c2} k={cfg.k2}", sa2,
        (q2, xyz2, cent2, cterm2), ns.iters,
    )
    print(f"{'TOTAL sa_fused':34s} {m1 + m2:7.3f} ms (trace r4: 4.20)")


if __name__ == "__main__":
    main()
