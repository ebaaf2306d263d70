"""Sweep eval-forward batch size at bench config-1 geometry (4096-pt clouds).

Measures chained steady-state throughput (same chaining as bench.py) for
several batch sizes on the live chip, to check whether the bench's b=32
leaves MXU/VPU utilization on the table.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/batch_sweep.py
"""

from __future__ import annotations

import time
from dataclasses import replace

import jax
import jax.numpy as jnp

from stratanet2_tpu.config import Config
from stratanet2_tpu.models import init_pointnet2, pointnet2_forward
from stratanet2_tpu.utils.experiment import enable_compilation_cache


def main():
    enable_compilation_cache()
    cfg = Config()
    mcfg = replace(cfg.model, subsample_size=4096)
    model = init_pointnet2(jax.random.PRNGKey(0), mcfg)
    n = mcfg.subsample_size

    import sys

    batches = tuple(int(a) for a in sys.argv[1:]) or (16, 32, 64, 128)
    for batch in batches:
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        cloud = jax.random.uniform(k1, (batch, n, mcfg.n_input_feats - 2), jnp.float32)
        xyz = jax.random.uniform(k2, (batch, n, 3), jnp.float32, minval=-10.0, maxval=10.0)
        iters = max(1, (200 * 32) // batch)  # constant total points per burst

        @jax.jit
        def many(params, state, cloud, xyz, iters=iters):
            def body(_, carry):
                acc, cl = carry
                cov, _proba, _ = pointnet2_forward(
                    type(model)(params, state), cl, xyz, mcfg, train=False
                )
                s = cov.sum()
                return (acc + s, cl + s * 1e-20)

            acc, _ = jax.lax.fori_loop(0, iters, body, (0.0, cloud))
            return acc

        float(many(model.params, model.state, cloud, xyz))  # compile + warm
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(many(model.params, model.state, cloud, xyz))
            dt = min(dt, time.perf_counter() - t0)
        pps = batch * n * iters / dt
        print(
            f"b={batch:4d} iters={iters:4d}: {pps/1e6:7.2f}M pts/s "
            f"({batch * n / (pps / 1e3):7.3f} ms/step)"
        )


if __name__ == "__main__":
    main()
