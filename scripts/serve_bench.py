"""Chained eval-forward at the reference serve geometry (b=20 x 10000).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/serve_bench.py

Same chaining discipline as bench.py/batch_sweep.py (the relay charges a
fixed ~33 ms per scalar fetch). VERDICT r4 item 6.
"""
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
    mcfg = cfg.model  # PROD: subsample_size=10000
    assert mcfg.subsample_size == 10000
    model = init_pointnet2(jax.random.PRNGKey(0), mcfg)
    n = mcfg.subsample_size
    batch = 20
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    cloud = jax.random.uniform(k1, (batch, n, mcfg.n_input_feats - 2), jnp.float32)
    xyz = jax.random.uniform(k2, (batch, n, 3), jnp.float32, minval=-10.0, maxval=10.0)
    iters = 100

    @jax.jit
    def many(params, state, cloud, xyz):
        def body(_, carry):
            acc, cl = carry
            cov, _proba, _ = pointnet2_forward(
                type(model)(params, state), cl, xyz, mcfg, train=False
            )
            s = cov.sum()
            return (acc + s, cl + s * 1e-20)

        acc, _ = jax.lax.fori_loop(0, iters, body, (0.0, cloud))
        return acc

    float(many(model.params, model.state, cloud, xyz))
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(model.params, model.state, cloud, xyz))
        dt = min(dt, time.perf_counter() - t0)
    pps = batch * n * iters / dt
    print(
        f"PROD serve eval fwd b={batch}x{n}: {pps/1e6:.2f}M pts/s "
        f"({batch * n / (pps / 1e3):.3f} ms/step chained wall)"
    )


if __name__ == "__main__":
    main()
