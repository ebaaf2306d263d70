"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric (BASELINE.md): PointNet2 inference throughput in
points/sec/chip on fixed 4096-pt plot clouds (BASELINE config 1), steady
state, jit-compiled, on whatever single chip is available.

vs_baseline: the reference publishes no numbers (BASELINE.json
"published": {}); the driver's north star is >=20x the PyTorch-CUDA
reference's plots/sec on one v5e chip. We anchor the denominator to a
documented estimate of the reference pipeline: ~25 plots/sec at 10k pts/plot
on its target 2021-era CUDA GPU (torch_cluster FPS + radius + PointConv +
knn_interpolate at batch 20), i.e. ~250k points/sec. The 20x target is then
5.0e6 points/sec/chip, and vs_baseline = value / 5.0e6 (>=1.0 means the
north-star target is met). The estimate is fixed here so the number is
comparable across rounds.
"""

from __future__ import annotations

import json
import time

NORTH_STAR_POINTS_PER_SEC = 5.0e6


def main():
    import jax
    import jax.numpy as jnp

    from stratanet2_tpu.config import Config
    from dataclasses import replace

    cfg = Config()
    mcfg = replace(cfg.model, subsample_size=4096)
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        mcfg = replace(mcfg, use_pallas=False)

    from stratanet2_tpu.models import init_pointnet2, pointnet2_forward

    model = init_pointnet2(jax.random.PRNGKey(0), mcfg)
    batch = 32 if on_tpu else 4
    n = mcfg.subsample_size
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    cloud = jax.random.uniform(k1, (batch, n, mcfg.n_input_feats - 2), jnp.float32)
    xyz = jax.random.uniform(k2, (batch, n, 3), jnp.float32, minval=-10.0, maxval=10.0)

    iters = 20 if on_tpu else 2

    # Chain iterations through a data dependence inside one jitted program and
    # fetch a scalar: measures pure device throughput and is robust to
    # backends where block_until_ready does not actually synchronize.
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

    float(many(model.params, model.state, cloud, xyz))  # compile + warmup
    t0 = time.perf_counter()
    float(many(model.params, model.state, cloud, xyz))  # forces full sync
    dt = time.perf_counter() - t0

    points_per_sec = batch * n * iters / dt
    print(
        json.dumps(
            {
                "metric": "pointnet2_inference_points_per_sec_per_chip",
                "value": round(points_per_sec, 1),
                "unit": "points/sec/chip",
                "vs_baseline": round(points_per_sec / NORTH_STAR_POINTS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
