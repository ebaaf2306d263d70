"""Chained PROD train-step time vs fps_parts (VERDICT r4 item 3, perf side)."""
import time
from dataclasses import replace

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from stratanet2_tpu.config import Config
    from stratanet2_tpu.learning.kde import fit_kde_mixture
    from stratanet2_tpu.learning.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from stratanet2_tpu.utils.experiment import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    kde = fit_kde_mixture(rng.uniform(0, 20, 10000))

    for parts in (2, 4, 8):
        cfg = Config()
        cfg = replace(
            cfg,
            model=replace(
                cfg.model, fps_parts=parts, fps_min_part_samples=1
            ),
        )
        b, n = cfg.train.batch_size, cfg.model.subsample_size
        cloud = jnp.asarray(rng.random((b, n, 10), np.float32))
        xyz = jnp.asarray(rng.random((b, n, 3), np.float32) * 10.0)
        gt = jnp.asarray(rng.random((b, 4), np.float32))
        optimizer = make_optimizer(cfg, steps_per_epoch=10)
        ts = init_train_state(cfg, optimizer, seed=0)
        step = make_train_step(cfg, optimizer, kde, jit=False)
        key = jax.random.PRNGKey(0)
        iters = 64

        @jax.jit
        def chain(ts, cloud, xyz, gt, key):
            def body(carry, _):
                ts_ = carry
                ts_, comps = step(ts_, cloud, xyz, gt, key)
                return ts_, comps["total_loss"]

            ts, losses = jax.lax.scan(body, ts, None, length=iters)
            return ts, losses[-1]

        ts2, loss = chain(ts, cloud, xyz, gt, key)
        float(loss)  # compile+warm
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _, loss = chain(ts, cloud, xyz, gt, key)
            float(loss)
            dt = min(dt, time.perf_counter() - t0)
        ms = dt / iters * 1e3
        print(
            f"fps_parts={parts}: {ms:.2f} ms/step chained "
            f"({b * n / ms * 1e3 / 1e6:.2f}M pts/s)"
        )


if __name__ == "__main__":
    main()
