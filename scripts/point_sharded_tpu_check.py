"""One-chip validation of point-sharded training on the REAL TPU backend.

A 1-device (1, 1) mesh still runs the full shard_map(check_vma=True)
machinery — including the compiled-pallas custom-VJP gather path that
gather_rows routes to on the TPU backend (ops/pallas_kernels.gather_rows;
on CPU the interpret-mode pallas VJP fails the VMA checker so the raw-XLA
form is used instead). Asserts one optimizer step matches the unsharded
train step to f32 tolerance.

Run when a chip is available (first compile of the shard_map program is
SLOW — do not bound it with a timeout you might hit, see CLAUDE.md):

  PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/point_sharded_tpu_check.py
"""

import numpy as np
from dataclasses import replace

import jax
import jax.numpy as jnp


def main():
    from stratanet2_tpu.utils.experiment import enable_compilation_cache

    enable_compilation_cache()

    from stratanet2_tpu.config import Config
    from stratanet2_tpu.learning.kde import fit_kde_mixture
    from stratanet2_tpu.learning.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from stratanet2_tpu.parallel.point_sharded import (
        make_mesh_2d,
        make_point_sharded_train_step,
    )

    cfg = Config()
    cfg = replace(
        cfg,
        model=replace(cfg.model, subsample_size=1024, k1=8),
        train=replace(cfg.train, batch_size=4),
    )
    rng = np.random.default_rng(0)
    b, n = cfg.train.batch_size, cfg.model.subsample_size
    cloud = jnp.asarray(rng.uniform(0, 1, (b, n, 10)), jnp.float32)
    xyz = jnp.asarray(rng.uniform(-10, 10, (b, n, 3)), jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (b, 4)), jnp.float32)
    kde = fit_kde_mixture(rng.uniform(0, 20, 5000))
    opt = make_optimizer(cfg, steps_per_epoch=10)

    import time

    t0 = time.time()
    ts0 = init_train_state(cfg, opt, seed=0)
    step = make_train_step(cfg, opt, kde)
    ts1, comps1 = step(ts0, cloud, xyz, gt, jax.random.PRNGKey(0))
    print("unsharded step done", time.time() - t0, flush=True)

    mesh = make_mesh_2d(1, 1)
    ps = make_point_sharded_train_step(cfg, opt, kde, mesh)
    ts0b = init_train_state(cfg, opt, seed=0)
    t0 = time.time()
    with mesh:
        ts2, comps2 = ps(ts0b, cloud, xyz, gt, jax.random.PRNGKey(0))
        l2v = float(comps2["total_loss"])
    print("point-sharded step done", time.time() - t0, flush=True)
    print("losses:", float(comps1["total_loss"]), l2v, flush=True)
    l1 = jax.tree_util.tree_leaves(ts1.params)
    l2 = jax.tree_util.tree_leaves(ts2.params)
    worst = max(float(jnp.max(jnp.abs(a - b2))) for a, b2 in zip(l1, l2))
    print("max param diff after 1 step:", worst, flush=True)
    assert worst < 5e-5, worst
    print("TPU point-sharded (1-device mesh) matches unsharded: OK", flush=True)


if __name__ == "__main__":
    main()
