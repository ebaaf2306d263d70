"""Programmatic API tour: use stratanet2_tpu as a library, no CLI.

Covers what a user of the reference repo reaches for in code
(model/point_net2.py + learning/train.py there):

  1. build + jit the PointNet2 forward on synthetic clouds;
  2. project pointwise coverages to plot-level scalars and rasters;
  3. run fused training steps (forward + projection + 3-term loss +
     backward + Adam in ONE device program);
  4. scale out: replicate the model over a data-parallel device mesh;
  5. (multi-device) the point-sharded forward for very dense clouds.

Runs on CPU or TPU. For a quick CPU try:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    PYTHONPATH=. python examples/library_usage.py
"""

from __future__ import annotations

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
    from stratanet2_tpu.models import init_pointnet2, pointnet2_forward
    from stratanet2_tpu.ops.projection import (
        batched_raster_projection,
        plotwise_coverages,
    )

    # ---- configuration: frozen dataclasses (reference config.py) --------
    cfg = Config()  # PROD defaults: 10k pts/plot, batch 20
    from dataclasses import replace

    cfg = replace(
        cfg,
        model=replace(cfg.model, subsample_size=1024, k1=16, k2=32),
        train=replace(cfg.train, batch_size=8),
    )
    mcfg = cfg.model
    b, n = cfg.train.batch_size, mcfg.subsample_size

    # ---- synthetic batch (see data/transforms.load_cloud_item for the
    # real pipeline: center -> fake ground points -> augment -> rescale) --
    rng = np.random.default_rng(0)
    # full feature layout (data/transforms.rescale_cloud): columns 0-1 are
    # rescaled x/y (projections use them), the model consumes columns 2:
    cloud = jnp.asarray(rng.uniform(0, 1, (b, n, mcfg.n_input_feats)), jnp.float32)
    xyz = jnp.asarray(rng.uniform(-10, 10, (b, n, 3)), jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (b, 4)), jnp.float32)

    # ---- 1. forward --------------------------------------------------
    model = init_pointnet2(jax.random.PRNGKey(0), mcfg)

    @jax.jit
    def forward(m, cloud, xyz):
        cov, proba, _ = pointnet2_forward(m, cloud[..., 2:], xyz, mcfg, train=False)
        return cov, proba

    cov, proba = forward(model, cloud, xyz)
    print(f"forward: coverages {cov.shape}, proba {proba.shape}")

    # ---- 2. projections (reference model/project_to_2d.py) ------------
    pred_pl = plotwise_coverages(cov, cloud[..., :2], mcfg.diam_pix)
    rasters = batched_raster_projection(
        cloud[..., :2], cov, mcfg.diam_pix, mcfg.diam_meters
    )
    print(f"plot-level coverages {pred_pl.shape}, rasters {rasters.shape}")

    # ---- 3. fused train steps ------------------------------------------
    kde = fit_kde_mixture(rng.uniform(0, 20, 5000))
    optimizer = make_optimizer(cfg, steps_per_epoch=10)
    ts = init_train_state(cfg, optimizer, seed=0)
    train_step = make_train_step(cfg, optimizer, kde)
    for i in range(3):
        ts, comps = train_step(ts, cloud, xyz, gt, jax.random.PRNGKey(i))
    print(f"3 train steps: total_loss={float(comps['total_loss']):.4f}")

    # ---- 4. data-parallel mesh ------------------------------------------
    n_dev = len(jax.devices())
    if n_dev > 1 and b % n_dev == 0:
        from stratanet2_tpu.parallel import batch_sharding, make_mesh, replicate

        mesh = make_mesh()
        ts = replicate(mesh, ts)
        cloud_s = jax.device_put(cloud, batch_sharding(mesh, 3))
        xyz_s = jax.device_put(xyz, batch_sharding(mesh, 3))
        gt_s = jax.device_put(gt, batch_sharding(mesh, 2))
        ts, comps = train_step(ts, cloud_s, xyz_s, gt_s, jax.random.PRNGKey(9))
        print(
            f"DP step over {n_dev} devices: "
            f"total_loss={float(comps['total_loss']):.4f}"
        )

    # ---- 5. point-sharded (context-parallel) forward -------------------
    if n_dev > 1 and n % n_dev == 0 and mcfg.k1 % n_dev == 0 and mcfg.n_centroids1 % n_dev == 0:
        from stratanet2_tpu.parallel.point_sharded import (
            make_mesh_2d,
            pointnet2_forward_point_sharded,
        )

        mesh2 = make_mesh_2d(1, n_dev)
        with mesh2:
            cov_ps, _ = pointnet2_forward_point_sharded(
                model, cloud[..., 2:], xyz, cfg, mesh2
            )
        # random uniform clouds have many neighbor-selection near-ties, so
        # shard-local selection can pick a different (equally valid)
        # neighbor; bitwise equality on tie-free clouds is asserted in
        # tests/test_point_sharded.py
        np.testing.assert_allclose(
            np.asarray(cov_ps), np.asarray(cov), rtol=2e-2, atol=2e-3
        )
        print(f"point-sharded forward over {n_dev} devices matches unsharded")


if __name__ == "__main__":
    main()
