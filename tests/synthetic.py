"""Synthetic LiDAR fixtures for tests and benchmarks (SURVEY.md §4: golden
parity on synthetic clouds; the archived dataset is not available)."""

import numpy as np


def make_plot_cloud(rng, n=400, center=(500.0, 6_500_000.0), radius=10.0):
    """Feature-major (10, N) plot cloud with plausible vegetation structure."""
    theta = rng.uniform(0, 2 * np.pi, n)
    r = radius * np.sqrt(rng.uniform(0, 1, n))
    x = center[0] + r * np.cos(theta)
    y = center[1] + r * np.sin(theta)
    # three strata: ground (z~0), medium (1-5m), high (5-20m)
    kind = rng.choice(3, n, p=[0.5, 0.3, 0.2])
    z = np.where(
        kind == 0,
        rng.uniform(0, 0.3, n),
        np.where(kind == 1, rng.uniform(1, 5, n), rng.uniform(5, 20, n)),
    )
    colors = rng.uniform(0, 65535, (4, n))
    intensity = rng.uniform(0, 32767, n)
    return_num = rng.integers(1, 4, n).astype(np.float64)
    num_returns = np.maximum(return_num, rng.integers(1, 4, n))
    return np.asarray(
        [x, y, z, colors[0], colors[1], colors[2], colors[3], intensity,
         return_num, num_returns],
        dtype=np.float32,
    )


def make_plot_dataset(rng, n_plots=8, n_points=400):
    """A {plot_id: cloud_data} dataset matching the pickled layout
    (utils/load_data.py:52-62)."""
    dataset = {}
    for i in range(n_plots):
        cloud = make_plot_cloud(rng, n=n_points, center=(100.0 * i, 200.0 * i))
        gt = rng.uniform(0, 1, 4)
        gt[1] = 1.0 - gt[0]  # COUV_SOL = 1 - COUV_BASSE
        pid = f"PLOT_{i:03d}"
        dataset[pid] = {
            "cloud": cloud,
            "coverages": gt.astype(np.float32),
            "plot_center": np.array(
                [
                    (cloud[0].max() + cloud[0].min()) / 2,
                    (cloud[1].max() + cloud[1].min()) / 2,
                ],
                np.float32,
            ),
            "plot_id": pid,
            "N_points_in_cloud": cloud.shape[1],
            "index": i,
        }
    return dataset


def tiny_config(**model_kw):
    from dataclasses import replace

    from stratanet2_tpu.config import Config

    cfg = Config().as_dev()
    cfg = replace(
        cfg,
        model=replace(
            cfg.model,
            subsample_size=256,
            k1=8,
            k2=16,
            knn_chunk=128,
            use_pallas=False,
            **model_kw,
        ),
        train=replace(cfg.train, batch_size=4, n_epoch=2, n_epoch_test=1),
    )
    return cfg
