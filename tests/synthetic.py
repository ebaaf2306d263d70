"""Synthetic LiDAR fixtures for tests and benchmarks (SURVEY.md §4: golden
parity on synthetic clouds; the archived dataset is not available)."""

import numpy as np

from stratanet2_tpu.utils.synthetic import make_plot_cloud  # noqa: F401 (shared fixture)


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
