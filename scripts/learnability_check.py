"""Learnability validation: train on synthetic plots whose ground-truth
coverages are *constructed from the cloud geometry* (strata occupy known
area fractions), and verify the model beats the predict-the-mean baseline.

This is the strongest quality check available without the private IGN field
data: it exercises the full weak-supervision loop — pointwise predictions,
in-graph raster max-projection, plot-level coverage supervision, KDE prior.

Usage: python scripts/learnability_check.py [--epochs 60] [--n_plots 60]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_learnable_plot(rng, n=3000, center=(0.0, 0.0), radius=10.0):
    """Cloud whose per-stratum coverages are controlled area fractions.

    The plot disk is divided into pixel cells; each stratum occupies a random
    subset of cells with known fraction. GT = those fractions (the quantity
    the raster max-projection measures).
    """
    cov_low = rng.uniform(0.05, 0.95)
    cov_med = rng.uniform(0.05, 0.95)
    cov_high = rng.uniform(0.05, 0.95)

    # pixel centers inside the disk
    g = np.arange(-radius + 0.5, radius, 1.0)
    xx, yy = np.meshgrid(g, g)
    inside = xx**2 + yy**2 < radius**2
    cells = np.stack([xx[inside], yy[inside]], 1)
    n_cells = len(cells)

    def stratum_points(cov, z_lo, z_hi, count):
        k = max(1, int(round(cov * n_cells)))
        chosen = cells[rng.choice(n_cells, k, replace=False)]
        cell_of_pt = chosen[rng.integers(0, k, count)]
        xy = cell_of_pt + rng.uniform(-0.5, 0.5, (count, 2))
        z = rng.uniform(z_lo, z_hi, count)
        return xy, z

    # ground points everywhere (z ~ 0), strata points in their cells
    counts = [n // 2, n // 6, n // 6, n - n // 2 - 2 * (n // 6)]
    xs, zs = [], []
    xy_g = cells[rng.integers(0, n_cells, counts[0])] + rng.uniform(-0.5, 0.5, (counts[0], 2))
    xs.append(xy_g), zs.append(rng.uniform(0, 0.05, counts[0]))
    for cov, (lo, hi), cnt in [
        (cov_low, (0.1, 0.4), counts[1]),
        (cov_med, (1.2, 4.0), counts[2]),
        (cov_high, (6.0, 18.0), counts[3]),
    ]:
        xy, z = stratum_points(cov, lo, hi, cnt)
        xs.append(xy), zs.append(z)
    xy = np.concatenate(xs) + np.asarray(center)
    z = np.concatenate(zs)
    n_tot = len(z)
    cloud = np.zeros((10, n_tot), np.float32)
    cloud[0], cloud[1], cloud[2] = xy[:, 0], xy[:, 1], z
    cloud[3:7] = rng.uniform(0, 65535, (4, n_tot))
    cloud[7] = rng.uniform(0, 32767, n_tot)
    cloud[8:] = 1.0
    gt = np.array([cov_low, 1 - cov_low, cov_med, cov_high], np.float32)
    return cloud, gt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--n_plots", type=int, default=60)
    ap.add_argument("--subsample_size", type=int, default=4096)
    ap.add_argument("--ball_query_method", default="grouped", choices=["grouped", "nearest"])
    ap.add_argument("--seed", type=int, default=0, help="data + training seed")
    ap.add_argument(
        "--fps_parts", type=int, default=0,
        help="partitioned-FPS parts override (0 = config default); the "
        "r4 roofline flags parts as a serial-latency lever whose cost is "
        "sampling approximation — this sweep measures the MAE side",
    )
    ns = ap.parse_args()

    from dataclasses import replace

    from stratanet2_tpu.config import Config
    from stratanet2_tpu.learning.kde import fit_kde_mixture_from_dataset
    from stratanet2_tpu.learning.train import train_full
    from stratanet2_tpu.utils.experiment import MetricSink

    rng = np.random.default_rng(ns.seed)
    dataset = {}
    for i in range(ns.n_plots):
        cloud, gt = make_learnable_plot(rng, center=(100.0 * i, 0.0))
        pid = f"L{i:03d}"
        dataset[pid] = {
            "cloud": cloud,
            "coverages": gt,
            "plot_center": np.array([100.0 * i, 0.0], np.float32),
            "plot_id": pid,
            "N_points_in_cloud": cloud.shape[1],
            "index": i,
        }

    cfg = Config()
    cfg = replace(
        cfg,
        model=replace(
            cfg.model,
            subsample_size=ns.subsample_size,
            ball_query_method=ns.ball_query_method,
            **(
                {"fps_parts": ns.fps_parts, "fps_min_part_samples": 1}
                if ns.fps_parts
                else {}
            ),
        ),
        train=replace(
            cfg.train, n_epoch=ns.epochs, n_epoch_test=max(ns.epochs // 4, 1),
            batch_size=8,
        ),
    )
    kde = fit_kde_mixture_from_dataset(dataset)
    ids = np.array(sorted(dataset.keys()))
    n_val = ns.n_plots // 5
    with tempfile.TemporaryDirectory() as td:
        sink = MetricSink(td)
        _, train_losses, test_losses, infos = train_full(
            dataset, ids[n_val:], ids[:n_val], cfg, kde, td, sink, fold_id=1,
            seed=ns.seed,
        )
    final_mae = test_losses[-1]["MAE_loss"]
    # predict-the-mean baseline on [0.05, 0.95]-uniform coverages: MAE ~0.30
    gts = np.array([[dataset[i]["coverages"][j] for j in (0, 2, 3)] for i in ids[:n_val]])
    baseline = np.abs(gts - gts.mean()).mean()
    print(f"val MAE after {ns.epochs} epochs: {final_mae:.4f}")
    print(f"predict-the-mean baseline:       {baseline:.4f}")
    print(f"train loss first->last: {train_losses[0]['MAE_loss']:.4f} -> {train_losses[-1]['MAE_loss']:.4f}")
    import json

    print(
        "LEARNABILITY_SUMMARY "
        + json.dumps(
            {
                "seed": ns.seed,
                "policy": ns.ball_query_method,
                "fps_parts": ns.fps_parts,
                "epochs": ns.epochs,
                "n_plots": ns.n_plots,
                "val_MAE": float(final_mae),
                "baseline_MAE": float(baseline),
                "train_MAE_first": float(train_losses[0]["MAE_loss"]),
                "train_MAE_last": float(train_losses[-1]["MAE_loss"]),
            }
        ),
        flush=True,
    )
    assert final_mae < baseline, "model failed to beat the mean-predictor baseline"
    print("LEARNABILITY CHECK PASSED")


if __name__ == "__main__":
    main()
