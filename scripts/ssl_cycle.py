"""Full SSL cycle end-to-end (VERDICT r3 item 7).

Reference workflow (main_SSL.py:59-102, predict.py:104-111): a model
trained on labeled plots pseudo-labels unlabeled parcel tiles
(`predict --task pseudo_labelling`), `main_SSL` pretrains on those
pseudo-labels, and cross-validation warm-starts from the pretrained
checkpoint (`--PT_model_id`, learning/train.py:212-223). This script runs
the whole cycle through the REAL CLI entry points on synthetic LEARNABLE
data (geometry-derived GT, scripts/learnability_check.py) and reports the
three-stage wall clock plus warm-vs-cold final val MAE.

Stages (all via stratanet2_tpu.cli.* mains, in-process):
  0. build data: n_plots labeled LAS plots + GT CSV + n_parcels parcel LAS
     + shapefile (same generator for both -> pseudo-labels are in-domain)
  1. cold cross-val  (cli.main)                       -> MODEL_ID, cold MAE
  2. prepare         (cli.prepare)
  3. pseudo-label    (cli.predict --task pseudo_labelling)
  4. SSL pretrain    (cli.main_ssl)                   -> PT_ID
  5. warm cross-val  (cli.main --PT_model_id PT_ID)   -> warm MAE

Scale knobs (CPU smoke vs TPU run):
  --mode DEV      tiny epochs (CPU smoke; tests/test_ssl_cycle.py)
  --mode PROD     full schedule (run on the chip)
plus --n_plots/--points/--subsample_size/--batch_size/--epochs.

Output: one JSON line per stage + a final summary line; paste into
RESULTS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from stratanet2_tpu.utils.backendprobe import honor_platform_env  # noqa: E402

honor_platform_env()


def build_data(root: str, n_plots: int, points: int, n_parcels: int, seed: int):
    """Learnable labeled plots + parcels through the real file formats."""
    import pandas as pd

    from learnability_check import make_learnable_plot

    from stratanet2_tpu.data.las import write_las
    from stratanet2_tpu.inference import shapefile_io as S
    from stratanet2_tpu.inference.polygons import Polygon
    from stratanet2_tpu.utils.synthetic import cloud_to_las_fields

    rng = np.random.default_rng(seed)
    las_dir = os.path.join(root, "placettes_dataset", "las_classes")
    os.makedirs(las_dir, exist_ok=True)
    rows = []
    for i in range(n_plots):
        cloud, gt = make_learnable_plot(
            rng, n=points, center=(1000.0 + 40.0 * i, 2000.0)
        )
        write_las(
            os.path.join(las_dir, f"Plot_{i:03d}.las"), cloud_to_las_fields(cloud)
        )
        # gt = (BASSE, SOL, INTER, HAUTE) fractions; CSV carries percents
        rows.append(
            {
                "nom": f"Plot_{i:03d}",
                "COUV_BASSE": round(100 * float(gt[0])),
                "COUV_INTER": round(100 * float(gt[2])),
                "COUV_HAUTE": round(100 * float(gt[3])),
            }
        )
    pd.DataFrame(rows).to_csv(
        os.path.join(root, "placettes_dataset", "placettes_metadata.csv"),
        index=False,
    )

    # parcels: 3x3 grids of learnable clouds, one shapefile for all
    parcel_dir = os.path.join(root, "parcelles_dataset_20m", "input")
    os.makedirs(parcel_dir, exist_ok=True)
    recs = []
    for p in range(n_parcels):
        x0 = 200.0 * p
        clouds = [
            make_learnable_plot(
                rng, n=points, center=(x0 + cx, cy), radius=14.0
            )[0]
            for cx in (15.0, 40.0, 65.0)
            for cy in (15.0, 40.0, 65.0)
        ]
        pid = f"PARCEL_{p:03d}"
        write_las(
            os.path.join(parcel_dir, f"{pid}.las"),
            cloud_to_las_fields(np.concatenate(clouds, 1)),
        )
        ring = np.array(
            [[x0, 0], [x0 + 80, 0], [x0 + 80, 80], [x0, 80], [x0, 0]], float
        )
        recs.append(S.ShapeRecord(Polygon([ring]), {"ID": pid}))
    S.write_shapefile(
        os.path.join(parcel_dir, "parcels.shp"),
        S.Shapefile(fields=[S.FieldSpec("ID", "C", 16)], shape_records=recs),
    )


def last_val_mae(stats_path: str) -> float:
    """Final cross-fold mean val MAE from the run's metrics.jsonl."""
    best = None
    with open(os.path.join(stats_path, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            m = rec.get("metrics", {})
            if rec.get("context") == "val_mean" and "MAE_loss" in m:
                if best is None or rec.get("step", 0) >= best[0]:
                    best = (rec.get("step", 0), m["MAE_loss"])
    assert best is not None, f"no val_mean MAE in {stats_path}"
    return float(best[1])


def stage(name, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(json.dumps({"stage": name, "wall_s": round(dt, 1)}), flush=True)
    return out, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/ssl_cycle")
    ap.add_argument("--mode", default="DEV", choices=["DEV", "PROD"])
    ap.add_argument("--n_plots", type=int, default=40)
    ap.add_argument("--n_parcels", type=int, default=2)
    ap.add_argument("--points", type=int, default=4000)
    ap.add_argument("--subsample_size", type=int, default=2048)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=0, help="0 = mode default")
    ap.add_argument("--ssl_epochs", type=int, default=0, help="0 = mode default")
    ap.add_argument("--folds", type=int, default=0, help="0 = cfg default (5)")
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument(
        "--min_pseudo_points", type=int, default=0,
        help="min points per pseudo-label tile (0 = auto: scale the "
        "reference's 2000-pt filter, predict_utils.py:65, to the synthetic "
        "parcel density — each 20 m tile holds ~9*points/49 points)",
    )
    ns = ap.parse_args()
    min_pl = ns.min_pseudo_points or max(50, (9 * ns.points) // 98)

    from stratanet2_tpu.cli import main as cli_main
    from stratanet2_tpu.cli import main_ssl as cli_ssl
    from stratanet2_tpu.cli import predict as cli_predict
    from stratanet2_tpu.cli import prepare as cli_prepare

    root = ns.root
    os.makedirs(root, exist_ok=True)
    build_data(root, ns.n_plots, ns.points, ns.n_parcels, ns.seed)
    print(
        json.dumps(
            {
                "stage": "data",
                "n_plots": ns.n_plots,
                "n_parcels": ns.n_parcels,
                "points": ns.points,
            }
        ),
        flush=True,
    )

    args = [
        "--mode", ns.mode,
        "--subsample_size", str(ns.subsample_size),
        "--batch_size", str(ns.batch_size),
        "--las_plots_folder_path", f"{root}/placettes_dataset/las_classes",
        "--gt_file_path", f"{root}/placettes_dataset/placettes_metadata.csv",
        "--corrected_gt_file_path",
        f"{root}/placettes_dataset/placettes_metadata.csv",
        "--plots_pickled_dataset_path",
        f"{root}/placettes_dataset/prepared/plots.pkl",
        "--las_parcels_folder_path", f"{root}/parcelles_dataset_20m",
        "--parcel_shapefile_path",
        f"{root}/parcelles_dataset_20m/input/parcels.shp",
        "--experiments_path", f"{root}/experiments",
        "--min_points_for_pseudo_labelling", str(min_pl),
    ]
    if ns.epochs:
        args += ["--n_epoch", str(ns.epochs)]
    if ns.folds:
        args += ["--folds", str(ns.folds)]

    cold_path, t_cold = stage("cold_crossval", lambda: cli_main.main(args))
    model_id = os.path.basename(os.path.normpath(cold_path))
    cold_mae = last_val_mae(cold_path)
    print(
        json.dumps({"stage": "cold_result", "model_id": model_id,
                    "val_MAE": round(cold_mae, 4)}),
        flush=True,
    )

    _, t_prep = stage("prepare", lambda: cli_prepare.main(args))
    _, t_pl = stage(
        "pseudo_label",
        lambda: cli_predict.main(
            args + ["--task", "pseudo_labelling",
                    "--inference_model_id", model_id]
        ),
    )

    ssl_args = args + ["--inference_model_id", model_id]
    if ns.ssl_epochs:
        ssl_args += ["--n_epoch", str(ns.ssl_epochs)]
    pt_path, t_ssl = stage("ssl_pretrain", lambda: cli_ssl.main(ssl_args))
    pt_id = os.path.basename(os.path.normpath(pt_path))

    warm_path, t_warm = stage(
        "warm_crossval", lambda: cli_main.main(args + ["--PT_model_id", pt_id])
    )
    warm_mae = last_val_mae(warm_path)

    print(
        json.dumps(
            {
                "stage": "summary",
                "mode": ns.mode,
                "cold_val_MAE": round(cold_mae, 4),
                "warm_val_MAE": round(warm_mae, 4),
                "warm_minus_cold": round(warm_mae - cold_mae, 4),
                "wall_s": {
                    "cold_crossval": round(t_cold, 1),
                    "prepare": round(t_prep, 1),
                    "pseudo_label": round(t_pl, 1),
                    "ssl_pretrain": round(t_ssl, 1),
                    "warm_crossval": round(t_warm, 1),
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
