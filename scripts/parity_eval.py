"""Coverage-MAE parity evaluation of a *reference* PyTorch checkpoint.

Given an archived reference checkpoint (PCC_model_*.pt from
IGNF/StrataNet2-Vegetation-Coverage-Maps) plus plot LAS files and the GT
CSV, imports the weights (utils/torch_import.py), runs this framework's
evaluation pipeline, and prints per-stratum MAE + the indicator families —
the BASELINE.json parity check, runnable as soon as the archived data is
available.

Usage:
  python scripts/parity_eval.py --checkpoint PCC_model_full.pt \
      --las_plots_folder_path .../las_classes --gt_file_path .../metadata.csv
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    import numpy as np
    import pandas as pd

    from argparse import ArgumentParser

    from stratanet2_tpu.config import parse_config
    from stratanet2_tpu.data.dataset import prepare_and_save_plots_dataset
    from stratanet2_tpu.learning import metrics as M
    from stratanet2_tpu.learning.evaluate import evaluate
    from stratanet2_tpu.learning.kde import fit_kde_mixture_from_dataset
    from stratanet2_tpu.learning.train import make_eval_step
    from stratanet2_tpu.utils.experiment import MetricSink, setup_experiment_folder, create_logger
    from stratanet2_tpu.utils.torch_import import load_reference_checkpoint

    ap = ArgumentParser(add_help=False)
    ap.add_argument("--checkpoint", required=True)
    ns, rest = ap.parse_known_args(argv)
    cfg, _ = parse_config(argv)

    stats_path = setup_experiment_folder(cfg.experiments_path, "parity_eval", cfg.mode)
    logger = create_logger(stats_path)
    sink = MetricSink(stats_path)

    dataset = prepare_and_save_plots_dataset(cfg, cfg.data.corrected_gt_file_path)
    logger.info("Evaluating reference checkpoint on %d plots", len(dataset))
    model = load_reference_checkpoint(ns.checkpoint, cfg.model)
    kde = fit_kde_mixture_from_dataset(dataset)
    eval_step = make_eval_step(cfg, kde)

    ids = sorted(dataset.keys())
    means, summaries = evaluate(
        model, dataset, np.array(ids), cfg, kde, eval_step, stats_path, sink,
        fold_id=-1, epoch=0, last_epoch=True,
    )
    df = pd.DataFrame(summaries)
    df = M.calculate_performance_indicators_v1(df)
    try:
        df = M.calculate_performance_indicators_v2(df)
        df = M.calculate_performance_indicators_v3(df)
    except KeyError:
        logger.info("continuous GT: class indicators skipped")
    out_csv = os.path.join(stats_path, "parity_eval.csv")
    df.to_csv(out_csv, index=False)

    print("\n=== reference-checkpoint parity evaluation ===")
    for key in ("MAE_veg_b", "MAE_veg_moy", "MAE_veg_h", "MAE_loss", "total_loss"):
        print(f"{key:14s} {means[key]:.4f}")
    for col in ("error_all", "acc_all", "error2_all", "acc2_all"):
        if col in df:
            print(f"{col:14s} {df[col].mean():.4f}")
    print(f"per-plot results: {out_csv}")


if __name__ == "__main__":
    main(sys.argv[1:])
