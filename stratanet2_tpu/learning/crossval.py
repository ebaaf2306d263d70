"""Cross-validated training driver (reference main.py:61-137) and the
post-cross-validation analytics (learning/accuracy.py:335-509)."""

from __future__ import annotations

import logging
import os
from typing import Dict, List

import pandas as pd
from sklearn.model_selection import KFold

from stratanet2_tpu.config import Config
from stratanet2_tpu.data.dataset import (
    get_index_sorted_plot_ids,
    get_plot_ground_truth_coverages,
    load_ground_truths_dataframe,
)
from stratanet2_tpu.learning import metrics as M
from stratanet2_tpu.learning.kde import KdeMixture
from stratanet2_tpu.learning.train import train_full

logger = logging.getLogger("stratanet2_tpu")


def cross_validate(
    dataset: Dict,
    cfg: Config,
    kde: KdeMixture,
    stats_path: str,
    sink,
    pretrained_path: str = None,
    mesh=None,
    point_sharded: bool = False,
) -> pd.DataFrame:
    """KFold(folds, seed=42, shuffle) cross-validation (main.py:66-99), then
    two analytics passes: with class-center-snapped GT (main.py:102-117) and
    with the original GT (main.py:120-137)."""
    plot_ids = get_index_sorted_plot_ids(dataset)
    kf = KFold(n_splits=cfg.train.folds, random_state=42, shuffle=True)

    all_train, all_test = [], []
    cloud_info_by_fold: Dict[int, List[Dict]] = {}
    for fold_id, (train_idx, val_idx) in enumerate(kf.split(plot_ids), start=1):
        logger.info("Cross-validation FOLD = %d", fold_id)
        sink.log_metric("Fold_ID", fold_id)
        _, train_losses, test_losses, cloud_infos = train_full(
            dataset, plot_ids[train_idx], plot_ids[val_idx],
            cfg, kde, stats_path, sink, fold_id=fold_id,
            pretrained_path=pretrained_path, mesh=mesh, seed=cfg.train.seed,
            point_sharded=point_sharded,
        )
        log_last_stats_of_fold(train_losses, test_losses, fold_id)
        all_train.append(train_losses)
        all_test.append(test_losses)
        cloud_info_by_fold[fold_id] = cloud_infos
        if cfg.mode == "DEV" and fold_id >= 1:
            break

    stats_for_all_folds(all_train, all_test, sink)

    # pass 1: relabeled GT (snap to class centers)
    for infos in cloud_info_by_fold.values():
        for info in infos:
            for key in ("vt_veg_b", "vt_sol_nu", "vt_veg_moy", "vt_veg_h"):
                info[key] = float(M.closest_class_center(info[key]))
    df_rel = post_cross_validation_logging(
        "relabeled_summary", cloud_info_by_fold, cfg, stats_path, sink
    )

    # pass 2: original GT from the uncorrected file (main.py:120-129)
    try:
        gts = load_ground_truths_dataframe(cfg.data.gt_file_path)
        for infos in cloud_info_by_fold.values():
            for info in infos:
                cov = get_plot_ground_truth_coverages(gts, info["pl_id"])
                (
                    info["vt_veg_b"], info["vt_sol_nu"],
                    info["vt_veg_moy"], info["vt_veg_h"],
                ) = [float(c) for c in cov]
        post_cross_validation_logging(
            "summary", cloud_info_by_fold, cfg, stats_path, sink
        )
    except (FileNotFoundError, KeyError, ValueError, TypeError) as err:
        # a plot missing from (empty coverages -> unpack ValueError) or
        # duplicated in (TypeError) the uncorrected GT file must skip this
        # analytics pass, not kill the run after all folds trained
        logger.warning("original-GT summary skipped: %s", err)
    return df_rel


def stats_for_all_folds(all_train: List[List[Dict]], all_test: List[List[Dict]], sink):
    """Per-step means across folds (accuracy.py:335-394)."""
    for name, lists in (("train_mean", all_train), ("val_mean", all_test)):
        rows = [d for fold in lists for d in fold]
        if not rows:
            continue
        df = pd.DataFrame(rows).groupby("step").mean()
        with sink.context(name):
            for step, metrics in df.to_dict("index").items():
                sink.log_metrics(metrics, epoch=int(metrics.get("epoch", 0)), step=int(step))
        last = df[df.index == df.index.max()].to_dict("records")[0]
        logger.info(
            "MEAN - %s Loss: %1.2f Loss Abs (MAE): %1.2f Loss Log: %1.2f",
            name, last["total_loss"], last["MAE_loss"], last["log_loss"],
        )


def log_last_stats_of_fold(train_losses, test_losses, fold_id: int):
    """(accuracy.py:398-430)"""
    for task, losses in (("Train", train_losses), ("Test", test_losses)):
        if not losses:
            continue
        last = max(losses, key=lambda d: d["epoch"])
        logger.info(
            "Fold %3d %s Loss: %1.2f Loss Abs (MAE): %1.2f Loss Log: %1.2f",
            fold_id, task, last["total_loss"], last["MAE_loss"], last["log_loss"],
        )


def post_cross_validation_logging(
    summary_context_name: str,
    cloud_info_by_fold: Dict[int, List[Dict]],
    cfg: Config,
    stats_path: str,
    sink,
) -> pd.DataFrame:
    """Indicator computation, CSV export and confusion matrices over all
    cross-validated predictions (accuracy.py:463-509)."""
    rows = [
        dict(info, fold_id=fold_id)
        for fold_id, infos in cloud_info_by_fold.items()
        for info in infos
    ]
    df = pd.DataFrame(rows)
    try:
        df = M.calculate_performance_indicators_v1(df)
        df = M.calculate_performance_indicators_v2(df)
        df = M.calculate_performance_indicators_v3(df)
    except KeyError:
        logger.info(
            "Cannot calculate class-based performance indicators due to "
            "continuous ground truths."
        )

    csv_path = os.path.join(
        stats_path, f"PCC_inference_all_placettes_{summary_context_name}.csv"
    )
    df.to_csv(csv_path, index=False)
    logger.info("Saved inferred, cross-validated results to %s", csv_path)

    with sink.context(summary_context_name):
        sink.log_metrics(df.mean(numeric_only=True).to_dict())
        sink.log_table(csv_path)
        cm_dir = os.path.join(stats_path, "img", "confusion_matrices", summary_context_name)
        for normalize in ("true", "all", "pred"):
            try:
                M.log_confusion_matrices(df, cm_dir, normalize=normalize)
            except Exception as err:
                logger.warning("confusion matrices (%s) failed: %s", normalize, err)

    if "acc2_veg_b" in df:
        with sink.context(summary_context_name + "_with_margin"):
            df_margin = M.adjust_predictions_based_on_margin(df)
            cm_dir = os.path.join(
                stats_path, "img", "confusion_matrices", summary_context_name + "_margin"
            )
            for normalize in ("true", "all", "pred"):
                try:
                    M.log_confusion_matrices(
                        df_margin, cm_dir, normalize=normalize, name_prefix="confusion_10pp"
                    )
                except Exception as err:
                    logger.warning("margin confusion matrices failed: %s", err)
    return df
