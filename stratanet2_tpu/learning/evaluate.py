"""Evaluation loop (reference learning/test.py:25-132).

Runs the jitted eval step over ordered batches (padding-aware), aggregates
per-plot losses, builds the per-plot prediction summary rows consumed by
cross-validation analytics, and triggers interpretation figures and
confusion matrices on the reference's schedule.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from stratanet2_tpu.config import Config
from stratanet2_tpu.data.loader import PlotLoader
from stratanet2_tpu.learning import metrics as M
from stratanet2_tpu.learning.kde import KdeMixture

logger = logging.getLogger("stratanet2_tpu")

LOSS_KEYS = ("total_loss", "MAE_loss", "log_loss", "MAE_veg_b", "MAE_veg_moy", "MAE_veg_h")


def get_cloud_prediction_summary(
    plot_name: str, pred_pl: np.ndarray, gt: np.ndarray, n_points: int
) -> Dict:
    """Per-plot summary row (learning/test.py:135-149)."""
    return {
        "pl_id": plot_name,
        "pl_N_points": n_points,
        "pred_veg_b": float(pred_pl[0]),
        "pred_sol_nu": float(pred_pl[1]),
        "pred_veg_moy": float(pred_pl[2]),
        "pred_veg_h": float(pred_pl[3]),
        "vt_veg_b": float(gt[0]),
        "vt_sol_nu": float(gt[1]),
        "vt_veg_moy": float(gt[2]),
        "vt_veg_h": float(gt[3]),
    }


def evaluate(
    model,
    dataset: Dict,
    val_ids,
    cfg: Config,
    kde: KdeMixture,
    eval_step,
    stats_path: str,
    sink,
    fold_id: int = 0,
    epoch: int = 0,
    last_epoch: bool = False,
    device_eval=None,
) -> Tuple[Dict[str, float], List[Dict]]:
    sums = {k: 0.0 for k in LOSS_KEYS}
    n = 0
    summaries: List[Dict] = []
    embeddings: List[np.ndarray] = []
    embedding_names: List[str] = []

    # Device-resident fast path (data/device_dataset.make_device_eval): the
    # whole val pass is one device program over the HBM-resident val set —
    # one index table up, per-plot (pred_pl, losses) down in a single fetch.
    # Only figure-free evals qualify: the last epoch draws per-plot
    # interpretation figures (and embeddings) from per-point tensors the
    # fast path deliberately does not return. Tracked plots
    # (cfg.plot_name_to_visualize_during_training) get a figure EVERY eval
    # (reference learning/test.py:81-91) — but only if one is actually in
    # THIS fold's val set; gating on the mere existence of the config tuple
    # made the fast path unreachable in every real configuration (the
    # default names are IGN field plots absent from most datasets).
    tracked_in_fold = any(
        pid in cfg.plot_name_to_visualize_during_training for pid in val_ids
    )
    use_fast = device_eval is not None and not last_epoch and not tracked_in_fold
    if use_fast:
        from stratanet2_tpu.data.device_dataset import eval_index_table

        run, dd_val = device_eval
        idx, valid_mask = eval_index_table(
            len(dd_val.plot_ids), cfg.train.batch_size
        )
        # fixed key per fold: every eval epoch subsamples identically, so
        # the early-stopping signal carries no selection noise
        preds, comps = run(
            model, dd_val.feats, dd_val.xyz, dd_val.n, dd_val.coverages,
            jnp.asarray(idx), jax.random.PRNGKey(fold_id),
        )
        preds = np.asarray(jax.device_get(preds)).reshape(-1, 4)
        comps = {
            k: np.asarray(v).reshape(-1)
            for k, v in jax.device_get(comps).items()
        }
        for j in np.flatnonzero(valid_mask):
            pid = dd_val.plot_ids[j]
            for k in LOSS_KEYS:
                sums[k] += float(comps[k][j])
            n += 1
            cd = dataset[pid]
            summaries.append(
                get_cloud_prediction_summary(
                    pid,
                    preds[j],
                    np.asarray(cd["coverages"]),
                    # optional key, same fallback as the host loader
                    # (transforms.load_cloud_item)
                    int(cd.get("N_points_in_cloud", cd["cloud"].shape[1])),
                )
            )
        return _finalize_evaluate(
            cfg, sums, n, summaries, embeddings, embedding_names,
            stats_path, sink, fold_id, epoch, last_epoch,
        )

    loader = PlotLoader(dataset, cfg, plot_ids=val_ids, train=False)

    # Pipeline dispatch ahead of fetch (same idea as inference/predict.py):
    # a per-batch device_get serializes every host->device upload with the
    # compute through the relay. The in-flight window is BOUNDED (advisor
    # r3: unbounded dispatch-all holds every batch's host arrays + device
    # outputs — aux carries per-POINT tensors, so a few hundred val batches
    # would accumulate GBs of HBM). The pop-when-exceeded loop keeps up to
    # window + 1 batches in flight — enough to hide the relay latency while
    # bounding live memory.
    window = 4

    def _drain(pending_item):
        nonlocal n
        batch, (pred_pl, cov, proba, comps, aux, g) = pending_item
        if cfg.log_embeddings and last_epoch:
            g = np.asarray(jax.device_get(g))
            for i in np.where(batch["valid"])[0]:
                embeddings.append(g[i])
                embedding_names.append(batch["plot_id"][i])
        pred_pl = np.asarray(jax.device_get(pred_pl))
        comps = jax.device_get(comps)
        valid = batch["valid"]
        for i in np.where(valid)[0]:
            for k in LOSS_KEYS:
                sums[k] += float(np.asarray(comps[k])[i])
            n += 1
            plot_name = batch["plot_id"][i]
            summaries.append(
                get_cloud_prediction_summary(
                    plot_name,
                    pred_pl[i],
                    batch["coverages"][i],
                    int(batch["N_points_in_cloud"][i]),
                )
            )
            if last_epoch or plot_name in cfg.plot_name_to_visualize_during_training:
                _maybe_visualize(
                    batch, i, pred_pl[i], cov, aux, cfg, stats_path, fold_id
                )

    pending: List = []
    for batch in loader:
        outs = eval_step(
            model,
            jnp.asarray(batch["cloud"]),
            jnp.asarray(batch["xyz"]),
            jnp.asarray(batch["coverages"]),
        )
        pending.append((batch, outs))
        if len(pending) > window:
            _drain(pending.pop(0))
    for item in pending:
        _drain(item)

    return _finalize_evaluate(
        cfg, sums, n, summaries, embeddings, embedding_names,
        stats_path, sink, fold_id, epoch, last_epoch,
    )


def _finalize_evaluate(
    cfg, sums, n, summaries, embeddings, embedding_names,
    stats_path, sink, fold_id, epoch, last_epoch,
) -> Tuple[Dict[str, float], List[Dict]]:
    """Shared tail of evaluate(): means, embedding exports, histograms and
    confusion matrices — identical for the host-loader and device-resident
    paths."""
    means = {k: sums[k] / max(n, 1) for k in LOSS_KEYS}

    if embeddings:
        # global SA3 feature per plot (reference `last_G_tensor`, logged to
        # the Comet embedding projector at learning/test.py:152-163)
        emb_path = os.path.join(stats_path, f"embeddings_fold_{fold_id}.npz")
        emb = np.stack(embeddings)
        np.savez(emb_path, embeddings=emb, plot_ids=np.array(embedding_names))
        sink.log_metrics({"embeddings": emb_path})
        # viewer-consumable form: TensorBoard projector TSVs (the reference
        # pushed these vectors to the Comet projector, learning/test.py:152-163)
        from stratanet2_tpu.utils.tboard import write_projector_embedding

        write_projector_embedding(
            os.path.join(stats_path, "tb"),
            f"sa3_global_fold_{fold_id}",
            emb,
            embedding_names,
        )

    if last_epoch and summaries:
        log_mae_histograms(summaries, stats_path, sink, fold_id, epoch)

    freq = cfg.log_confusion_matrix_frequency
    if last_epoch or (freq > 0 and epoch % freq == 0):
        df = pd.DataFrame(summaries)
        out_dir = os.path.join(stats_path, "img", "confusion_matrices")
        try:
            M.log_confusion_matrices(
                df, out_dir, normalize=cfg.normalize_cm, fold_id=fold_id,
                epoch=epoch, qualified=True,
            )
        except Exception as err:  # figures must never kill training
            logger.warning("confusion matrix logging failed: %s", err)

    return means, summaries


def log_mae_histograms(
    summaries: List[Dict], stats_path: str, sink, fold_id: int, epoch: int
) -> None:
    """Per-stratum |pred - gt| histograms on the last eval epoch (reference
    learning/test.py:166-193, Comet log_histogram_3d): one PNG with the three
    distributions plus MetricSink records of the binned counts."""
    names = [
        ("val_MAE_veg_b", "pred_veg_b", "vt_veg_b"),
        ("val_MAE_veg_moy", "pred_veg_moy", "vt_veg_moy"),
        ("val_MAE_veg_h", "pred_veg_h", "vt_veg_h"),
    ]
    errors = {
        name: np.array([abs(s[p] - s[v]) for s in summaries])
        for name, p, v in names
    }
    hist_bins = np.linspace(0.0, 1.0, 21)  # fixed edges: comparable
    for name, err in errors.items():       # across folds + match the PNG
        # JSONL counts/bins + a tfevents HistogramProto (MetricSink routes
        # both; the reference sent Comet log_histogram_3d)
        sink.log_histogram(name, err, epoch=epoch, step=fold_id, bins=hist_bins)
        sink.log_metrics(
            {f"{name}_mean": float(err.mean())}, epoch=epoch, step=fold_id
        )
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(12, 3.5), sharey=True)
        for ax, (name, err) in zip(axes, errors.items()):
            ax.hist(err, bins=hist_bins, color="tab:green", edgecolor="black")
            ax.set_title(f"{name} (mean {err.mean():.3f})")
            ax.set_xlabel("|pred - gt|")
        axes[0].set_ylabel("plots")
        out_dir = os.path.join(stats_path, "img")
        os.makedirs(out_dir, exist_ok=True)
        out = os.path.join(out_dir, f"mae_histograms_fold_{fold_id}.png")
        fig.tight_layout()
        fig.savefig(out, dpi=120)
        plt.close(fig)
        sink.log_image(out)
    except Exception as err:  # figures must never kill training
        logger.warning("MAE histogram figure failed: %s", err)


def _maybe_visualize(batch, i, pred_pl, cov, aux, cfg, stats_path, fold_id):
    try:
        from stratanet2_tpu.utils.visualize import create_predictions_interpretations

        p_all, pdf_all = aux
        create_predictions_interpretations(
            pred_pl=pred_pl,
            gt=batch["coverages"][i],
            coverages_pointwise=np.asarray(cov[i]),
            cloud=batch["cloud"][i],
            p_all=np.asarray(p_all[i]),
            pdf_all=np.asarray(pdf_all[i]),
            plot_name=batch["plot_id"][i],
            plot_center=batch["plot_center"][i],
            cfg=cfg,
            stats_path=stats_path,
            fold_id=fold_id,
        )
    except Exception as err:  # pragma: no cover
        logger.warning("interpretation figure failed for %s: %s", batch["plot_id"][i], err)
