"""Capped-K TRAINING parity study (VERDICT r3 item 6).

docs/PARITY.md quantifies the fixed-K neighbor cap's effect on the FORWARD
(mean |Δcoverage| 0.0066 at PROD caps). This script quantifies its effect
on TRAINING:

1. gradient study — at shared weights and identical batches, parameter
   gradients of the full train loss (projection + 3-term loss) under
   PROD-ratio caps vs generous caps (K >= in-ball neighbor count, the
   exact regime the oracle-parity tests run in): per-tensor and overall
   cosine similarity + norm ratio.
2. training study — two short `train_full` runs on the geometry-derived
   synthetic learnability dataset (scripts/learnability_check.py), capped
   vs generous K, same data/seed: final val MAE of each.

Cap scaling: the PROD cap keeps ~16% of the expected r1-ball (k1=32 of
~200 in-ball points at N=10000 over the 10 m disk) and ~32% of the
r2-ball. At the CPU-feasible geometries used here the caps are scaled to
the same fractions, so the measured deviation is representative of PROD.
(Reference cap for comparison: 2000 neighbors, model/point_net2.py:24 —
effectively uncapped at these densities.)

Usage: python scripts/cap_train_study.py [--grad_only|--train_only]
Writes one JSON line per measurement; paste the summary into docs/PARITY.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from dataclasses import replace

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from stratanet2_tpu.utils.backendprobe import honor_platform_env  # noqa: E402

honor_platform_env()


def tree_cosine(a, b):
    import jax

    fa = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(a)])
    fb = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(b)])
    return float(fa @ fb / (np.linalg.norm(fa) * np.linalg.norm(fb) + 1e-30))


def _learnable_batch(rng, b, n):
    """b learnable plots (geometry-derived GT) at n points each, in the
    (cloud, xyz, gt) layout the train loss consumes."""
    from learnability_check import make_learnable_plot

    clouds, gts = [], []
    for i in range(b):
        cloud, gt = make_learnable_plot(rng, n=int(n * 1.3), center=(0.0, 0.0))
        sel = rng.choice(cloud.shape[1], n, replace=cloud.shape[1] < n)
        clouds.append(cloud[:, sel])
        gts.append(gt)
    return clouds, gts


def grad_study(ns):
    """Gradient cosine capped-vs-generous at TRUE PROD caps (k1=32, k2=64,
    N = ns.n) on learnable plots, measured BOTH at random init and at
    weights pre-trained for a few epochs with the GENEROUS config (the
    trained-weights number is the representative one: gradients at random
    init on a chaotic loss surface decorrelate under any perturbation)."""
    import jax
    import jax.numpy as jnp

    from stratanet2_tpu.config import Config
    from stratanet2_tpu.data.loader import PlotLoader
    from stratanet2_tpu.learning.kde import fit_kde_mixture
    from stratanet2_tpu.learning.losses import total_loss
    from stratanet2_tpu.models import (
        PointNet2Params,
        init_pointnet2,
        pointnet2_forward,
    )
    from stratanet2_tpu.ops import plotwise_coverages

    n = ns.n
    base = replace(
        Config().model, subsample_size=n, use_pallas=False, knn_chunk=512
    )
    # true PROD caps vs generous (>= in-ball count): E[|r1-ball|] =
    # N * r1^2 / R^2 = 0.02 N (= 200 at N=10000), E[|r2-ball|] = 0.08 C1
    capped = replace(base, k1=32, k2=64)
    exact = replace(
        base,
        k1=min(512, n // 8),
        k2=min(256, base.n_centroids1 // 4),
    )

    kde = fit_kde_mixture(np.random.default_rng(0).uniform(0, 20, 5000))
    grid, pdfs = jnp.asarray(kde.grid), jnp.asarray(kde.pdfs)
    cfg = Config()
    m_w, e_w = cfg.train.m, cfg.train.e

    def grads_for(mcfg, params, state, cloud, xyz, gt, rng):
        def loss_fn(params):
            cov, proba, _ = pointnet2_forward(
                PointNet2Params(params, state),
                cloud[..., 2:], xyz, mcfg, train=True, rng=rng,
            )
            pred_pl = plotwise_coverages(cov, cloud[..., :2], mcfg.diam_pix)
            z_m = cloud[..., 2] * mcfg.z_max
            loss, _ = total_loss(pred_pl, gt, proba, z_m, grid, pdfs, m_w, e_w)
            return loss

        return jax.jit(jax.grad(loss_fn))(params)

    # data: learnable plots through the real loader transforms
    rng = np.random.default_rng(7)
    raw, gts = _learnable_batch(rng, ns.batch * ns.seeds, n)
    dataset = {
        f"G{i:03d}": {
            "cloud": c, "coverages": g,
            "plot_center": np.zeros(2, np.float32), "plot_id": f"G{i:03d}",
            "N_points_in_cloud": c.shape[1], "index": i,
        }
        for i, (c, g) in enumerate(zip(raw, gts))
    }
    loader_cfg = replace(
        cfg, model=capped, train=replace(cfg.train, batch_size=ns.batch)
    )
    batches = list(PlotLoader(dataset, loader_cfg, train=False))

    # weights: init, and generous-config pre-trained (geometry-independent
    # shared MLPs -> the same params evaluate under either cap)
    weight_sets = {"init": init_pointnet2(jax.random.PRNGKey(0), base)}
    if not ns.skip_pretrain:
        weight_sets["trained"] = _pretrain_generous(ns, dataset, kde)

    for wname, model in weight_sets.items():
        coss, normr = [], []
        for i, batch in enumerate(batches[: ns.seeds]):
            cloud = jnp.asarray(batch["cloud"], jnp.float32)
            xyz = jnp.asarray(batch["xyz"], jnp.float32)
            gt = jnp.asarray(
                np.stack([dataset[p]["coverages"] for p in batch["plot_id"]]),
                jnp.float32,
            )
            key = jax.random.PRNGKey(100 + i)
            g_cap = grads_for(capped, model.params, model.state, cloud, xyz, gt, key)
            g_ex = grads_for(exact, model.params, model.state, cloud, xyz, gt, key)
            cos = tree_cosine(g_cap, g_ex)
            nc = np.sqrt(sum(float((x**2).sum()) for x in jax.tree_util.tree_leaves(g_cap)))
            ne = np.sqrt(sum(float((x**2).sum()) for x in jax.tree_util.tree_leaves(g_ex)))
            coss.append(cos)
            normr.append(nc / ne)
            print(
                json.dumps(
                    {
                        "study": "grad", "weights": wname, "batch": i, "n": n,
                        "capped_k": [capped.k1, capped.k2],
                        "exact_k": [exact.k1, exact.k2],
                        "cosine": round(cos, 4),
                        "grad_norm_ratio": round(float(nc / ne), 4),
                    }
                ),
                flush=True,
            )
        print(
            json.dumps(
                {
                    "study": "grad_summary", "weights": wname,
                    "batches": len(coss),
                    "cosine_mean": round(float(np.mean(coss)), 4),
                    "cosine_min": round(float(np.min(coss)), 4),
                    "norm_ratio_mean": round(float(np.mean(normr)), 4),
                }
            ),
            flush=True,
        )


def _pretrain_generous(ns, dataset, kde):
    """A few generous-config epochs at a smaller N to get representative
    (non-init) weights; params are geometry-independent."""
    import tempfile

    from stratanet2_tpu.config import Config
    from stratanet2_tpu.learning.train import train_full
    from stratanet2_tpu.models import PointNet2Params
    from stratanet2_tpu.utils.experiment import MetricSink

    cfg = Config()
    cfg = replace(
        cfg,
        model=replace(
            cfg.model, subsample_size=ns.train_n, k1=128, k2=128,
            use_pallas=False,
        ),
        train=replace(
            cfg.train, n_epoch=ns.pretrain_epochs, n_epoch_test=1000,
            batch_size=min(8, len(dataset)),
        ),
    )
    ids = np.array(sorted(dataset.keys()))
    with tempfile.TemporaryDirectory() as td:
        sink = MetricSink(td)
        ts, _, _, _ = train_full(
            dataset, ids, ids[:2], cfg, kde, td, sink, fold_id=1, seed=0
        )
    return PointNet2Params(ts.params, ts.model_state)


def train_study(ns):
    import jax  # noqa: F401  (backend init before torch import chains)

    from learnability_check import make_learnable_plot

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
            "cloud": cloud, "coverages": gt,
            "plot_center": np.array([100.0 * i, 0.0], np.float32),
            "plot_id": pid, "N_points_in_cloud": cloud.shape[1], "index": i,
        }
    kde = fit_kde_mixture_from_dataset(dataset)
    ids = np.array(sorted(dataset.keys()))
    n_val = ns.n_plots // 5

    n = ns.train_n
    results = {}
    for name, (k1, k2) in {
        "capped": (max(4, int(n * 0.02 * 0.16) // 4 * 4), 16),
        "generous": (128, 128),
    }.items():
        cfg = Config()
        cfg = replace(
            cfg,
            model=replace(
                cfg.model, subsample_size=n, k1=k1, k2=k2, use_pallas=False
            ),
            train=replace(
                cfg.train, n_epoch=ns.epochs,
                n_epoch_test=max(ns.epochs // 4, 1), batch_size=8,
            ),
        )
        with tempfile.TemporaryDirectory() as td:
            sink = MetricSink(td)
            _, train_losses, test_losses, _ = train_full(
                dataset, ids[n_val:], ids[:n_val], cfg, kde, td, sink,
                fold_id=1, seed=ns.seed,
            )
        results[name] = {
            "k": [k1, k2],
            "val_MAE": round(float(test_losses[-1]["MAE_loss"]), 4),
            "train_MAE_last": round(float(train_losses[-1]["MAE_loss"]), 4),
        }
        print(json.dumps({"study": "train", "config": name, **results[name]}), flush=True)
    print(
        json.dumps(
            {
                "study": "train_summary",
                "epochs": ns.epochs,
                "n_plots": ns.n_plots,
                "delta_val_MAE": round(
                    results["capped"]["val_MAE"] - results["generous"]["val_MAE"], 4
                ),
            }
        ),
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10000, help="grad-study points (PROD)")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--n_plots", type=int, default=40)
    ap.add_argument("--train_n", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pretrain_epochs", type=int, default=12)
    ap.add_argument("--skip_pretrain", action="store_true")
    ap.add_argument("--grad_only", action="store_true")
    ap.add_argument("--train_only", action="store_true")
    ns = ap.parse_args()
    if not ns.train_only:
        grad_study(ns)
    if not ns.grad_only:
        train_study(ns)


if __name__ == "__main__":
    main()
