"""Full reference training schedule at PROD geometry on the TPU.

VERDICT r2 next-round item 3: run the REAL workload — 300 epochs x >= 2
folds at batch 20 x 10000 points (reference learning/train.py:82-177,
config.py:88-97) — on a synthetic dataset of reference scale, early
stopping enabled, with a forced SIGTERM crash + resume mid-schedule to prove the
crash-recovery path on hardware. Records per-epoch wall clock, sustained
train points/sec/chip, and final val MAE vs the predict-the-mean baseline.

Usage:
  # everything (data + fold 1 with kill/resume + fold 2 + summary):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/prod_schedule_run.py \
      --orchestrate --root /tmp/prod_run

  # single fold (what the orchestrator spawns):
  ... prod_schedule_run.py --root /tmp/prod_run --fold 1 [--resume]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import signal
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

# PROD-scale defaults; env knobs let the ORCHESTRATION (spawn -> poll ->
# SIGTERM -> resume) be smoke-tested on CPU at tiny scale before burning
# TPU time (tests/test_schedule_orchestration.py)
N_PLOTS = int(os.environ.get("STRATANET2_SCHED_PLOTS", 110))
POINTS = int(os.environ.get("STRATANET2_SCHED_POINTS", 12000))
_BATCH = int(os.environ.get("STRATANET2_SCHED_BATCH", 0))  # 0 = cfg default
_SUBSAMPLE = int(os.environ.get("STRATANET2_SCHED_SUBSAMPLE", 0))
_KILL_AFTER = int(os.environ.get("STRATANET2_SCHED_KILL_AFTER", 0))


def build_dataset(root: str) -> str:
    from learnability_check import make_learnable_plot

    path = os.path.join(root, "plots.pkl")
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(7)
    dataset = {}
    for i in range(N_PLOTS):
        cloud, gt = make_learnable_plot(rng, n=POINTS, center=(100.0 * i, 0.0))
        pid = f"P{i:03d}"
        dataset[pid] = {
            "cloud": cloud.astype(np.float32),
            "coverages": gt,
            "plot_center": np.array([100.0 * i, 0.0], np.float32),
            "plot_id": pid,
            "N_points_in_cloud": cloud.shape[1],
            "index": i,
        }
    os.makedirs(root, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(dataset, f)
    return path


def run_fold(
    root: str, fold: int, resume: bool, n_epoch: int,
    transfer_dtype: str = "float32",
    device_resident: str = "auto",
) -> None:
    from dataclasses import replace

    from stratanet2_tpu.utils.experiment import enable_compilation_cache

    enable_compilation_cache()

    from stratanet2_tpu.config import Config
    from stratanet2_tpu.learning.kde import fit_kde_mixture_from_dataset
    from stratanet2_tpu.learning.train import train_full
    from stratanet2_tpu.utils.experiment import MetricSink

    with open(os.path.join(root, "plots.pkl"), "rb") as f:
        dataset = pickle.load(f)

    cfg = Config()  # PROD geometry: 10000 pts, batch 20, 300 epochs
    cfg = replace(
        cfg,
        train=replace(cfg.train, n_epoch=n_epoch, use_early_stopping=True),
        data=replace(
            cfg.data,
            transfer_dtype=transfer_dtype,
            device_resident=device_resident,
        ),
    )
    if _BATCH:
        cfg = replace(cfg, train=replace(cfg.train, batch_size=_BATCH))
    if _SUBSAMPLE:
        cfg = replace(cfg, model=replace(cfg.model, subsample_size=_SUBSAMPLE))
    kde = fit_kde_mixture_from_dataset(dataset)
    ids = np.array(sorted(dataset.keys()))
    # KFold(5)-style split for this fold
    n_val = len(ids) // 5
    lo, hi = (fold - 1) * n_val, fold * n_val
    val_ids, train_ids = ids[lo:hi], np.concatenate([ids[:lo], ids[hi:]])

    stats = os.path.join(root, f"fold{fold}")
    os.makedirs(stats, exist_ok=True)
    sink = MetricSink(stats)
    t0 = time.time()
    _, train_losses, test_losses, _ = train_full(
        dataset, train_ids, val_ids, cfg, kde, stats, sink,
        fold_id=fold, resume=resume,
    )
    wall = time.time() - t0
    gts = np.array([[dataset[i]["coverages"][j] for j in (0, 2, 3)] for i in val_ids])
    baseline = float(np.abs(gts - gts.mean()).mean())
    b = cfg.train.batch_size
    n = cfg.model.subsample_size
    steps = len(train_ids) // b
    epoch_secs = [t["epoch_seconds"] for t in train_losses]
    summary = {
        "fold": fold,
        "resumed": resume,
        "epochs_run": len(train_losses),
        "wall_seconds": wall,
        "median_epoch_seconds": float(np.median(epoch_secs)),
        "train_points_per_sec": b * n * steps / float(np.median(epoch_secs)),
        "final_val_MAE": float(test_losses[-1]["MAE_loss"]) if test_losses else None,
        "mean_baseline_MAE": baseline,
        "first_train_MAE": float(train_losses[0]["MAE_loss"]),
        "last_train_MAE": float(train_losses[-1]["MAE_loss"]),
    }
    mode = "a" if resume else "w"
    with open(os.path.join(root, f"fold{fold}_summary.json"), mode) as f:
        f.write(json.dumps(summary) + "\n")
    print("FOLD_SUMMARY " + json.dumps(summary), flush=True)


def _wait_for_epoch(metrics_path: str, epoch: int, proc, timeout: float):
    """Poll the metric sink until `epoch` appears (or the child exits)."""
    t0 = time.time()
    while time.time() - t0 < timeout:
        if proc.poll() is not None:
            return False
        try:
            with open(metrics_path) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        continue  # torn final line racing the child's append
                    if rec.get("epoch", 0) >= epoch and "epoch_seconds" in rec.get("metrics", rec):
                        return True
        except FileNotFoundError:
            pass
        time.sleep(5)
    return False


def orchestrate(root: str, n_epoch: int) -> None:
    build_dataset(root)
    env = dict(os.environ)
    me = os.path.abspath(__file__)

    def spawn(fold, resume=False):
        args = [sys.executable, me, "--root", root, "--fold", str(fold),
                "--n_epoch", str(n_epoch)]
        if resume:
            args.append("--resume")
        return subprocess.Popen(args, env=env)

    # fold 1: kill mid-schedule once a resume checkpoint exists, resume.
    # SIGTERM, not SIGKILL: killing a client mid-TPU-RPC can take down the
    # axon stdio relay with it, and the relay cannot be restarted from
    # inside the VM (CLAUDE.md; it died exactly this way in round 3).
    # Python's default SIGTERM disposition still dies without running
    # atexit/finally cleanup, so the resume path is exercised as a crash.
    # past >=2 eval/checkpoint epochs (env-overridable for tiny smoke runs)
    kill_after = _KILL_AFTER or max(2 * 10 + 5, n_epoch // 6)
    p = spawn(1)
    got = _wait_for_epoch(
        os.path.join(root, "fold1", "metrics.jsonl"), kill_after, p,
        timeout=3600 * 3,
    )
    if got:
        print(f"KILLING fold-1 run (pid {p.pid}) past epoch {kill_after}", flush=True)
        p.send_signal(signal.SIGTERM)
        p.wait()
        rc = spawn(1, resume=True).wait()
        print(f"fold 1 resumed run exit code {rc}", flush=True)
    else:
        p.wait()
        print("fold 1 finished before the kill point (no resume exercised)", flush=True)

    rc2 = spawn(2).wait()
    print(f"fold 2 exit code {rc2}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--fold", type=int)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--orchestrate", action="store_true")
    ap.add_argument("--n_epoch", type=int, default=300)
    ap.add_argument("--transfer_dtype", default="float32",
                    choices=["float32", "float16"])
    ap.add_argument("--device_resident", nargs="?", const="true",
                    choices=["auto", "true", "false"], default="auto",
                    help="HBM-resident dataset + one-program epochs "
                    "(data/device_dataset.py); default auto")
    ns = ap.parse_args()
    if ns.orchestrate:
        orchestrate(ns.root, ns.n_epoch)
    else:
        assert ns.fold, "--fold required without --orchestrate"
        build_dataset(ns.root)
        run_fold(ns.root, ns.fold, ns.resume, ns.n_epoch, ns.transfer_dtype,
                 ns.device_resident)


if __name__ == "__main__":
    main()
