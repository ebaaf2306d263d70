"""Multi-seed learnability sweep (VERDICT r2 item 6).

Runs scripts/learnability_check.py for >=3 seeds x {grouped, nearest}
ball-query policies sequentially (one TPU chip), collects the
LEARNABILITY_SUMMARY lines, and prints mean +- std val MAE per policy so
the neighbor-policy choice in docs/PARITY.md is backed by more than one
sample.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/learnability_sweep.py \
      --epochs 150 --seeds 0 1 2 [--out /tmp/learnability_sweep.jsonl]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--n_plots", type=int, default=60)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument(
        "--fps_parts", type=int, nargs="+", default=None,
        help="sweep partitioned-FPS parts (VERDICT r4 item 3) instead of "
        "ball-query policies; e.g. --fps_parts 2 4 8",
    )
    ap.add_argument("--out", default="/tmp/learnability_sweep.jsonl")
    ns = ap.parse_args()

    me = os.path.dirname(os.path.abspath(__file__))
    if ns.fps_parts:
        variants = [("--fps_parts", str(p), f"parts={p}") for p in ns.fps_parts]
        key = "fps_parts"
    else:
        variants = [
            ("--ball_query_method", pol, pol) for pol in ("grouped", "nearest")
        ]
        key = "policy"
    records = []
    with open(ns.out, "a") as sink:
        for seed in ns.seeds:
            for flag, val, label in variants:
                cmd = [
                    sys.executable, os.path.join(me, "learnability_check.py"),
                    "--epochs", str(ns.epochs), "--n_plots", str(ns.n_plots),
                    "--seed", str(seed), flag, val,
                ]
                print(f"== seed {seed} {label} ==", flush=True)
                r = subprocess.run(cmd, capture_output=True, text=True)
                summary = None
                for line in r.stdout.splitlines():
                    if line.startswith("LEARNABILITY_SUMMARY "):
                        summary = json.loads(line.split(" ", 1)[1])
                if summary is None:
                    print(f"RUN FAILED (rc={r.returncode}):\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}",
                          flush=True)
                    continue
                summary["passed"] = r.returncode == 0
                records.append(summary)
                sink.write(json.dumps(summary) + "\n")
                sink.flush()
                print(json.dumps(summary), flush=True)

    import numpy as np

    groups = sorted({r[key] for r in records}, key=str)
    for gval in groups:
        maes = [r["val_MAE"] for r in records if r[key] == gval]
        base = [r["baseline_MAE"] for r in records if r[key] == gval]
        if maes:
            print(
                "SWEEP_SUMMARY "
                + json.dumps(
                    {
                        key: gval,
                        "n_runs": len(maes),
                        "val_MAE_mean": float(np.mean(maes)),
                        "val_MAE_std": float(np.std(maes)),
                        "baseline_MAE_mean": float(np.mean(base)),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
