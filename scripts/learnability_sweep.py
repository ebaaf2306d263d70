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
    ap.add_argument("--out", default="/tmp/learnability_sweep.jsonl")
    ns = ap.parse_args()

    me = os.path.dirname(os.path.abspath(__file__))
    records = []
    with open(ns.out, "a") as sink:
        for seed in ns.seeds:
            for policy in ("grouped", "nearest"):
                cmd = [
                    sys.executable, os.path.join(me, "learnability_check.py"),
                    "--epochs", str(ns.epochs), "--n_plots", str(ns.n_plots),
                    "--seed", str(seed), "--ball_query_method", policy,
                ]
                print(f"== seed {seed} policy {policy} ==", flush=True)
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

    for policy in ("grouped", "nearest"):
        maes = [r["val_MAE"] for r in records if r["policy"] == policy]
        base = [r["baseline_MAE"] for r in records if r["policy"] == policy]
        if maes:
            print(
                "SWEEP_SUMMARY "
                + json.dumps(
                    {
                        "policy": policy,
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
