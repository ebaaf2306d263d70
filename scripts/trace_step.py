"""In-step device-time profile of the PROD train step via jax.profiler.

Chained per-op micro-timings over-estimate small kernels (dispatch
overhead; CLAUDE.md) — this is the trusted view: run a few steps under
`jax.profiler.trace`, parse the trace.json.gz, and aggregate device-stream
op durations by (named) op. Name all pallas_calls so they show up.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_step.py \
      [--mode train|eval] [--steps 3] [--top 30]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import shutil
from collections import defaultdict
from dataclasses import replace

import numpy as np


def build_step(mode: str, batch: int = 0, subsample: int = 0):
    import jax
    import jax.numpy as jnp

    from stratanet2_tpu.config import Config
    from stratanet2_tpu.learning.kde import fit_kde_mixture
    from stratanet2_tpu.learning.train import (
        init_train_state,
        make_eval_step,
        make_optimizer,
        make_train_step,
    )

    cfg = Config()  # PROD geometry: subsample_size=10000, batch 20
    if subsample:
        cfg = replace(cfg, model=replace(cfg.model, subsample_size=subsample))
    if batch:
        cfg = replace(cfg, train=replace(cfg.train, batch_size=batch))
    b, n = cfg.train.batch_size, cfg.model.subsample_size
    rng = np.random.default_rng(0)
    cloud = jnp.asarray(rng.random((b, n, cfg.model.n_input_feats), np.float32))
    xyz = jnp.asarray(rng.random((b, n, 3), np.float32) * 10.0)
    gt = jnp.asarray(rng.random((b, 4), np.float32))
    kde = fit_kde_mixture(rng.uniform(0, 20, 10000))

    optimizer = make_optimizer(cfg, steps_per_epoch=10)
    ts = init_train_state(cfg, optimizer, seed=0)
    if mode == "train":
        step = make_train_step(cfg, optimizer, kde)
        key = __import__("jax").random.PRNGKey(0)

        def run(ts):
            ts, comps = step(ts, cloud, xyz, gt, key)
            return ts, comps["total_loss"]

    else:
        estep = make_eval_step(cfg, kde)
        model_params = __import__(
            "stratanet2_tpu.models", fromlist=["PointNet2Params"]
        ).PointNet2Params(ts.params, ts.model_state)

        def run(ts):
            out = estep(model_params, cloud, xyz, gt)
            return ts, jnp.sum(out[3]["total_loss"])

    return run, ts


# XLA device ops have 'long_name'/'hlo_op' args or fusion/custom-call-style
# names (host threads don't) — shared with scripts/trace_raw.py
_DEVICE_OP_RE = re.compile(
    r".*(fusion|custom-call|copy|convert|dot|reduce|transpose|scatter|gather"
    r"|while|dynamic|slice|pallas|broadcast|iota|select|bitcast|concatenate"
    r"|pad|pjit|tpu)"
)


def load_latest_trace(logdir: str) -> list:
    """Load traceEvents from the newest trace.json.gz under `logdir`."""
    paths = glob.glob(
        os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True
    )
    assert paths, f"no trace under {logdir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        return json.load(f)["traceEvents"]


def is_device_op(ev: dict) -> bool:
    """True for complete-span events that look like XLA device-stream ops."""
    if ev.get("ph") != "X":
        return False
    args = ev.get("args", {}) or {}
    return bool(
        "long_name" in args
        or "hlo_op" in args
        or _DEVICE_OP_RE.match(ev.get("name", ""))
    )


def parse_trace(logdir: str, top: int, steps: int):
    events = load_latest_trace(logdir)

    per_op = defaultdict(float)
    total = 0.0
    for ev in events:
        if not is_device_op(ev):
            continue
        dur = ev.get("dur", 0) / 1000.0  # us -> ms
        # strip trailing .N dedup suffixes
        key = re.sub(r"\.\d+$", "", ev.get("name", ""))
        per_op[key] += dur
        total += dur

    rows = sorted(per_op.items(), key=lambda kv: -kv[1])[:top]
    print(f"{'op':64s} {'ms/step':>8s}")
    for name, ms in rows:
        print(f"{name[:64]:64s} {ms / steps:8.3f}")
    print(f"{'TOTAL (device ops)':64s} {total / steps:8.3f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="train", choices=["train", "eval"])
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--batch", type=int, default=0, help="override batch size")
    ap.add_argument(
        "--subsample", type=int, default=0, help="override subsample_size"
    )
    ap.add_argument("--logdir", default="/tmp/trace_step")
    ns = ap.parse_args()

    import jax

    run, ts = build_step(ns.mode, ns.batch, ns.subsample)
    # warmup/compile outside the trace
    ts, s = run(ts)
    float(s)

    shutil.rmtree(ns.logdir, ignore_errors=True)
    with jax.profiler.trace(ns.logdir):
        for _ in range(ns.steps):
            ts, s = run(ts)
        float(s)
    parse_trace(ns.logdir, ns.top, ns.steps)


if __name__ == "__main__":
    main()
