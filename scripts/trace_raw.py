"""Ungrouped per-op view of an existing jax.profiler trace dir.

Complements scripts/trace_step.py (which groups by stripped op name): prints
each op instance with its `long_name`/shape args so relayout costs (copy /
pad / fusion) can be attributed to the producing HLO.

Usage: python scripts/trace_raw.py [--logdir /tmp/trace_step] [--top 40] [--steps 3]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
from collections import defaultdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/trace_step")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--filter", default="", help="regex on op name")
    ns = ap.parse_args()

    paths = glob.glob(os.path.join(ns.logdir, "**", "*.trace.json.gz"), recursive=True)
    assert paths, f"no trace under {ns.logdir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)

    per_op = defaultdict(float)
    detail = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        args = ev.get("args", {}) or {}
        if not (
            "long_name" in args
            or "hlo_op" in args
            or re.match(
                r".*(fusion|custom-call|copy|convert|dot|reduce|transpose|scatter|gather|while|dynamic|slice|pallas|broadcast|iota|select|bitcast|concatenate|pad|pjit|tpu)",
                name,
            )
        ):
            continue
        if ns.filter and not re.search(ns.filter, name):
            continue
        per_op[name] += ev.get("dur", 0) / 1000.0
        ln = args.get("long_name") or args.get("hlo_op") or ""
        if ln:
            detail[name] = ln[:160]

    rows = sorted(per_op.items(), key=lambda kv: -kv[1])[: ns.top]
    for name, ms in rows:
        print(f"{ms / ns.steps:8.3f}  {name[:48]:48s} {detail.get(name, '')[:100]}")


if __name__ == "__main__":
    main()
