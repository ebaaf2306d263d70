"""Ungrouped per-op view of an existing jax.profiler trace dir.

Complements scripts/trace_step.py (which groups by stripped op name): prints
each op instance with its `long_name`/shape args so relayout costs (copy /
pad / fusion) can be attributed to the producing HLO. Trace loading and the
device-op predicate are shared with trace_step.py.

Usage: python scripts/trace_raw.py [--logdir /tmp/trace_step] [--top 40] [--steps 3]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from trace_step import is_device_op, load_latest_trace  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/trace_step")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--filter", default="", help="regex on op name")
    ns = ap.parse_args()

    per_op = defaultdict(float)
    detail = {}
    for ev in load_latest_trace(ns.logdir):
        if not is_device_op(ev):
            continue
        name = ev.get("name", "")
        if ns.filter and not re.search(ns.filter, name):
            continue
        per_op[name] += ev.get("dur", 0) / 1000.0
        args = ev.get("args", {}) or {}
        ln = args.get("long_name") or args.get("hlo_op") or ""
        if ln:
            detail[name] = ln[:160]

    rows = sorted(per_op.items(), key=lambda kv: -kv[1])[: ns.top]
    for name, ms in rows:
        print(f"{ms / ns.steps:8.3f}  {name[:48]:48s} {detail.get(name, '')[:100]}")


if __name__ == "__main__":
    main()
