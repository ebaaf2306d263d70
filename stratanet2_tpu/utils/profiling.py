"""Tracing / profiling utilities.

The reference has none (SURVEY.md §5: only tqdm bars and a parameter-count
log). Here:

- `Phase` — nested wall-clock phase timers with points/sec counters, dumped
  as JSON; the north-star metric (points/sec/chip) is first-class.
- `trace` — context manager around `jax.profiler` emitting a TensorBoard
  trace when the backend supports it (graceful no-op otherwise, e.g. through
  the axon relay).
- `device_sync` — robust synchronization: fetches a scalar, because
  `block_until_ready` does not actually block on some remote backends
  (measured on the axon relay — see bench.py).
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

logger = logging.getLogger("stratanet2_tpu")


def device_sync(x) -> float:
    """Force completion of device work feeding `x`; returns a host scalar."""
    import jax.numpy as jnp

    return float(jnp.asarray(x).sum())


@dataclass
class Phase:
    """Hierarchical phase timing with throughput counters.

    Usage:
      prof = Phase("train")
      with prof.phase("epoch"):
          with prof.phase("forward", points=B * N):
              ...
      prof.report()
    """

    name: str = "root"
    totals: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)
    points: Dict[str, int] = field(default_factory=dict)
    _stack: list = field(default_factory=list)

    @contextlib.contextmanager
    def phase(self, name: str, points: int = 0):
        key = "/".join(self._stack + [name])
        self._stack.append(name)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._stack.pop()
            self.totals[key] = self.totals.get(key, 0.0) + dt
            self.counts[key] = self.counts.get(key, 0) + 1
            if points:
                self.points[key] = self.points.get(key, 0) + points

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for key, total in sorted(self.totals.items()):
            row = {
                "seconds": round(total, 4),
                "calls": self.counts[key],
                "mean_ms": round(total / self.counts[key] * 1000, 3),
            }
            if key in self.points:
                row["points_per_sec"] = round(self.points[key] / total, 1)
            out[key] = row
        return out

    def report(self, path: Optional[str] = None) -> str:
        s = json.dumps({"profile": self.name, "phases": self.summary()}, indent=2)
        if path:
            with open(path, "w") as f:
                f.write(s)
        else:
            logger.info("profile %s:\n%s", self.name, s)
        return s


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace wrapper; no-op if unsupported by the backend."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as err:  # pragma: no cover
        logger.warning("jax profiler trace unavailable: %s", err)
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:  # pragma: no cover
                pass
