"""Measure the torch reference oracle's CPU forward throughput at BASELINE
config 1 geometry (fixed 4096-pt plot clouds) to anchor bench.py's
vs_baseline denominator (VERDICT r3 item 5).

The oracle (`utils/reference_oracle.reference_forward`) re-derives the
reference's exact forward math (model/point_net2.py:106-153 semantics) in
plain torch + numpy. Its CPU timing is a *conservative lower bound* on the
CUDA reference's throughput: the real reference runs the same math on a
2021-era GPU via torch_cluster/torch_geometric kernels, typically 10-100x
faster than single-node CPU torch. bench.py fixes the north-star
denominator at 5.0e6 pts/s (= 20 x an estimated 250k pts/s for the CUDA
reference); this measurement documents that the estimate is not an
undershoot fabricated to inflate vs_baseline.

Usage: python scripts/measure_oracle_baseline.py [--plots 4] [--n 4096]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plots", type=int, default=4, help="plots to time")
    ap.add_argument("--n", type=int, default=4096, help="points per plot")
    ap.add_argument("--max_num", type=int, default=2000,
                    help="reference neighbor cap (model/point_net2.py:24)")
    args = ap.parse_args()

    from dataclasses import replace

    from stratanet2_tpu.config import Config
    from stratanet2_tpu.utils.reference_oracle import (
        make_reference_state_dict,
        reference_forward,
    )

    mcfg = replace(Config().model, subsample_size=args.n)
    sd = make_reference_state_dict(0, n_input_feats=mcfg.n_input_feats - 2)

    rng = np.random.default_rng(1)
    b, n = args.plots, args.n
    cloud = rng.uniform(0, 1, (b, n, mcfg.n_input_feats - 2)).astype(np.float32)
    xyz = rng.uniform(-10, 10, (b, n, 3)).astype(np.float32)

    kw = dict(
        n_centroids1=mcfg.n_centroids1,
        n_centroids2=mcfg.n_centroids2,
        r1=mcfg.r1,
        r2=mcfg.r2,
        max_num_neighbors=args.max_num,
    )
    # warmup (numpy/torch allocators, BLAS thread pools)
    reference_forward(sd, cloud[:1], xyz[:1], **kw)
    t0 = time.perf_counter()
    reference_forward(sd, cloud, xyz, **kw)
    dt = time.perf_counter() - t0
    pts_per_sec = b * n / dt
    print(
        json.dumps(
            {
                "metric": "reference_oracle_cpu_points_per_sec",
                "value": round(pts_per_sec, 1),
                "unit": "points/sec",
                "detail": f"{b} plots x {n} pts in {dt:.2f}s, torch CPU, "
                "exact reference forward semantics "
                "(conservative lower bound for the CUDA reference)",
            }
        )
    )


if __name__ == "__main__":
    main()
