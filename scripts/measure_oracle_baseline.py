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

--chain (VERDICT r4 item 2a) extends the measurement to the reference's
FULL per-plot serve chain — forward + `project_to_2d_rasters` (the
per-unique-pixel Python loop with a fresh nn.MaxPool1d per pixel,
/root/reference/model/project_to_2d.py:87-105) + weight bands + the
rasterio-merge weighted-average reducer + the 10,001-threshold hard-Vm
scan (/root/reference/inference/geotiff_raster.py:294-347, :121-146) —
and reports reference-semantics plots/sec. CONSERVATIVE in our
disfavor: parcel preparation (cKDTree extraction + the per-point z-norm
loop), the sieve/admissibility/crop steps, and all file I/O are
EXCLUDED from the reference timing although bench config 4 includes
their equivalents on our side.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def chain_main(args):
    """Reference-semantics serve chain: forward + per-plot rasterization +
    weight bands, then one mosaic merge + hard-Vm scan per parcel."""
    import time as _time

    from dataclasses import replace

    from stratanet2_tpu.config import Config
    from stratanet2_tpu.utils.reference_oracle import (
        make_reference_state_dict,
        reference_forward,
        reference_hard_med_veg_band,
        reference_merge_rasters,
        reference_rasterize_plot,
        reference_weight_bands,
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
    dp, dm = mcfg.diam_pix, mcfg.diam_meters

    # warmup
    reference_forward(sd, cloud[:1], xyz[:1], **kw)

    t0 = _time.perf_counter()
    cov, _proba = reference_forward(sd, cloud, xyz, **kw)
    t_fwd = _time.perf_counter() - t0

    cov = np.asarray(cov).reshape(b, n, -1)
    t0 = _time.perf_counter()
    tiles = []
    for i in range(b):
        rasters = reference_rasterize_plot(
            cov[i].T, xyz[i, :, :2].T / 10.0, dp, dm  # rescaled xy, as fed
        )
        tiles.append(reference_weight_bands(rasters, dp))
    t_raster = _time.perf_counter() - t0

    # ~13.14 m grid step of the reference tiling (prepare_utils.py:116-144)
    # => ~2/3-tile pixel stride; P tiles in a sqrt-grid parcel canvas
    t0 = _time.perf_counter()
    step = max(1, (2 * dp) // 3)
    side = int(np.ceil(np.sqrt(b)))
    offsets = [
        ((i // side) * step, (i % side) * step) for i in range(b)
    ]
    h = max(r for r, _ in offsets) + dp
    w = max(c for _, c in offsets) + dp
    mosaic = reference_merge_rasters(tiles, offsets, h, w)
    mosaic = mosaic[:4]  # 3 preds + 1 weight band (geotiff_raster.py:282)
    mosaic = reference_hard_med_veg_band(mosaic)
    t_merge = _time.perf_counter() - t0

    total = t_fwd + t_raster + t_merge
    print(
        json.dumps(
            {
                "metric": "reference_oracle_cpu_serve_chain_plots_per_sec",
                "value": round(b / total, 3),
                "unit": "plots/sec",
                "detail": (
                    f"{b} plots x {n} pts: forward {t_fwd:.2f}s + "
                    f"per-plot raster loop {t_raster:.2f}s + merge/hard-Vm "
                    f"{t_merge:.2f}s (torch CPU, reference chain semantics; "
                    "prepare, admissibility and file I/O excluded = "
                    "conservative in the TPU framework's disfavor)"
                ),
            }
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plots", type=int, default=4, help="plots to time")
    ap.add_argument("--n", type=int, default=4096, help="points per plot")
    ap.add_argument("--max_num", type=int, default=2000,
                    help="reference neighbor cap (model/point_net2.py:24)")
    ap.add_argument("--chain", action="store_true",
                    help="measure the full serve chain (forward + raster "
                    "loop + merge), not just the forward")
    args = ap.parse_args()
    if args.chain:
        chain_main(args)
        return

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
