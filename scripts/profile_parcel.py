"""cProfile of bench config 4 (parcel pipeline) host-side hot spots.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_parcel.py
"""

from __future__ import annotations

import cProfile
import pstats
import tempfile
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from dataclasses import replace

    from stratanet2_tpu.config import Config
    from stratanet2_tpu.inference.polygons import Polygon
    from stratanet2_tpu.inference.predict import make_predict_step, predict_parcel
    from stratanet2_tpu.inference.tiling import extract_plots_from_parcel, get_plot_centers
    from stratanet2_tpu.models import init_pointnet2

    cfg = replace(Config(), model=replace(Config().model, subsample_size=4096))
    mcfg = cfg.model
    rng = np.random.default_rng(0)
    n_pts = 400_000
    side = 120.0
    parcel = np.zeros((10, n_pts), np.float32)
    parcel[0] = rng.uniform(0, side, n_pts)
    parcel[1] = rng.uniform(0, side, n_pts)
    parcel[2] = rng.uniform(0, 20, n_pts)
    parcel[3:8] = rng.uniform(0, 30000, (5, n_pts))
    parcel[8:] = 1.0
    shape = Polygon([np.array([[0, 0], [side, 0], [side, side], [0, side], [0, 0]])])
    centers = get_plot_centers((0, side), (0, side), shape, mcfg.diam_pix, mcfg.diam_meters)
    model = init_pointnet2(jax.random.PRNGKey(0), mcfg)

    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    plots = extract_plots_from_parcel(cfg, parcel, centers)
    pr.disable()
    print(f"prepare: {time.perf_counter() - t0:.2f}s for {len(plots)} plots")
    pstats.Stats(pr).sort_stats("cumtime").print_stats(18)

    predict_step = make_predict_step(cfg)
    b = cfg.train.batch_size
    predict_step(
        model,
        jnp.zeros((b, mcfg.subsample_size, 10), jnp.float32),
        jnp.zeros((b, mcfg.subsample_size, 3), jnp.float32),
    )
    pr2 = cProfile.Profile()
    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        pr2.enable()
        predict_parcel(
            model, plots, cfg, "BENCH", td, task="inference",
            parcel_shape=shape, predict_step=predict_step,
        )
        pr2.disable()
        print(f"predict+mosaic: {time.perf_counter() - t0:.2f}s")
    pstats.Stats(pr2).sort_stats("cumtime").print_stats(25)


if __name__ == "__main__":
    main()
