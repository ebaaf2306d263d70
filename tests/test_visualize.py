"""Direct tests for the interpretation-figure module (it is exception-guarded
in the eval loop, so regressions would otherwise be silent)."""

import os

import numpy as np
import pytest

from tests.synthetic import tiny_config


class TestVisualize:
    def test_six_panel_figure_and_geotiff(self, tmp_path, rng):
        from dataclasses import replace

        from stratanet2_tpu.utils.visualize import create_predictions_interpretations

        cfg = replace(tiny_config(), plot_geotiff_file=True)
        n = 200
        cloud = rng.uniform(0, 1, (n, 10)).astype(np.float32)
        cloud[:, :2] = rng.uniform(-1, 1, (n, 2))
        cov = rng.dirichlet(np.ones(4), n).astype(np.float32) * 0.8
        p_all = rng.dirichlet(np.ones(3), n).astype(np.float32)
        pdf_all = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        png = create_predictions_interpretations(
            pred_pl=np.array([0.4, 0.6, 0.3, 0.2]),
            gt=np.array([0.5, 0.5, 0.25, 0.1]),
            coverages_pointwise=cov,
            cloud=cloud,
            p_all=p_all,
            pdf_all=pdf_all,
            plot_name="TESTPLOT",
            plot_center=np.array([100.0, 200.0]),
            cfg=cfg,
            stats_path=str(tmp_path),
            fold_id=1,
        )
        assert os.path.exists(png) and png.endswith("TESTPLOT.png")
        assert os.path.getsize(png) > 10_000
        tif = png.replace(".png", ".tif")
        assert os.path.exists(tif)
        from stratanet2_tpu.inference.geotiff import read_geotiff

        out = read_geotiff(tif)
        assert out.bands.shape == (3, cfg.model.diam_pix, cfg.model.diam_pix)
        # geotransform centered on the plot (geotiff_raster.py:46-61)
        assert out.geotransform[0] == 100.0 - cfg.model.diam_meters // 2
        assert out.geotransform[3] == 200.0 + cfg.model.diam_meters // 2
