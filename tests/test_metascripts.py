"""Offline-analysis (metascripts) tests."""

import os

import numpy as np
import pandas as pd
import pytest

from stratanet2_tpu.learning import metrics as M


def make_results_df(rng, n=40):
    return pd.DataFrame(
        {
            "pl_id": [f"p{i}" for i in range(n)],
            **{f"pred_{s}": rng.uniform(0, 1, n) for s in M.STRATA},
            **{
                f"vt_{s}": M.closest_class_center(rng.uniform(0, 1, n))
                for s in M.STRATA
            },
        }
    )


class TestBenchmarkAllModels:
    def test_benchmark_csv(self, tmp_path, rng):
        from stratanet2_tpu.metascripts.benchmark_all_models import benchmark

        for i in range(2):
            d = tmp_path / "experiments" / "PROD" / f"run{i}"
            d.mkdir(parents=True)
            make_results_df(rng).to_csv(
                d / "PCC_inference_all_placettes_summary.csv", index=False
            )
        out_path = str(tmp_path / "bench.csv")
        out = benchmark(str(tmp_path / "experiments/**/*placettes*.csv"), out_path)
        assert len(out) == 2
        assert "error_all" in out.columns and "acc2_all" in out.columns
        assert os.path.exists(out_path)

    def test_percent_and_scale_normalization(self, rng):
        from stratanet2_tpu.metascripts.benchmark_all_models import format_cols

        df = pd.DataFrame(
            {
                "nom": ["a", "b"],
                "COUV BASSE": [50, 75],
                "COUV INTER": [10, 0],
                "COUV HAUTE": [90, 100],
                "couverture basse calibree": ["50%", "75%"],
                "couverture inter calibree": ["10%", "0%"],
                "Taux de couverture haute lidar": ["90%", "100%"],
            }
        )
        out = format_cols(df)
        assert out["vt_veg_b"].max() <= 1
        np.testing.assert_allclose(out["pred_veg_b"], [0.5, 0.75])


class TestPredictionsAnalysis:
    def test_analyse(self, tmp_path, rng):
        from stratanet2_tpu.metascripts.predictions_analysis import analyse

        df = make_results_df(rng, n=60)
        df = M.calculate_performance_indicators_v1(df)
        df = M.calculate_performance_indicators_v2(df)
        df = M.calculate_performance_indicators_v3(df)
        p = str(tmp_path / "results.csv")
        df.to_csv(p, index=False)
        out = analyse(p, str(tmp_path / "analyses"))
        assert out["n"] == 60
        assert -1 <= out["pearson_r"] <= 1
        assert os.path.exists(tmp_path / "analyses" / "confusion")


class TestQuantificationErrors:
    def test_uniform_quantification_error(self):
        from stratanet2_tpu.metascripts import quantification_errors as Q

        mapper = Q.study_quantification_error_1()
        # class 0 spans [0, 5]: mean error ~2.5pp under uniform sampling
        assert mapper[0] == pytest.approx(2.51, abs=0.1)
        # class 100 spans [95, 105] but x <= 100: mean ~2.5pp
        assert 0 < mapper[100] < 4

    def test_msrt_error_table(self, tmp_path):
        from stratanet2_tpu.metascripts import quantification_errors as Q

        df = Q.describe_possible_measurement_error_distribution(
            stdev_list=(1e-7, 10), above_list=(5, 20),
            out_path=str(tmp_path / "t.csv"),
        )
        # zero-noise: P(|e|>t) = 0; sigma=10: P(|e|>5) ~ 0.62
        assert df.iloc[0, 0] == 0.0
        assert df.loc["|e|>5", "sigma=10.0"] == pytest.approx(0.62, abs=0.02)
        assert df.loc["|e|>20", "sigma=10.0"] == pytest.approx(0.05, abs=0.02)

    def test_expected_error_zero_noise_is_quantification_floor(self):
        from stratanet2_tpu.metascripts import quantification_errors as Q

        # with ~zero measurement noise, expected MAE equals the pure
        # quantification error under the reference's class-equal weighting
        # (~4pp: wide classes contribute larger |real - center| means)
        # and accuracy is 1.0
        e = Q.expected_error_under_measurement_noise(1e-7, Q.mae_pc)
        assert 2.0 < e < 6.0
        a = Q.expected_error_under_measurement_noise(1e-7, Q.acc_pc)
        assert a == pytest.approx(1.0, abs=0.01)
