"""Full-pipeline CLI test on synthetic data: train (cross-val) -> prepare
(parcel tiling) -> predict (inference + pseudo-labelling) -> SSL pretraining
-> warm-started training. DEV mode, tiny clouds. This is the reference's
DEV-mode smoke test made into a real test (SURVEY.md §4)."""

import os
import pickle

import numpy as np
import pandas as pd
import pytest

from tests.synthetic import make_plot_cloud


@pytest.fixture(scope="module")
def data_tree(tmp_path_factory):
    """Synthetic data folder matching the reference layout."""
    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)

    from stratanet2_tpu.data.las import write_las
    from stratanet2_tpu.inference import shapefile_io as S
    from stratanet2_tpu.inference.polygons import Polygon

    # --- plot LAS files + GT csv
    las_dir = root / "placettes_dataset" / "las_classes"
    las_dir.mkdir(parents=True)
    names, rows = [], []
    centers_bins = [0, 10, 25, 33, 50, 75, 90, 100]
    for i in range(10):
        cloud = make_plot_cloud(rng, n=500, center=(1000 + 40 * i, 2000))
        write_las(
            str(las_dir / f"Plot_{i:02d}.las"),
            {
                "x": cloud[0], "y": cloud[1], "z": cloud[2],
                "red": cloud[3], "green": cloud[4], "blue": cloud[5],
                "nir": cloud[6], "intensity": cloud[7],
                "return_num": cloud[8], "num_returns": cloud[9],
            },
        )
        names.append(f"Plot_{i:02d}")
        basse = int(rng.choice(centers_bins))
        rows.append(
            {
                "nom": names[-1],
                "COUV_BASSE": basse,
                "COUV_INTER": int(rng.choice(centers_bins)),
                "COUV_HAUTE": int(rng.choice(centers_bins)),
            }
        )
    gt = pd.DataFrame(rows)
    gt_dir = root / "placettes_dataset"
    gt.to_csv(gt_dir / "placettes_metadata.csv", index=False)
    corr_dir = root / "placettes_dataset_correction"
    corr_dir.mkdir()
    gt.to_csv(corr_dir / "placettes_metadata_correction.csv", index=False)

    # --- parcel LAS + shapefile
    parcels_dir = root / "parcelles_dataset_20m"
    (parcels_dir / "input").mkdir(parents=True)
    clouds = []
    for cx in (10, 30):
        for cy in (10, 30):
            clouds.append(make_plot_cloud(rng, n=900, center=(cx, cy), radius=12))
    parcel = np.concatenate(clouds, axis=1)
    write_las(
        str(parcels_dir / "input" / "PARCELA.las"),
        {
            "x": parcel[0], "y": parcel[1], "z": parcel[2],
            "red": parcel[3], "green": parcel[4], "blue": parcel[5],
            "nir": parcel[6], "intensity": parcel[7],
            "return_num": parcel[8], "num_returns": parcel[9],
        },
    )
    shape = Polygon([np.array([[0, 0], [40, 0], [40, 40], [0, 40], [0, 0]], float)])
    shp = S.Shapefile(
        fields=[S.FieldSpec("ID", "C", 16)],
        shape_records=[S.ShapeRecord(shape, {"ID": "PARCELA"})],
    )
    S.write_shapefile(str(parcels_dir / "input" / "parcels.shp"), shp)
    return root


def _common_args(root, exp_dir):
    return [
        "--mode", "DEV",
        "--subsample_size", "256",
        "--data_path", str(root),
        "--las_plots_folder_path", str(root / "placettes_dataset" / "las_classes"),
        "--plots_pickled_dataset_path", str(root / "placettes_dataset" / "prepared" / "plots.pkl"),
        "--gt_file_path", str(root / "placettes_dataset" / "placettes_metadata.csv"),
        "--corrected_gt_file_path", str(root / "placettes_dataset_correction" / "placettes_metadata_correction.csv"),
        "--las_parcels_folder_path", str(root / "parcelles_dataset_20m"),
        "--parcel_shapefile_path", str(root / "parcelles_dataset_20m" / "input" / "parcels.shp"),
        "--experiments_path", str(exp_dir),
        "--batch_size", "4",
        "--use_pallas", "false",
    ]


@pytest.fixture(scope="module")
def experiments(data_tree, tmp_path_factory):
    return tmp_path_factory.mktemp("experiments")


@pytest.fixture(scope="module")
def trained(data_tree, experiments):
    from stratanet2_tpu.cli.main import main

    stats_path = main(_common_args(data_tree, experiments))
    return stats_path


class TestPipeline:
    def test_training_artifacts(self, trained):
        assert os.path.exists(os.path.join(trained, "PCC_model_fold_n=1.pt"))
        assert os.path.exists(os.path.join(trained, "metrics.jsonl"))
        csvs = [f for f in os.listdir(trained) if f.endswith(".csv")]
        assert any("relabeled_summary" in f for f in csvs)
        assert any(f.endswith("_summary.csv") for f in csvs)
        df = pd.read_csv(
            os.path.join(trained, "PCC_inference_all_placettes_relabeled_summary.csv")
        )
        assert {"pred_veg_b", "vt_veg_b", "error_all", "acc2_all"} <= set(df.columns)
        assert os.path.exists(
            os.path.join(trained, "img/kde_mixture/kde_mixture_x_lim=25.png")
        )

    def test_prepare_predict_ssl(self, data_tree, experiments, trained):
        from stratanet2_tpu.cli.prepare import main as prepare_main
        from stratanet2_tpu.cli.predict import main as predict_main
        from stratanet2_tpu.cli.main_ssl import main as ssl_main
        from stratanet2_tpu.cli.main import main as train_main

        args = _common_args(data_tree, experiments)
        prepare_main(args)
        prepared = data_tree / "parcelles_dataset_20m" / "prepared" / "PARCELA.pkl"
        assert prepared.exists()
        with open(prepared, "rb") as f:
            plots = pickle.load(f)
        assert len(plots) >= 4

        model_id = os.path.basename(trained.rstrip("/"))
        predict_main(args + ["--task", "inference", "--inference_model_id", model_id])
        out_tif = (
            data_tree / "parcelles_dataset_20m" / "inference" / model_id / "PARCELA.tif"
        )
        assert out_tif.exists()
        out_shp = (
            data_tree / "parcelles_dataset_20m" / "inference" / model_id / "parcels.shp"
        )
        assert out_shp.exists()

        # pseudo-labelling needs >2000-pt plots; lower via pickles directly
        for v in plots.values():
            v["N_points_in_cloud"] = 3000
        with open(prepared, "wb") as f:
            pickle.dump(plots, f)
        predict_main(args + ["--task", "pseudo_labelling", "--inference_model_id", model_id])
        pl_pkl = (
            data_tree / "parcelles_dataset_20m" / "pseudo_labelling" / model_id / "PARCELA.pkl"
        )
        assert pl_pkl.exists()

        ssl_path = ssl_main(args + ["--inference_model_id", model_id])
        assert os.path.exists(os.path.join(ssl_path, "PCC_model_full.pt"))

        # warm-started cross-val (--PT_model_id, reference config.py:48)
        ssl_id = os.path.basename(ssl_path.rstrip("/"))
        stats2 = train_main(args + ["--PT_model_id", ssl_id])
        assert os.path.exists(os.path.join(stats2, "PCC_model_fold_n=1.pt"))

    def test_predict_worklist_terminates_on_no_output_parcel(
        self, data_tree, experiments, trained, monkeypatch
    ):
        """PROD-mode regression: a parcel whose prediction writes NO output
        (all plots invalid -> 'Nothing to merge') must not be re-offered by
        the worklist diff forever."""
        import stratanet2_tpu.cli.predict as P

        # self-contained when run alone: the prepared parcel normally comes
        # from test_prepare_predict_ssl, but pytest -k selections may skip it
        prepared = data_tree / "parcelles_dataset_20m" / "prepared" / "PARCELA.pkl"
        if not prepared.exists():
            from stratanet2_tpu.cli.prepare import main as prepare_main

            prepare_main(_common_args(data_tree, experiments))

        out_tif = (
            data_tree / "parcelles_dataset_20m" / "inference"
            / os.path.basename(trained.rstrip("/")) / "PARCELA.tif"
        )
        if out_tif.exists():
            out_tif.unlink()  # make PARCELA unprocessed again

        calls = []

        def stub_predict_parcel(*a, **kw):
            calls.append(1)
            if len(calls) > 2:
                raise RuntimeError("worklist re-offered a no-output parcel")
            return None  # nothing written

        monkeypatch.setattr(P, "predict_parcel", stub_predict_parcel)
        monkeypatch.setattr(
            P, "update_shapefile_with_predictions", lambda *a, **kw: ""
        )
        args = [a if a != "DEV" else "PROD" for a in _common_args(data_tree, experiments)]
        model_id = os.path.basename(trained.rstrip("/"))
        P.main(args + ["--task", "inference", "--inference_model_id", model_id])
        assert len(calls) == 1


class TestCliErrorPaths:
    """The verify-recipe probes: clear failures for misuse, idempotent
    worklist messaging."""

    def test_predict_without_model_id_asserts(self, data_tree, experiments):
        from stratanet2_tpu.cli.predict import main as predict_main

        with pytest.raises(AssertionError, match="inference_model_id"):
            predict_main(
                _common_args(data_tree, experiments) + ["--task", "inference"]
            )

    def test_predict_rerun_reports_empty_worklist(
        self, data_tree, experiments, trained, caplog
    ):
        import logging

        from stratanet2_tpu.cli.predict import main as predict_main

        model_id = os.path.basename(trained)
        args = _common_args(data_tree, experiments) + [
            "--task", "inference", "--inference_model_id", model_id,
        ]
        predict_main(args)  # first run may or may not have work left
        with caplog.at_level(logging.INFO, logger="stratanet2_tpu"):
            predict_main(args)  # idempotent: nothing left now
        assert any(
            "No more prepared parcel" in r.message for r in caplog.records
        )

    def test_train_with_empty_las_folder_exits(self, data_tree, experiments, tmp_path):
        from stratanet2_tpu.cli.main import main as train_main

        empty = tmp_path / "empty_las"
        empty.mkdir()
        args = _common_args(data_tree, experiments)
        i = args.index("--las_plots_folder_path")
        args[i + 1] = str(empty)
        # don't clobber the module-shared prepared pkl with an empty one
        j = args.index("--plots_pickled_dataset_path")
        args[j + 1] = str(tmp_path / "plots.pkl")
        with pytest.raises(SystemExit, match="No plots found"):
            train_main(args)


class TestLibraryUsageExample:
    def test_example_runs(self):
        """examples/library_usage.py is the documented programmatic API
        tour — keep it executable (shapes, signatures, sharded paths)."""
        import importlib.util
        import os

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        spec = importlib.util.spec_from_file_location(
            "library_usage", os.path.join(root, "examples", "library_usage.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()
