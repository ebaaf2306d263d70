"""Typed, immutable configuration for the framework.

Replaces the reference's mutable global argparse Namespace (reference:
config.py:1-103) with frozen dataclasses. Runtime objects (KDE mixture,
fold cursor, experiment sink) are threaded explicitly instead of being
attached to a global (see SURVEY.md §1 note).

Defaults mirror the reference exactly:
- 10 input features, subsample_size=10000, diam 20m/20px (config.py:54-69)
- loss weights m=0.10, e=0.04 (config.py:70-71)
- z-norm radius 1.5m, z_max=24.24 (config.py:72-73)
- PointNet2 ratio1/2=0.25, r1=sqrt(2), r2=sqrt(8) (config.py:77-80)
- Adam lr=1e-3, wd=1e-3, batch 20, 5 folds, 300 epochs, lr decay 0.985/epoch
  (config.py:83-97)

TPU-specific additions (no reference equivalent — needed for the static-shape
dense-neighborhood design): k1/k2 neighbor caps, kNN chunk size, bf16 switch.
"""

from __future__ import annotations

import argparse
import dataclasses
import math
import os
from dataclasses import dataclass, field, replace
from typing import Optional, Tuple

FEATURE_NAMES: Tuple[str, ...] = (
    "x",
    "y",
    "z_flat",
    "red",
    "green",
    "blue",
    "near_infrared",
    "intensity",
    "return_num",
    "num_returns",
)

# Class order used everywhere, matching the reference
# (learning/test.py:141-148): [low_veg, bare_soil, med_veg, high_veg].
CLASS_NAMES: Tuple[str, ...] = ("veg_b", "sol_nu", "veg_moy", "veg_h")


@dataclass(frozen=True)
class ModelConfig:
    """PointNet2 architecture hyperparameters (reference model/point_net2.py:70-104)."""

    n_class: int = 4
    n_input_feats: int = len(FEATURE_NAMES)  # x,y dropped inside the model
    subsample_size: int = 10000
    diam_meters: int = 20
    diam_pix: int = 20
    drop: float = 0.0
    ratio1: float = 0.25
    r1: float = math.sqrt(2.0)
    ratio2: float = 0.25
    r2: float = math.sqrt(8.0)
    z_max: float = 24.24
    # Head bias init (model/point_net2.py:97-99).
    head_bias_init: Tuple[float, ...] = (0.733, 0.266, 0.235, 0.358, 0.500)
    # --- TPU-native knobs (fixed-K padded neighborhoods; no reference
    # equivalent — the reference used variable-length edge lists capped at
    # 2000 neighbors, model/point_net2.py:24). K chosen for MXU-friendly
    # dense gathers; parity validated in tests/benchmarks.
    k1: int = 32
    k2: int = 64
    # "grouped": nearest-per-random-group selection, one VPU pass, full-ball
    # coverage; "nearest": approx k-nearest-within-radius (see ops.ballquery)
    ball_query_method: str = "grouped"
    # partitioned FPS approximation (ops/fps.py): parts=2 halves the
    # sequential selection loop; applied only when each part selects at
    # least fps_min_part_samples (so DEV/test geometries stay exact)
    fps_parts: int = 2
    fps_min_part_samples: int = 256
    knn_chunk: int = 1024  # target-chunk size for kNN/ball-query dist tiles
    use_pallas: bool = True  # Pallas fast path for FPS (falls back on CPU)
    compute_dtype: str = "float32"  # matmul compute dtype ("bfloat16" opt-in)

    @property
    def n_centroids1(self) -> int:
        return int(self.subsample_size * self.ratio1)

    @property
    def n_centroids2(self) -> int:
        return int(self.n_centroids1 * self.ratio2)


@dataclass(frozen=True)
class TrainConfig:
    """Optimization schedule (reference config.py:83-97)."""

    folds: int = 5
    wd: float = 1e-3
    batch_size: int = 20
    n_epoch: int = 300
    n_epoch_test: int = 10
    epoch_to_start_early_stop: int = 250
    use_early_stopping: bool = False
    patience_in_epochs: int = 30
    lr: float = 1e-3
    step_size: int = 1  # epochs between LR decays
    lr_decay: float = 0.985
    m: float = 0.10  # NLL loss weight (config.py:70)
    e: float = 0.2 / 5  # entropy loss weight (config.py:71)
    seed: int = 42


@dataclass(frozen=True)
class DataConfig:
    """Host data-pipeline parameters (reference utils/load_data.py, data_loader/loader.py)."""

    data_path: str = "data"
    las_plots_folder_path: str = "data/placettes_dataset/las_classes"
    plots_pickled_dataset_path: str = "data/placettes_dataset/prepared/plots_dataset.pkl"
    gt_file_path: str = "data/placettes_dataset/placettes_metadata.csv"
    corrected_gt_file_path: str = (
        "data/placettes_dataset_correction/placettes_metadata_correction.csv"
    )
    las_parcels_folder_path: str = "data/parcelles_dataset_20m"
    parcel_shapefile_path: str = "data/parcelles_dataset_20m/input/parcels.shp"
    znorm_radius_in_meters: float = 1.5
    min_points_per_plot: int = 50  # inference/prepare_utils.py:67-69
    min_points_for_pseudo_labelling: int = 2000  # inference/predict_utils.py:65
    prefetch_batches: int = 2
    loader_workers: int = 2
    # host->device transfer dtype for cloud/xyz batches: "float32" (exact)
    # or "float16" (halves the transfer bytes; features are already
    # [0,1]-rescaled and xyz spans +-10 m, so fp16 costs ~1e-3 relative —
    # below the augmentation noise). Arrays are cast back to f32 on device.
    transfer_dtype: str = "float32"
    # Upload the whole training fold to HBM once and run augmentation +
    # subsampling + all steps of an epoch as ONE jitted scan (see
    # data/device_dataset.py; composes with the DP mesh when the batch
    # divides over it). "auto" (default) enables it when the estimated
    # fold footprint is < device_resident_max_bytes — at reference scale
    # (110 plots x ~10.5k rows) that is ~60 MB of HBM for a 9x epoch
    # speedup (RESULTS.md); "true"/"false" force it.
    device_resident: str = "auto"
    device_resident_max_bytes: int = 2_000_000_000
    # Parcel predict chains this many batches into ONE jitted program
    # (lax.scan over a stacked (chain, B, N, F) tile stack): through the
    # axon relay every separate program call pays a fixed ~33 ms, so
    # per-batch dispatch caps a parcel at ~30 calls/s regardless of device
    # speed. The tail chunk is padded with all-invalid batches to keep a
    # single compiled program shape. 1 disables chaining (per-batch path).
    predict_chain: int = 8
    # Write the per-plot intermediate GeoTIFFs (the reference's
    # intermediate_tiff_folder artifacts, predict.py:113-126). Off by
    # default: the drain loop merges in-memory tiles and only the merged
    # parcel tif — the worklist done-marker — hits disk.
    keep_plot_tiffs: bool = False


@dataclass(frozen=True)
class Config:
    mode: str = "PROD"  # DEV shrinks everything for smoke tests (config.py:5-12)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    experiments_path: str = "experiments"
    comet_disabled: bool = True  # pluggable metric sink instead of Comet
    plot_geotiff_file: bool = False
    log_embeddings: bool = False
    normalize_cm: str = "true"
    log_confusion_matrix_frequency: int = 10
    plot_name_to_visualize_during_training: Tuple[str, ...] = (
        "Releve_Lidar_F68",
        "2021_POINT_OBS66",
        "2021_POINT_OBS7",
        "POINT_OBS106",
    )

    def as_dev(self) -> "Config":
        """DEV profile: 2 epochs, eval every epoch (reference config.py:88-92)."""
        return replace(
            self,
            mode="DEV",
            train=replace(
                self.train,
                n_epoch=2,
                n_epoch_test=1,
                epoch_to_start_early_stop=1,
                patience_in_epochs=1,
            ),
            log_confusion_matrix_frequency=1,
        )


def default_config(mode: str = "PROD") -> Config:
    cfg = Config()
    if mode.upper() == "DEV":
        cfg = cfg.as_dev()
    return cfg


def _add_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--mode", default="PROD", type=str, help="DEV or PROD")
    p.add_argument("--n_epoch", type=int)
    p.add_argument("--n_epoch_test", type=int)
    p.add_argument("--epoch_to_start_early_stop", type=int)
    p.add_argument("--patience_in_epochs", type=int)
    p.add_argument("--use_early_stopping", action="store_true", default=None)
    p.add_argument("--lr", type=float)
    p.add_argument("--lr_decay", type=float)
    p.add_argument("--step_size", type=int)
    p.add_argument("--wd", type=float)
    p.add_argument("--batch_size", type=int)
    p.add_argument("--folds", type=int)
    p.add_argument("--m", type=float)
    p.add_argument("--e", type=float)
    p.add_argument("--subsample_size", type=int)
    p.add_argument("--diam_pix", type=int)
    p.add_argument("--diam_meters", type=int)
    p.add_argument("--data_path", type=str)
    p.add_argument("--las_plots_folder_path", type=str)
    p.add_argument("--gt_file_path", type=str)
    p.add_argument("--corrected_gt_file_path", type=str)
    p.add_argument("--las_parcels_folder_path", type=str)
    p.add_argument("--parcel_shapefile_path", type=str)
    p.add_argument("--plots_pickled_dataset_path", type=str)
    p.add_argument("--experiments_path", type=str)
    p.add_argument("--PT_model_id", type=str, default="")
    p.add_argument("--inference_model_id", type=str, default="")
    p.add_argument("--plot_geotiff_file", action="store_true", default=None)
    p.add_argument("--log_embeddings", action="store_true", default=None)
    p.add_argument("--use_pallas", type=lambda s: s.lower() in ("1", "true"), default=None)
    p.add_argument("--transfer_dtype", choices=["float32", "float16"])
    p.add_argument(
        "--device_resident",
        choices=["auto", "true", "false"],
        default=None,
    )
    p.add_argument("--predict_chain", type=int, default=None)
    p.add_argument(
        "--keep_plot_tiffs", action="store_const", const=True, default=None
    )
    p.add_argument("--min_points_for_pseudo_labelling", type=int, default=None)
    # namespace-only (consumed by cli/main): shard the POINT axis across
    # devices for training — the context-parallel analogue for dense clouds
    # (parallel/point_sharded.make_point_sharded_train_step)
    p.add_argument("--point_sharded", action="store_true")


def parse_config(argv: Optional[list] = None) -> Tuple[Config, argparse.Namespace]:
    """Build a Config from CLI flags, mirroring the reference's two-stage parse
    (config.py:5-12): --mode first selects the profile, then overrides apply."""
    p = argparse.ArgumentParser(description="stratanet2_tpu")
    _add_flags(p)
    ns, _ = p.parse_known_args(argv)
    cfg = default_config(ns.mode)

    def _ov(dc, names):
        kw = {}
        for n in names:
            v = getattr(ns, n, None)
            if v is not None and hasattr(dc, n):
                kw[n] = v
        return replace(dc, **kw) if kw else dc

    cfg = replace(
        cfg,
        model=_ov(cfg.model, ["subsample_size", "diam_pix", "diam_meters", "use_pallas"]),
        train=_ov(
            cfg.train,
            [
                "folds", "wd", "batch_size", "n_epoch", "n_epoch_test",
                "epoch_to_start_early_stop", "use_early_stopping",
                "patience_in_epochs", "lr", "step_size", "lr_decay", "m", "e",
            ],
        ),
        data=_ov(
            cfg.data,
            [
                "data_path", "las_plots_folder_path", "gt_file_path",
                "corrected_gt_file_path", "las_parcels_folder_path",
                "parcel_shapefile_path", "plots_pickled_dataset_path",
                "transfer_dtype", "device_resident", "predict_chain",
                "keep_plot_tiffs", "min_points_for_pseudo_labelling",
            ],
        ),
    )
    if ns.experiments_path:
        cfg = replace(cfg, experiments_path=ns.experiments_path)
    if ns.plot_geotiff_file is not None:
        cfg = replace(cfg, plot_geotiff_file=ns.plot_geotiff_file)
    if ns.log_embeddings is not None:
        cfg = replace(cfg, log_embeddings=ns.log_embeddings)
    return cfg, ns
