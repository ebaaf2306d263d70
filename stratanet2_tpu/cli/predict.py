"""Prediction entry point (reference predict.py): per-parcel batched TPU
inference producing fused coverage GeoTIFFs (--task inference) or
pseudo-labels for SSL pretraining (--task pseudo_labelling)."""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import jax
import jax.numpy as jnp

from stratanet2_tpu.config import parse_config
from stratanet2_tpu.inference.predict import (
    make_predict_step,
    predict_parcel,
    update_shapefile_with_predictions,
)
from stratanet2_tpu.inference.shapefile_io import read_shapefile
from stratanet2_tpu.models import PointNet2Params
from stratanet2_tpu.utils import checkpoint as ckpt
from stratanet2_tpu.utils.experiment import create_logger, setup_experiment_folder
from stratanet2_tpu.utils.worklist import get_unprocessed_files, stem


def main(argv=None):
    from stratanet2_tpu.utils.experiment import enable_compilation_cache

    from stratanet2_tpu.utils.backendprobe import honor_platform_env

    honor_platform_env()
    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="predict", add_help=False)
    parser.add_argument(
        "--task", default="inference", choices=["inference", "pseudo_labelling"]
    )
    parser.add_argument(
        "--point_sharded", action="store_true",
        help="shard the POINT axis across devices (context-parallel "
        "analogue for dense clouds) instead of the batch axis; requires "
        "N, k1 and n_centroids1 divisible by the device count",
    )
    ns_local, rest = parser.parse_known_args(argv)
    cfg, ns = parse_config(argv)

    stats_path = setup_experiment_folder(cfg.experiments_path, ns_local.task, cfg.mode)
    logger = create_logger(stats_path)
    is_pseudo = ns_local.task == "pseudo_labelling"

    model_id = ns.inference_model_id
    assert model_id, "--inference_model_id required (experiment id of checkpoint)"
    model_path = ckpt.find_checkpoint_by_experiment(cfg.experiments_path, model_id)
    payload = ckpt.load_checkpoint(model_path)
    model = PointNet2Params(
        jax.tree_util.tree_map(jnp.asarray, payload["params"]),
        jax.tree_util.tree_map(jnp.asarray, payload["model_state"]),
    )
    logger.info("Loaded model %s from %s", model_id, model_path)

    input_folder = os.path.join(cfg.data.las_parcels_folder_path, "prepared")
    output_folder = os.path.join(
        cfg.data.las_parcels_folder_path, ns_local.task, model_id
    )
    os.makedirs(output_folder, exist_ok=True)

    shp = None
    if not is_pseudo:
        shp = read_shapefile(cfg.data.parcel_shapefile_path)

    mesh = None
    n_dev = len(jax.devices())
    predict_step = None
    if ns_local.point_sharded and n_dev == 1:
        logger.warning(
            "--point_sharded ignored: only one device visible; "
            "running the plain predict step"
        )
    if ns_local.point_sharded and n_dev > 1:
        from stratanet2_tpu.inference.predict import make_point_sharded_predict_step

        try:
            predict_step = make_point_sharded_predict_step(cfg, n_dev)
            logger.info("Using %d-device POINT-sharded inference mesh", n_dev)
        except ValueError as e:
            logger.warning("point sharding unavailable (%s); falling back", e)
    predict_program = None
    if predict_step is None:
        if n_dev > 1 and cfg.train.batch_size % n_dev == 0:
            from stratanet2_tpu.parallel import make_mesh

            mesh = make_mesh()
            logger.info("Using %d-device data-parallel inference mesh", n_dev)
        if cfg.data.predict_chain > 1:
            # chained one-program predict (fixed ~33 ms relay cost per
            # program call amortizes over predict_chain batches)
            from stratanet2_tpu.inference.predict import make_predict_program

            predict_program = make_predict_program(cfg, mesh=mesh)
        else:
            predict_step = make_predict_step(cfg, mesh=mesh)
    max_batches = 10 if cfg.mode == "DEV" else None

    # Parcels whose prediction wrote NO output this run (e.g. every plot
    # invalid -> "Nothing to merge"): the worklist diff would re-offer them
    # forever, so track attempts and skip.
    attempted: set = set()
    while True:
        unprocessed = [
            f
            for f in get_unprocessed_files(input_folder, output_folder)
            if f.endswith(".pkl") and stem(f) not in attempted
        ]
        if not unprocessed:
            logger.info("No more prepared parcel to predict on in %s", input_folder)
            break
        logger.info("N=%d prepared parcels to process.", len(unprocessed))
        filename = unprocessed.pop(0)
        parcel_id = stem(filename)
        attempted.add(parcel_id)

        with open(filename, "rb") as f:
            dataset = pickle.load(f)
        parcel_shape = shp.get_shape(parcel_id) if shp is not None else None
        predict_parcel(
            model, dataset, cfg, parcel_id, output_folder,
            task=ns_local.task, parcel_shape=parcel_shape,
            predict_step=predict_step, predict_program=predict_program,
            max_batches=max_batches,
        )
        if cfg.mode == "DEV":
            break

    if not is_pseudo:
        update_shapefile_with_predictions(
            cfg.data.parcel_shapefile_path, output_folder
        )


if __name__ == "__main__":
    main(sys.argv[1:])
