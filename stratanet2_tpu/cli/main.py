"""Cross-validated training entry point (reference main.py).

Usage: python -m stratanet2_tpu.cli.main --mode DEV --las_plots_folder_path ...
"""

from __future__ import annotations

import os
import sys

from stratanet2_tpu.config import parse_config
from stratanet2_tpu.data.dataset import prepare_and_save_plots_dataset
from stratanet2_tpu.learning.crossval import cross_validate
from stratanet2_tpu.learning.kde import (
    fit_kde_mixture_from_dataset,
    plot_kde_mixture,
)
from stratanet2_tpu.utils.experiment import (
    MetricSink,
    create_logger,
    setup_experiment_folder,
)


def main(argv=None):
    from stratanet2_tpu.utils.experiment import enable_compilation_cache

    from stratanet2_tpu.utils.backendprobe import honor_platform_env

    honor_platform_env()
    enable_compilation_cache()
    cfg, _ns = parse_config(argv)
    stats_path = setup_experiment_folder(cfg.experiments_path, "learning", cfg.mode)
    logger = create_logger(stats_path)
    sink = MetricSink(stats_path)
    sink.log_parameters({"cfg": str(cfg)})
    logger.info("cfg: %s", cfg)

    dataset = prepare_and_save_plots_dataset(cfg, cfg.data.corrected_gt_file_path)
    if not dataset:
        raise SystemExit(
            f"No plots found: no .las files in {cfg.data.las_plots_folder_path} "
            f"matching names in {cfg.data.corrected_gt_file_path}"
        )
    logger.info("Dataset contains %d plots.", len(dataset))

    kde = fit_kde_mixture_from_dataset(dataset)
    for x_lim in (3, 25):
        plot_kde_mixture(
            kde,
            os.path.join(stats_path, f"img/kde_mixture/kde_mixture_x_lim={x_lim}.png"),
            x_lim=x_lim,
        )

    # warm start from an SSL-pretrained checkpoint (--PT_model_id,
    # reference learning/train.py:212-223)
    pretrained_path = None
    if _ns.PT_model_id:
        from stratanet2_tpu.utils.checkpoint import find_checkpoint_by_experiment

        pretrained_path = find_checkpoint_by_experiment(
            cfg.experiments_path, _ns.PT_model_id
        )
        logger.info("Warm-starting from pretrained model %s", pretrained_path)

    # data-parallel over all local devices when the batch divides evenly;
    # --point_sharded shards the POINT axis instead (context-parallel
    # training for dense clouds, parallel/point_sharded.py)
    import jax

    mesh = None
    n_dev = len(jax.devices())
    point_sharded = _ns.point_sharded
    if point_sharded:
        from stratanet2_tpu.learning.train import point_sharded_eligible

        ok, why = point_sharded_eligible(cfg)
        if not ok:
            logger.warning(
                "--point_sharded unavailable (%s); falling back to "
                "data-parallel", why,
            )
            point_sharded = False
    if (
        not point_sharded
        and n_dev > 1
        and cfg.train.batch_size % n_dev == 0
    ):
        from stratanet2_tpu.parallel import make_mesh

        mesh = make_mesh()
        logger.info("Using %d-device data-parallel mesh", n_dev)

    cross_validate(
        dataset, cfg, kde, stats_path, sink,
        pretrained_path=pretrained_path, mesh=mesh,
        point_sharded=point_sharded,
    )
    sink.close()
    return stats_path


if __name__ == "__main__":
    main(sys.argv[1:])
