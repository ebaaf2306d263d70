"""TPU smoke validation: runs the fused kernels and a DEV cross-validation
end-to-end on the attached TPU chip with synthetic data.

(The pytest suite pins itself to CPU with 8 virtual devices for mesh tests;
this script is the hardware-in-the-loop counterpart.)

Usage: python scripts/tpu_smoke.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import pandas as pd

    assert jax.default_backend() == "tpu", f"not on TPU: {jax.default_backend()}"
    from synthetic import make_plot_cloud

    from stratanet2_tpu.data.las import write_las
    from stratanet2_tpu.cli.main import main as train_main

    root = tempfile.mkdtemp(prefix="tpu_smoke_")
    las_dir = os.path.join(root, "las")
    os.makedirs(las_dir)
    rng = np.random.default_rng(0)
    rows = []
    bins_pct = [0, 10, 25, 33, 50, 75, 90, 100]
    for i in range(15):
        c = make_plot_cloud(rng, n=3000, center=(1000 + 40 * i, 2000))
        write_las(
            os.path.join(las_dir, f"P{i:02d}.las"),
            {
                "x": c[0], "y": c[1], "z": c[2], "red": c[3], "green": c[4],
                "blue": c[5], "nir": c[6], "intensity": c[7],
                "return_num": c[8], "num_returns": c[9],
            },
        )
        rows.append(
            {
                "nom": f"P{i:02d}",
                "COUV_BASSE": int(rng.choice(bins_pct)),
                "COUV_INTER": int(rng.choice(bins_pct)),
                "COUV_HAUTE": int(rng.choice(bins_pct)),
            }
        )
    pd.DataFrame(rows).to_csv(os.path.join(root, "gt.csv"), index=False)

    t0 = time.time()
    stats = train_main(
        [
            "--mode", "DEV", "--subsample_size", "4096", "--batch_size", "4",
            "--las_plots_folder_path", las_dir,
            "--plots_pickled_dataset_path", os.path.join(root, "prepared/plots.pkl"),
            "--gt_file_path", os.path.join(root, "gt.csv"),
            "--corrected_gt_file_path", os.path.join(root, "gt.csv"),
            "--experiments_path", os.path.join(root, "experiments"),
        ]
    )
    print(f"TPU smoke OK in {time.time() - t0:.1f}s -> {stats}")
    for must in (
        "PCC_model_fold_n=1.pt",
        "metrics.jsonl",
        "PCC_inference_all_placettes_relabeled_summary.csv",
    ):
        assert os.path.exists(os.path.join(stats, must)), must
    print("all artifacts present")


if __name__ == "__main__":
    main()
