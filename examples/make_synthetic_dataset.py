"""Generate a complete synthetic dataset tree so the full pipeline can be
exercised without the (private) IGN field data: plot LAS files + ground-truth
CSV + a parcel LAS + its shapefile.

Usage:
  python examples/make_synthetic_dataset.py --out data_synth --n_plots 30
  python -m stratanet2_tpu.cli.main --mode DEV \
      --las_plots_folder_path data_synth/placettes_dataset/las_classes \
      --gt_file_path data_synth/placettes_dataset/placettes_metadata.csv \
      --corrected_gt_file_path data_synth/placettes_dataset/placettes_metadata.csv \
      --plots_pickled_dataset_path data_synth/placettes_dataset/prepared/plots.pkl \
      --las_parcels_folder_path data_synth/parcelles_dataset_20m \
      --parcel_shapefile_path data_synth/parcelles_dataset_20m/input/parcels.shp
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd


from stratanet2_tpu.utils.synthetic import cloud_to_las_fields, make_plot_cloud


def write_cloud_las(path, c):
    from stratanet2_tpu.data.las import write_las

    write_las(path, cloud_to_las_fields(c))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data_synth")
    p.add_argument("--n_plots", type=int, default=30)
    p.add_argument("--points_per_plot", type=int, default=4000)
    p.add_argument("--seed", type=int, default=0)
    ns = p.parse_args()
    rng = np.random.default_rng(ns.seed)

    las_dir = os.path.join(ns.out, "placettes_dataset", "las_classes")
    os.makedirs(las_dir, exist_ok=True)
    bins_pct = [0, 10, 25, 33, 50, 75, 90, 100]
    rows = []
    for i in range(ns.n_plots):
        c = make_plot_cloud(rng, n=ns.points_per_plot, center=(1000 + 40 * i, 2000))
        write_cloud_las(os.path.join(las_dir, f"Plot_{i:03d}.las"), c)
        rows.append(
            {
                "nom": f"Plot_{i:03d}",
                "COUV_BASSE": int(rng.choice(bins_pct)),
                "COUV_INTER": int(rng.choice(bins_pct)),
                "COUV_HAUTE": int(rng.choice(bins_pct)),
            }
        )
    pd.DataFrame(rows).to_csv(
        os.path.join(ns.out, "placettes_dataset", "placettes_metadata.csv"), index=False
    )

    # one 80x80 m parcel + shapefile
    from stratanet2_tpu.inference import shapefile_io as S
    from stratanet2_tpu.inference.polygons import Polygon

    parcels = os.path.join(ns.out, "parcelles_dataset_20m", "input")
    os.makedirs(parcels, exist_ok=True)
    clouds = [
        make_plot_cloud(rng, n=5000, center=(cx, cy), radius=14)
        for cx in (15, 40, 65)
        for cy in (15, 40, 65)
    ]
    write_cloud_las(os.path.join(parcels, "PARCEL_000.las"), np.concatenate(clouds, 1))
    shape = Polygon([np.array([[0, 0], [80, 0], [80, 80], [0, 80], [0, 0]], float)])
    S.write_shapefile(
        os.path.join(parcels, "parcels.shp"),
        S.Shapefile(
            fields=[S.FieldSpec("ID", "C", 16)],
            shape_records=[S.ShapeRecord(shape, {"ID": "PARCEL_000"})],
        ),
    )
    print(f"Synthetic dataset written to {ns.out}: {ns.n_plots} plots + 1 parcel")


if __name__ == "__main__":
    main()
