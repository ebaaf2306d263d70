"""Quantify the fixed-K neighbor-cap deviation vs the reference's selection.

The one deliberate semantic deviation of this framework (docs/PARITY.md
§neighbors): SA neighborhoods keep a fixed K (PROD k1=32 / k2=64) per
centroid, where the reference keeps an arbitrary <=2000-neighbor subset of
the full ball (/root/reference/model/point_net2.py:23-25). This script
measures the resulting plot-level coverage deviation on clouds at the PROD
geometry (N=10000), same weights both ways:

  oracle  : reference-semantics forward (utils.reference_oracle), cap 2000
  ours    : pointnet2_forward at PROD caps, both ball_query_method policies

Usage: python scripts/neighbor_cap_study.py [--n_clouds 20] [--n 10000]
Writes one JSON line per configuration; paste the summary into
docs/PARITY.md (VERDICT r2 next-round item 1).
"""

from __future__ import annotations

import argparse
import json
from dataclasses import replace

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_clouds", type=int, default=20)
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--seeds", type=int, default=3, help="weight seeds")
    args = ap.parse_args()

    from stratanet2_tpu.config import Config
    from stratanet2_tpu.models import pointnet2_forward
    from stratanet2_tpu.ops import plotwise_coverages
    from stratanet2_tpu.utils.reference_oracle import (
        make_reference_state_dict,
        reference_forward,
        reference_plotwise_coverages,
    )
    from stratanet2_tpu.utils.torch_import import params_from_torch_state_dict

    base = Config().model
    mcfg = replace(base, subsample_size=args.n, use_pallas=False)

    rng = np.random.default_rng(0)

    def synth(b):
        theta = rng.uniform(0, 2 * np.pi, (b, args.n))
        r = 10.0 * np.sqrt(rng.uniform(0, 1, (b, args.n)))
        z = rng.uniform(0, 1.5, (b, args.n)) ** 2 * 10
        xyz = np.stack([r * np.cos(theta), r * np.sin(theta), z], -1).astype(
            np.float32
        )
        feats = rng.uniform(0, 1, (b, args.n, 8)).astype(np.float32)
        feats[..., 0] = (z / mcfg.z_max).astype(np.float32)
        return feats, xyz

    per_policy = {"grouped": [], "nearest": []}
    clouds_per_seed = -(-args.n_clouds // args.seeds)
    for ws in range(args.seeds):
        sd = make_reference_state_dict(seed=100 + ws)
        model = params_from_torch_state_dict(sd, mcfg)
        feats, xyz = synth(clouds_per_seed)
        xy = (xyz[..., :2] / 10.0).astype(np.float32)

        cov_ref, _ = reference_forward(
            sd, feats, xyz,
            n_centroids1=mcfg.n_centroids1, n_centroids2=mcfg.n_centroids2,
            r1=mcfg.r1, r2=mcfg.r2, max_num_neighbors=2000,
        )
        pl_ref = reference_plotwise_coverages(cov_ref, xy, mcfg.diam_pix)

        for policy in ("grouped", "nearest"):
            m = replace(mcfg, ball_query_method=policy)
            cov, _, _ = pointnet2_forward(
                model, jnp.asarray(feats), jnp.asarray(xyz), m, train=False
            )
            pl = np.asarray(
                plotwise_coverages(cov, jnp.asarray(xy), mcfg.diam_pix)
            )
            per_policy[policy].append(np.abs(pl - pl_ref))
            print(
                json.dumps(
                    {
                        "weight_seed": 100 + ws,
                        "policy": policy,
                        "clouds": int(pl.shape[0]),
                        "mean_abs_dev": float(np.mean(np.abs(pl - pl_ref))),
                        "max_abs_dev": float(np.max(np.abs(pl - pl_ref))),
                    }
                ),
                flush=True,
            )

    for policy, devs in per_policy.items():
        d = np.concatenate(devs, axis=0)  # (clouds, 4)
        print(
            json.dumps(
                {
                    "summary": policy,
                    "k1": mcfg.k1,
                    "k2": mcfg.k2,
                    "clouds": int(d.shape[0]),
                    "mean_abs_dev": float(d.mean()),
                    "max_abs_dev": float(d.max()),
                    "per_stratum_mean": [float(v) for v in d.mean(0)],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
