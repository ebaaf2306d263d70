"""Dump the TPU-optimized HLO of the eval forward (or train step) via AOT
compile, to attribute relayout ops (copy/pad) seen in scripts/trace_raw.py
to their producing/consuming HLO instructions.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/dump_hlo.py \
      [--mode eval|train] [--batch 32] [--subsample 4096] [--out /tmp/eval.hlo]
"""

from __future__ import annotations

import argparse
from dataclasses import replace


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="eval")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--subsample", type=int, default=4096)
    ap.add_argument("--out", default="/tmp/eval.hlo")
    ns = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from stratanet2_tpu.config import Config
    from stratanet2_tpu.models import init_pointnet2, pointnet2_forward

    cfg = Config()
    mcfg = replace(cfg.model, subsample_size=ns.subsample)
    model = init_pointnet2(jax.random.PRNGKey(0), mcfg)
    b, n = ns.batch, ns.subsample
    cloud = jnp.zeros((b, n, mcfg.n_input_feats - 2), jnp.float32)
    xyz = jnp.zeros((b, n, 3), jnp.float32)

    if ns.mode == "eval":

        def fn(params, state, cloud, xyz):
            cov, proba, _ = pointnet2_forward(
                type(model)(params, state), cloud, xyz, mcfg, train=False
            )
            return cov.sum() + proba.sum()

    else:
        raise SystemExit("only eval supported for now")

    lowered = jax.jit(fn).lower(model.params, model.state, cloud, xyz)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(ns.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {ns.out}")


if __name__ == "__main__":
    main()
