"""Per-stage profile of the training step at the reference PROD geometry
(b=20 x 10000 points; reference learning/train.py:29-79), VERDICT round-1
item 8. Times each jitted sub-stage by chaining iterations inside one
program and fetching a scalar (see CLAUDE.md: block_until_ready does not
synchronize through the axon relay).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_train.py
"""

from __future__ import annotations

import time
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from stratanet2_tpu.config import Config


def timeit(fn, *args, iters=10, trials=3):
    """fn must return a scalar; chained externally via its own fori_loop."""
    float(fn(*args))  # compile + warmup
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def chain(fn, iters):
    """Wrap fn(x, *rest)->scalar into `iters` data-dependent repetitions."""

    @jax.jit
    def many(x, *rest):
        def body(_, carry):
            acc, x_ = carry
            s = fn(x_, *rest)
            return acc + s, x_ + s * 1e-20
        acc, _ = jax.lax.fori_loop(0, iters, body, (0.0, x))
        return acc

    return many


def main():
    cfg = Config()  # PROD geometry: subsample_size=10000, batch 20
    mcfg = cfg.model
    b, n = cfg.train.batch_size, mcfg.subsample_size
    c1, c2 = mcfg.n_centroids1, mcfg.n_centroids2
    iters = 10

    rng = np.random.default_rng(0)
    cloud = jnp.asarray(rng.uniform(0, 1, (b, n, 10)), jnp.float32)
    xyz = jnp.asarray(rng.uniform(-10, 10, (b, n, 3)), jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (b, 4)), jnp.float32)
    feats = cloud[..., 2:]

    from stratanet2_tpu.ops import farthest_point_sampling
    from stratanet2_tpu.ops.pallas_kernels import (
        ball_query_grouped_pallas,
        knn_interpolate_pallas,
    )
    from stratanet2_tpu.models import init_pointnet2, pointnet2_forward
    from stratanet2_tpu.models.pointnet2 import _gather, _sa_module

    model = init_pointnet2(jax.random.PRNGKey(0), mcfg)
    rows = []

    # --- FPS stages
    def fps1(x):
        return farthest_point_sampling(x, c1).sum().astype(jnp.float32)

    rows.append(("fps1 (10000->2500)", timeit(chain(fps1, iters), xyz, iters=iters)))

    sub = xyz[:, :c1]

    def fps2(x):
        return farthest_point_sampling(x, c2).sum().astype(jnp.float32)

    rows.append(("fps2 (2500->625)", timeit(chain(fps2, iters), sub, iters=iters)))

    # --- ball query stages
    cent1 = _gather(xyz, farthest_point_sampling(xyz, c1))
    cent2 = _gather(sub, farthest_point_sampling(sub, c2))

    def bq1(x):
        idx, m = ball_query_grouped_pallas(cent1, x, mcfg.r1, mcfg.k1)
        return idx.sum().astype(jnp.float32) * 1e-9

    rows.append(("ball_query1 (2500x10000, K=32)", timeit(chain(bq1, iters), xyz, iters=iters)))

    def bq2(x):
        idx, m = ball_query_grouped_pallas(cent2, x, mcfg.r2, mcfg.k2)
        return idx.sum().astype(jnp.float32) * 1e-9

    rows.append(("ball_query2 (625x2500, K=64)", timeit(chain(bq2, iters), sub, iters=iters)))

    # --- SA modules, forward only, train=True (unfused path) vs eval
    p, s = model.params, model.state

    def sa1_train(x):
        out, cent, _ = _sa_module(
            p["sa1"], s["sa1"], feats, x, c1, mcfg.r1, mcfg.k1,
            True, jnp.float32, mcfg.use_pallas, mcfg.knn_chunk, "grouped",
        )
        return out.sum()

    rows.append(("SA1 fwd train (edge MLP materialized)", timeit(chain(sa1_train, iters), xyz, iters=iters)))

    def sa1_eval(x):
        out, cent, _ = _sa_module(
            p["sa1"], s["sa1"], feats, x, c1, mcfg.r1, mcfg.k1,
            False, jnp.float32, mcfg.use_pallas, mcfg.knn_chunk, "grouped",
        )
        return out.sum()

    rows.append(("SA1 fwd eval (fused kernel)", timeit(chain(sa1_eval, iters), xyz, iters=iters)))

    # SA1 fwd+bwd
    def sa1_loss(params, x):
        out, _, _ = _sa_module(
            params, s["sa1"], feats, x, c1, mcfg.r1, mcfg.k1,
            True, jnp.float32, mcfg.use_pallas, mcfg.knn_chunk, "grouped",
        )
        return out.sum()

    def sa1_grad(x):
        g = jax.grad(sa1_loss)(p["sa1"], x)
        return sum(v.sum() for v in jax.tree_util.tree_leaves(g))

    rows.append(("SA1 fwd+bwd train", timeit(chain(sa1_grad, iters), xyz, iters=iters)))

    # --- kNN interpolate FP stages fwd and fwd+bwd
    x2 = jnp.asarray(rng.uniform(-1, 1, (b, c2, 64)), jnp.float32)
    x1 = jnp.asarray(rng.uniform(-1, 1, (b, c1, 34)), jnp.float32)

    def fp2(x):
        return knn_interpolate_pallas(x, cent2, cent1, 3).sum()

    rows.append(("kNN FP2 (625->2500, F=64) fwd", timeit(chain(fp2, iters), x2, iters=iters)))

    def fp1(x):
        return knn_interpolate_pallas(x, cent1, xyz, 3).sum()

    rows.append(("kNN FP1 (2500->10000, F=34) fwd", timeit(chain(fp1, iters), x1, iters=iters)))

    def fp1_grad(x):
        g = jax.grad(lambda y: knn_interpolate_pallas(y, cent1, xyz, 3).sum())(x)
        return g.sum()

    rows.append(("kNN FP1 fwd+bwd", timeit(chain(fp1_grad, iters), x1, iters=iters)))

    # --- full forward train vs eval
    def fwd_train(x):
        cov, proba, _ = pointnet2_forward(model, feats, x, mcfg, train=True)
        return cov.sum()

    rows.append(("full forward train=True", timeit(chain(fwd_train, iters), xyz, iters=iters)))

    def fwd_eval(x):
        cov, proba, _ = pointnet2_forward(model, feats, x, mcfg, train=False)
        return cov.sum()

    rows.append(("full forward train=False", timeit(chain(fwd_eval, iters), xyz, iters=iters)))

    # --- full train step
    from stratanet2_tpu.learning.kde import fit_kde_mixture
    from stratanet2_tpu.learning.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    kde = fit_kde_mixture(np.random.default_rng(0).uniform(0, 20, 10000))
    opt = make_optimizer(cfg, steps_per_epoch=10)
    ts = init_train_state(cfg, opt, seed=0)
    step = make_train_step(cfg, opt, kde)
    ts, comps = step(ts, cloud, xyz, gt, jax.random.PRNGKey(0))
    float(comps["total_loss"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(8):
            ts, comps = step(ts, cloud, xyz, gt, jax.random.PRNGKey(0))
        float(comps["total_loss"])
        best = min(best, (time.perf_counter() - t0) / 8)
    rows.append(("FULL TRAIN STEP (fwd+proj+loss+bwd+adam)", best))

    print(f"\nPROD geometry b={b} x n={n}, backend={jax.default_backend()}")
    print(f"{'stage':<45} {'ms':>8}")
    for name, dt in rows:
        print(f"{name:<45} {dt*1e3:>8.2f}")


if __name__ == "__main__":
    main()
