"""Fused TRAIN-path SA interior vs the unfused XLA composition.

`sa_train_fused` must reproduce the gather + masked-BN MLP + masked-max
composition (the `_sa_module` training path) exactly: forward values, BN
batch statistics, and gradients wrt every differentiable input (VERDICT r2
next-round item 2). Runs in Pallas interpret mode off-TPU.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stratanet2_tpu.models import nn
from stratanet2_tpu.ops.pallas_kernels import (
    ball_query_grouped_pallas,
    sa_train_fused,
)


def _unfused(q, cterm, scales, biases, w2, b2, idx, mask):
    """The exact composition the fused kernels replace, idx/mask in the
    (B, K, C) layout. Returns (out, [(mean, biased_var), ...])."""
    b, n, c1 = q.shape
    flat = q.reshape(b * n, c1)
    off = (jnp.arange(b) * n)[:, None, None]
    sel = jnp.take(flat, (idx + off).reshape(-1), axis=0).reshape(
        idx.shape + (c1,)
    )  # (B, K, C, C1)
    h = jax.nn.relu(sel - cterm[:, None, :, :])
    stats = []

    def bn(x, gamma, beta):
        m = mask.astype(jnp.float32)[..., None]
        cnt = jnp.maximum(jnp.sum(m), 1.0)
        mean = jnp.sum(x * m, axis=(0, 1, 2)) / cnt
        var = jnp.maximum(
            jnp.sum(x * x * m, axis=(0, 1, 2)) / cnt - mean * mean, 0.0
        )
        stats.append((mean, var))
        return (x - mean) * jax.lax.rsqrt(var + nn.BN_EPS) * gamma + beta

    h = bn(h, scales[0], biases[0])
    if w2 is not None:
        h = jax.nn.relu(h @ w2 + b2)
        h = bn(h, scales[1], biases[1])
    h = jnp.where(mask[..., None], h, -1e30)
    return jnp.max(h, axis=1), stats


def _setup(rng, b=2, n=96, c=24, k=8, c1=6, c2=None, radius=1.2):
    pos = jnp.asarray(rng.uniform(-2, 2, (b, n, 3)).astype(np.float32))
    cent = pos[:, :c]
    idx, mask = ball_query_grouped_pallas(cent, pos, radius, k, layout="kc")
    q = jnp.asarray(rng.normal(size=(b, n, c1)).astype(np.float32))
    cterm = jnp.asarray(rng.normal(size=(b, c, c1)).astype(np.float32) * 0.3)
    g1 = jnp.asarray(rng.uniform(0.5, 1.5, c1).astype(np.float32))
    g1 = g1.at[0].set(-0.7)  # exercise the gamma<0 min-routing
    b1 = jnp.asarray(rng.normal(size=c1).astype(np.float32) * 0.2)
    if c2 is None:
        return q, cterm, (g1,), (b1,), None, None, idx, mask
    w2 = jnp.asarray(rng.normal(size=(c1, c2)).astype(np.float32) * 0.5)
    b2 = jnp.asarray(rng.normal(size=c2).astype(np.float32) * 0.2)
    g2 = jnp.asarray(rng.uniform(0.5, 1.5, c2).astype(np.float32))
    g2 = g2.at[1].set(-0.9)
    b2n = jnp.asarray(rng.normal(size=c2).astype(np.float32) * 0.2)
    return q, cterm, (g1, g2), (b1, b2n), w2, b2, idx, mask


@pytest.fixture
def rng():
    return np.random.default_rng(42)


class TestSATrainFused:
    @pytest.mark.parametrize("c2", [None, 10])
    def test_forward_and_stats_match_unfused(self, rng, c2):
        q, cterm, scales, biases, w2, b2, idx, mask = _setup(rng, c2=c2)
        out_f, stats_f, me = sa_train_fused(
            q, cterm, scales, biases, w2, b2, idx, mask, k=idx.shape[1]
        )
        out_u, stats_u = _unfused(q, cterm, scales, biases, w2, b2, idx, mask)
        assert float(me) == float(jnp.sum(mask))
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_u), rtol=2e-5, atol=2e-5
        )
        for (mf, vf), (mu, vu) in zip(stats_f, stats_u):
            np.testing.assert_allclose(np.asarray(mf), np.asarray(mu), atol=2e-5)
            np.testing.assert_allclose(np.asarray(vf), np.asarray(vu), atol=2e-5)

    @pytest.mark.parametrize("c2", [None, 10])
    def test_gradients_match_unfused(self, rng, c2):
        q, cterm, scales, biases, w2, b2, idx, mask = _setup(rng, c2=c2)
        cw = jnp.asarray(
            rng.normal(size=(2, 24, c2 if c2 else 6)).astype(np.float32)
        )

        if c2 is None:

            def loss_f(q, ct, g1, b1):
                out, _, _ = sa_train_fused(
                    q, ct, (g1,), (b1,), None, None, idx, mask, k=idx.shape[1]
                )
                return jnp.sum(out * cw)

            def loss_u(q, ct, g1, b1):
                out, _ = _unfused(q, ct, (g1,), (b1,), None, None, idx, mask)
                return jnp.sum(out * cw)

            args = (q, cterm, scales[0], biases[0])
        else:

            def loss_f(q, ct, g1, b1, w2_, b2_, g2, b2n):
                out, _, _ = sa_train_fused(
                    q, ct, (g1, g2), (b1, b2n), w2_, b2_, idx, mask,
                    k=idx.shape[1],
                )
                return jnp.sum(out * cw)

            def loss_u(q, ct, g1, b1, w2_, b2_, g2, b2n):
                out, _ = _unfused(
                    q, ct, (g1, g2), (b1, b2n), w2_, b2_, idx, mask
                )
                return jnp.sum(out * cw)

            args = (q, cterm, scales[0], biases[0], w2, b2, scales[1], biases[1])

        gf = jax.grad(loss_f, argnums=tuple(range(len(args))))(*args)
        gu = jax.grad(loss_u, argnums=tuple(range(len(args))))(*args)
        names = ["q", "cterm", "g1", "b1", "w2", "b2", "g2", "b2n"]
        for name, a, b_ in zip(names, gf, gu):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-4,
                err_msg=f"gradient mismatch for {name}",
            )

    def test_jit_and_value_grad_compose(self, rng):
        """The op works under jit with value_and_grad (the train-step shape)."""
        q, cterm, scales, biases, w2, b2, idx, mask = _setup(rng, c2=10)

        @jax.jit
        def step(q, w2):
            def loss(q, w2):
                out, stats, me = sa_train_fused(
                    q, cterm, scales, biases, w2, b2, idx, mask, k=idx.shape[1]
                )
                return jnp.sum(out**2), (stats, me)

            (val, aux), grads = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(q, w2)
            return val, grads

        val, (dq, dw2) = step(q, w2)
        assert np.isfinite(float(val))
        assert dq.shape == q.shape and dw2.shape == w2.shape
        assert np.all(np.isfinite(np.asarray(dq)))


class TestShiftedStats:
    @pytest.mark.parametrize("c2", [None, 10])
    def test_nonzero_shift_is_algebraically_identical(self, rng, c2):
        """bn_shifts (running means) change only the accumulation numerics
        (shifted one-pass, the nn.batchnorm cancellation fix) — mean/var,
        the forward output, and the winner routing must agree with the
        unshifted run to fp tolerance."""
        q, cterm, scales, biases, w2, b2, idx, mask = _setup(rng, c2=c2)
        k = idx.shape[1]
        out0, stats0, me0 = sa_train_fused(
            q, cterm, scales, biases, w2, b2, idx, mask, k=k
        )
        shifts = tuple(
            jnp.asarray(np.random.default_rng(1).normal(size=b_.shape))
            .astype(jnp.float32)
            for b_ in biases
        )
        out1, stats1, me1 = sa_train_fused(
            q, cterm, scales, biases, w2, b2, idx, mask, k=k,
            bn_shifts=shifts,
        )
        assert float(me0) == float(me1)
        np.testing.assert_allclose(
            np.asarray(out1), np.asarray(out0), rtol=3e-5, atol=3e-5
        )
        for (m0, v0), (m1, v1) in zip(stats0, stats1):
            np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), atol=3e-5)
            np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), atol=3e-5)
