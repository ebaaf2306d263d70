"""Training losses, all in-graph (reference learning/loss_functions.py).

Total loss = abs + m * NLL + e * entropy (learning/train.py:62):

- `absolute_loss` (:9-16): smoothed-L1-style per-stratum coverage error
  sqrt((pred - gt)^2 + 1e-4) on strata [low, med, high] (indices 0, 2, 3).
- `entropy_loss` (:19-24): binary entropy on medium/high class probabilities,
  pushing memberships toward 0/1.
- `nll_loss` (:27-57): negative log-likelihood of pointwise class
  probabilities under the KDE strata prior of z. The reference evaluates the
  KDE on CPU/numpy every step; here the fitted grid is a constant baked into
  the graph and evaluated with `jnp.interp` — differentiable and fused.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

EPS = 1e-4
STRATA_IDX = (0, 2, 3)  # low_veg, med_veg, high_veg


def absolute_loss_by_strata(pred_pl: jax.Array, gt: jax.Array) -> jax.Array:
    """(B, 4), (B, 4) -> (3,) per-stratum smoothed MAE."""
    idx = jnp.asarray(STRATA_IDX)
    d = pred_pl[:, idx] - gt[:, idx]
    return jnp.mean(jnp.sqrt(d * d + EPS), axis=0)


def absolute_loss(pred_pl: jax.Array, gt: jax.Array) -> jax.Array:
    return jnp.mean(absolute_loss_by_strata(pred_pl, gt))


def entropy_loss(proba_pointwise: jax.Array) -> jax.Array:
    """(..., 4) pointwise class probabilities -> scalar binary entropy on
    channels [2:] (medium + high)."""
    p = proba_pointwise[..., 2:]
    return -jnp.mean(p * jnp.log(p + EPS) + (1 - p) * jnp.log(1 - p + EPS))


def nll_loss(
    proba_pointwise: jax.Array,
    z_meters: jax.Array,
    kde_grid: jax.Array,
    kde_pdfs: jax.Array,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """KDE-mixture negative log-likelihood.

    Args:
      proba_pointwise: (..., 4) class probabilities.
      z_meters: (...) altitudes in meters (un-rescaled, i.e. z_feature * z_max,
        loss_functions.py:33).
      kde_grid: (G,) altitude grid of the fitted prior.
      kde_pdfs: (3, G) pdf values for ground / medium / high.

    Returns:
      (scalar loss, (p_all (..., 3), pdf_all (..., 3))) — the aux pair feeds
      the interpretation figures (learning/test.py:65, :87).
    """
    # The KDE grid is equidistant (learning/kde.py linear binning), so the
    # bracket index is direct arithmetic — jnp.interp's searchsorted costs
    # ~13 serialized TPU gathers per pdf (measured 32 ms/step at the PROD
    # geometry vs ~2 ms for this form). One take fetches both bracket rows:
    # the table packs [pdf(i), pdf(i+1)] side by side.
    grid_n = kde_grid.shape[0]
    table = jnp.concatenate(
        [kde_pdfs.T, jnp.roll(kde_pdfs.T, -1, axis=0)], axis=1
    )  # (G, 6): columns [g,m,h @ i, g,m,h @ i+1]
    dz = kde_grid[1] - kde_grid[0]
    t = (z_meters - kde_grid[0]) / dz
    i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, grid_n - 2)
    frac = jnp.clip(t - i.astype(z_meters.dtype), 0.0, 1.0)
    rows = jnp.take(table, i, axis=0)  # (..., 6)
    pdf_all = rows[..., :3] + (rows[..., 3:] - rows[..., :3]) * frac[..., None]

    p_ground = proba_pointwise[..., 0] + proba_pointwise[..., 1]
    p_all = jnp.stack(
        [p_ground, proba_pointwise[..., 2], proba_pointwise[..., 3]], axis=-1
    )
    likelihood = jnp.sum(p_all * pdf_all, axis=-1)
    # The reference evaluates the scipy KDE directly, whose Gaussian tails
    # are positive everywhere; our grid clamps out-of-range z to the edge
    # row, where a stratum's pdf can be exactly 0 — floor the likelihood so
    # a point beyond the training fold's z range cannot emit log(0) = -inf
    # and poison the step with NaNs. 1e-38 sits below every normal positive
    # f32, so any likelihood the reference's math could produce is passed
    # through unchanged (parity-tested); only exact zeros are rescued.
    likelihood = jnp.maximum(likelihood, 1e-38)
    return -jnp.mean(jnp.log(likelihood)), (p_all, pdf_all)


def total_loss(
    pred_pl: jax.Array,
    gt: jax.Array,
    proba_pointwise: jax.Array,
    z_meters: jax.Array,
    kde_grid: jax.Array,
    kde_pdfs: jax.Array,
    m: float,
    e: float,
):
    """abs + m*NLL + e*entropy (learning/train.py:58-62). Returns
    (loss, dict of components)."""
    l_abs = absolute_loss(pred_pl, gt)
    l_nll, aux = nll_loss(proba_pointwise, z_meters, kde_grid, kde_pdfs)
    l_e = entropy_loss(proba_pointwise)
    loss = l_abs + m * l_nll + e * l_e
    comps = {
        "total_loss": loss,
        "MAE_loss": l_abs,
        "log_loss": l_nll,
        "entropy_loss": l_e,
    }
    return loss, (comps, aux)
