"""In-graph 2D projection of pointwise coverages.

Replaces reference `model/project_to_2d.py` entirely, fused into the jitted
forward/train step:

- `plotwise_coverages` — reference `project_to_plotwise_coverages`
  (model/project_to_2d.py:7-55): per-cloud min-max-normalized xy binned into
  diam_pix cells, per-pixel max of pointwise coverages, bare-soil pixel
  derived as 1 - low_veg pixel (:42), then the mean over *occupied* pixels
  gives the (B, 4) plot-level coverages.

- `raster_projection` — reference `project_to_2d_rasters`
  (model/project_to_2d.py:58-113): absolute-coordinate binning with
  scaling_factor = 10*diam_pix/diam_meters on the rescaled (x/10) cloud,
  per-pixel max, NaN for empty pixels, y-flip. The reference runs a Python
  loop with a fresh nn.MaxPool1d per pixel on CPU (hot loop #3 in SURVEY.md
  §3.5); here it is one masked segment-max that XLA fuses into the forward.

Both use `jax.ops.segment_max` over a static pixel count (diam_pix^2), the
TPU-friendly dense formulation of torch_scatter's scatter_max.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG = -1e30


def _pixel_bins_minmax(xy: jax.Array, diam_pix: int) -> jax.Array:
    """Per-cloud min-max normalized binning (model/project_to_2d.py:16-22).

    xy: (N, 2) -> (N,) flat pixel ids in [0, diam_pix^2).
    """
    mn = jnp.min(xy, axis=0, keepdims=True)
    mx = jnp.max(xy, axis=0, keepdims=True)
    b = jnp.floor((xy - mn) / (mx - mn + 1e-4) * diam_pix).astype(jnp.int32)
    b = jnp.clip(b, 0, diam_pix - 1)
    return b[:, 0] * diam_pix + b[:, 1]


def _use_pixel_max_kernel() -> bool:
    return jax.default_backend() == "tpu"


@functools.partial(jax.jit, static_argnames=("diam_pix",))
def plotwise_coverages(
    coverages_pointwise: jax.Array, xy: jax.Array, diam_pix: int
) -> jax.Array:
    """Plot-level coverage scalars from pointwise coverages.

    Args:
      coverages_pointwise: (B, N, 4) pointwise coverages (proba * density),
        class order [low_veg, bare_soil, med_veg, high_veg].
      xy: (B, N, 2) point xy (any affine scale; normalized internally).
      diam_pix: raster diameter in pixels (static).

    Returns:
      (B, 4) plot coverages: mean over occupied pixels of
      [max low_veg, 1 - max low_veg, max med_veg, max high_veg].
    """
    if _use_pixel_max_kernel():
        # VMEM-resident per-pixel max with exact one-winner VJP — the dense
        # masked-max below costs ~6.3 ms fwd+bwd per PROD train step in HBM
        # round-trips; the kernel is <1 ms (see docs/KERNELS.md).
        from stratanet2_tpu.ops.pallas_kernels import pixel_max_pallas

        n_seg = diam_pix * diam_pix
        pix = jax.vmap(lambda a: _pixel_bins_minmax(a, diam_pix))(xy)
        # only strata [low, med, high] are consumed — the bare-soil pixel is
        # derived as 1 - low (model/project_to_2d.py:42), so channel 1 never
        # needs a per-pixel max (25% less kernel work)
        cov3 = jnp.stack(
            [coverages_pointwise[..., 0], coverages_pointwise[..., 2],
             coverages_pointwise[..., 3]], axis=-1)
        vmax, amax = pixel_max_pallas(pix, cov3, n_seg)
        occ = amax[..., 0] >= 0  # (B, P^2)
        pm = jnp.where(occ[..., None], vmax, 0.0)
        n_occ = jnp.maximum(jnp.sum(occ.astype(jnp.float32), axis=1), 1.0)
        low, med, high = pm[..., 0], pm[..., 1], pm[..., 2]
        bare = jnp.where(occ, 1.0 - low, 0.0)
        sums = jnp.stack(
            [low.sum(1), bare.sum(1), med.sum(1), high.sum(1)], axis=1
        )
        return sums / n_occ[:, None]

    def one(cov, xy1):
        pix = _pixel_bins_minmax(xy1, diam_pix)
        n_seg = diam_pix * diam_pix
        # dense masked max over an explicit (P^2, N) pixel-membership mask:
        # XLA fuses the compare+select into the N-axis reduction, where
        # segment_max lowers to a serialized TPU scatter (measured ~30%
        # slower fwd and bwd at the PROD geometry)
        seg = jnp.arange(n_seg, dtype=jnp.int32)
        mask = pix[None, :] == seg[:, None]  # (P^2, N)
        pix_max = jnp.max(
            jnp.where(mask[:, :, None], cov[None], jnp.float32(_NEG)), axis=1
        )  # (P^2, 4)
        occupied = jnp.any(mask, axis=1)
        pix_max = jnp.where(occupied[:, None], pix_max, 0.0)
        n_occ = jnp.sum(occupied.astype(jnp.float32))
        low = pix_max[:, 0]
        bare = jnp.where(occupied, 1.0 - low, 0.0)
        med = pix_max[:, 2]
        high = pix_max[:, 3]
        sums = jnp.stack(
            [jnp.sum(low), jnp.sum(bare), jnp.sum(med), jnp.sum(high)]
        )
        return sums / jnp.maximum(n_occ, 1.0)

    return jax.vmap(one)(coverages_pointwise, xy)


def _raster_bins(
    xy_rescaled: jax.Array, diam_pix: int, diam_meters: int
) -> jax.Array:
    """Absolute-coordinate binning (model/project_to_2d.py:68-78):
    (..., 2) rescaled xy -> (...,) flat pixel ids pix = row*P + col."""
    sf = 10.0 * diam_pix / diam_meters
    b = jnp.floor((xy_rescaled + 1e-4) * sf + diam_meters // 2).astype(jnp.int32)
    b = jnp.clip(b, 0, diam_pix - 1)
    # column (x) = b[..., 0], row (y) = b[..., 1] — reference :103 writes [m, k]
    return b[..., 1] * diam_pix + b[..., 0]


def _raster_from_pixmax(
    pix: jax.Array, coverages_pointwise: jax.Array, diam_pix: int
) -> jax.Array:
    """(B, N) bins + (B, N, 4) coverages -> (B, 3, P, P) NaN-empty, y-flipped
    rasters via the VMEM pixel-max kernel."""
    from stratanet2_tpu.ops.pallas_kernels import pixel_max_pallas

    n_seg = diam_pix * diam_pix
    cov3 = jnp.stack(
        [coverages_pointwise[..., 0], coverages_pointwise[..., 2],
         coverages_pointwise[..., 3]], axis=-1)  # only [low, med, high] used
    vmax, amax = pixel_max_pallas(pix, cov3, n_seg)
    occ = amax[..., :1] >= 0  # (B, P^2, 1)
    sel = jnp.where(occ, vmax, jnp.nan)  # (B, P^2, 3)
    rasters = jnp.swapaxes(sel, 1, 2).reshape(-1, 3, diam_pix, diam_pix)
    return rasters[:, :, ::-1, :]  # y-flip


@functools.partial(jax.jit, static_argnames=("diam_pix", "diam_meters"))
def raster_projection(
    xy_rescaled: jax.Array,
    coverages_pointwise: jax.Array,
    diam_pix: int,
    diam_meters: int,
) -> jax.Array:
    """Project pointwise coverages onto per-stratum rasters (one cloud).

    Args:
      xy_rescaled: (N, 2) the model-input xy, i.e. centered meters / 10
        (the scale `project_to_2d_rasters` receives, model/project_to_2d.py:68).
      coverages_pointwise: (N, 4).
      diam_pix, diam_meters: static raster geometry.

    Returns:
      (3, diam_pix, diam_pix) float32 rasters [low, med, high]; NaN where no
      point projects; y-flipped so row 0 is the northernmost row
      (model/project_to_2d.py:108-110).
    """
    pix = _raster_bins(xy_rescaled, diam_pix, diam_meters)
    n_seg = diam_pix * diam_pix
    if _use_pixel_max_kernel():
        return _raster_from_pixmax(pix[None], coverages_pointwise[None], diam_pix)[0]
    pix_max = jax.ops.segment_max(
        coverages_pointwise, pix, num_segments=n_seg
    )  # (P^2, 4)
    occupied = (
        jax.ops.segment_max(
            jnp.ones((coverages_pointwise.shape[0],), jnp.float32), pix,
            num_segments=n_seg,
        )
        > 0.0
    )
    sel = pix_max[:, jnp.array([0, 2, 3])]  # low, med, high
    sel = jnp.where(occupied[:, None], sel, jnp.nan)
    rasters = sel.T.reshape(3, diam_pix, diam_pix)
    return rasters[:, ::-1, :]  # y-flip


@functools.partial(jax.jit, static_argnames=("diam_pix", "diam_meters"))
def batched_raster_projection(
    xy_rescaled: jax.Array,
    coverages_pointwise: jax.Array,
    diam_pix: int,
    diam_meters: int,
) -> jax.Array:
    """(B, N, 2), (B, N, 4) -> (B, 3, P, P) rasters."""
    if _use_pixel_max_kernel():
        pix = _raster_bins(xy_rescaled, diam_pix, diam_meters)
        return _raster_from_pixmax(pix, coverages_pointwise, diam_pix)
    return jax.vmap(
        lambda xy, cov: raster_projection(xy, cov, diam_pix, diam_meters)
    )(xy_rescaled, coverages_pointwise)
