"""KDE mixture prior over point altitudes.

Re-implements the reference's three weighted FFT-KDEs (learning/kde_mixture.py:37-118)
without the KDEpy dependency, using the same algorithm FFTKDE uses: linear
binning of weighted samples onto an equidistant grid followed by convolution
with a sampled Gaussian kernel. The fitted prior is exported as plain
(grid, pdfs) arrays that are baked into the jitted training graph and
evaluated with `jnp.interp` — replacing the per-step GPU->numpy->GPU
round-trip of the reference (learning/loss_functions.py:30-42, hot loop #5
in SURVEY.md §3.5).

Semantics mirrored exactly:
- z symmetrized around 0 (kde_mixture.py:77-82)
- prior weights gating each stratum's z-range (:54-58)
- bandwidth 0.1 (:60-62), 5000-point evaluation grid (:90)
- pdfs scaled by their weight sums and normalized by the global max (:93-99)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BW = 0.1
GRID_SIZE = 5 * 10**3
SUBSAMPLE_SIZE = 5 * 10**5
_KERNEL_SUPPORT = 8.0  # +- 8 sigma, comfortably beyond FFTKDE's practical support


@dataclass(frozen=True)
class KdeMixture:
    """Fitted strata prior: `grid` (G,) and `pdfs` (3, G) for Vb/ground, Vm, Vh."""

    grid: np.ndarray
    pdfs: np.ndarray

    def predict(self, z: np.ndarray):
        """Interpolated pdf values for ground/medium/high strata (clamped at
        the grid edges, where the densities have decayed to ~0)."""
        p1 = np.interp(z, self.grid, self.pdfs[0])
        p2 = np.interp(z, self.grid, self.pdfs[1])
        p3 = np.interp(z, self.grid, self.pdfs[2])
        return p1, p2, p3


def _linear_binning(x: np.ndarray, w: np.ndarray, grid: np.ndarray) -> np.ndarray:
    """Distribute weights onto the two nearest grid nodes (FFTKDE's binning)."""
    dx = grid[1] - grid[0]
    pos = (x - grid[0]) / dx
    lo = np.clip(np.floor(pos).astype(np.int64), 0, len(grid) - 2)
    frac = pos - lo
    out = np.zeros(len(grid), np.float64)
    np.add.at(out, lo, w * (1.0 - frac))
    np.add.at(out, lo + 1, w * frac)
    return out


def _weighted_gaussian_kde(x: np.ndarray, w: np.ndarray, grid: np.ndarray, bw: float) -> np.ndarray:
    """Weighted Gaussian KDE density on `grid`, integrating to ~1."""
    w = np.asarray(w, np.float64)
    binned = _linear_binning(x, w / w.sum(), grid)
    dx = grid[1] - grid[0]
    half = int(np.ceil(_KERNEL_SUPPORT * bw / dx))
    t = np.arange(-half, half + 1) * dx
    kernel = np.exp(-0.5 * (t / bw) ** 2) / (bw * np.sqrt(2 * np.pi))
    dens = np.convolve(binned, kernel, mode="same")
    return np.maximum(dens, 0.0)


def _strata_weights(z: np.ndarray):
    """Prior z-range gates per stratum (kde_mixture.py:54-58)."""
    a = np.abs(z)
    w1 = np.where(a < 0.5, 1.0, 0.05)
    w2 = np.where((a > 0.5) & (a < 1.5), 1.0, 0.05)
    w3 = np.where(a > 1.5, 1.0, np.where(a > 0.5, 0.5, 0.05))
    return w1, w2, w3


def fit_kde_mixture(z: np.ndarray, bw: float = BW, grid_size: int = GRID_SIZE) -> KdeMixture:
    """Fit the three-KDE mixture on an array of altitude values (meters)."""
    z = np.asarray(z, np.float64).reshape(-1)
    z_sym = np.sort(np.concatenate([-z, z]))
    w1, w2, w3 = _strata_weights(z_sym)

    lo = z_sym.min() - _KERNEL_SUPPORT * bw
    hi = z_sym.max() + _KERNEL_SUPPORT * bw
    grid = np.linspace(lo, hi, grid_size)

    y1 = _weighted_gaussian_kde(z_sym, w1, grid, bw) * w1.sum()
    y2 = _weighted_gaussian_kde(z_sym, w2, grid, bw) * w2.sum()
    y3 = _weighted_gaussian_kde(z_sym, w3, grid, bw) * w3.sum()
    max_all = max(y1.max(), y2.max(), y3.max())
    pdfs = np.stack([y1, y2, y3]) / max_all
    return KdeMixture(grid=grid.astype(np.float32), pdfs=pdfs.astype(np.float32))


def sample_z_from_dataset(dataset: dict, subsample_size: int = SUBSAMPLE_SIZE, seed: int = 0) -> np.ndarray:
    """Sample z values from a plot dataset (kde_mixture.py:16-21).
    Clouds are stored feature-major: row 2 is z."""
    all_z = np.concatenate([c["cloud"][2] for c in dataset.values()])
    rng = np.random.default_rng(seed)
    rng.shuffle(all_z)
    return all_z[:subsample_size]


def fit_kde_mixture_from_dataset(dataset: dict, seed: int = 0) -> KdeMixture:
    return fit_kde_mixture(sample_z_from_dataset(dataset, seed=seed))


def plot_kde_mixture(kde: KdeMixture, save_path: str, x_lim: float = 25.0) -> None:
    """Diagnostic figure (kde_mixture.py:102-118)."""
    import os

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 1, figsize=(15, 4))
    for i, (label, color) in enumerate(
        [("low elevation", "green"), ("medium elevation", "blue"), ("high elevation", "black")]
    ):
        ax.plot(kde.grid, kde.pdfs[i], label=label, color=color)
    ax.set_xlim([0, x_lim])
    ax.set_ylim([0, 1.2])
    ax.legend()
    fig.tight_layout()
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, dpi=100)
    plt.close(fig)
