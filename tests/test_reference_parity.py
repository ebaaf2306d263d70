"""Numerical parity against the reference's forward semantics (VERDICT r2 #1).

The oracle (`stratanet2_tpu.utils.reference_oracle`) reimplements the
reference's exact forward math in plain torch/numpy: long-form batch,
farthest-point sampling, `radius` neighborhoods capped at max_num, per-edge
PointConv MLP + max aggregation, knn_interpolate k=1/3, the head
(/root/reference/model/point_net2.py:106-153), and
`project_to_plotwise_coverages` (/root/reference/model/project_to_2d.py:7-55).

The exactness tests run in the regime where our fixed-K design provably
equals the reference's unbounded edge lists — K >= the true in-radius
neighbor count for every centroid (asserted, not assumed) and
ball_query_method="nearest" — with the SAME weights loaded through
utils.torch_import both ways. Any semantic drift in selection, PointConv,
interpolation, BN-eval, the head, or the plotwise projection fails these
tests at f32 tolerance.

The deliberate fixed-K deviation at PROD caps (k1=32/k2=64 vs the
reference's <=2000) is quantified separately by
scripts/neighbor_cap_study.py (number recorded in docs/PARITY.md).
"""

from __future__ import annotations

from dataclasses import replace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from stratanet2_tpu.config import Config
from stratanet2_tpu.models import pointnet2_forward
from stratanet2_tpu.ops import plotwise_coverages
from stratanet2_tpu.utils.reference_oracle import (
    fps_numpy,
    make_reference_state_dict,
    radius_numpy,
    reference_forward,
    reference_plotwise_coverages,
)
from stratanet2_tpu.utils.torch_import import params_from_torch_state_dict


def _parity_config(n: int = 256, k1: int = 48, k2: int = 48):
    cfg = Config()
    return replace(
        cfg.model,
        subsample_size=n,
        k1=k1,
        k2=k2,
        knn_chunk=128,
        use_pallas=False,
        ball_query_method="nearest",  # exact top-k: == whole ball when k >= count
        fps_parts=1,
    )


def _synthetic_batch(rng, b, n, radius_m=10.0):
    """Clouds in the model input convention: xyz centered meters, features
    with x,y dropped (z/z_max then 7 extra channels in [0,1])."""
    theta = rng.uniform(0, 2 * np.pi, (b, n))
    r = radius_m * np.sqrt(rng.uniform(0, 1, (b, n)))
    z = rng.uniform(0, 1.5, (b, n)) ** 2 * 10
    xyz = np.stack([r * np.cos(theta), r * np.sin(theta), z], -1).astype(np.float32)
    feats = rng.uniform(0, 1, (b, n, 8)).astype(np.float32)
    feats[..., 0] = (z / 24.24).astype(np.float32)
    return feats, xyz


def _max_neighbor_count(xyz, mcfg):
    """True in-radius neighbor counts at both SA stages (oracle selection)."""
    worst = 0
    for pos in xyz:
        idx1 = fps_numpy(pos, mcfg.n_centroids1, start=0)
        c1 = pos[idx1]
        n1 = radius_numpy(pos, c1, mcfg.r1, 10**9)
        worst = max(worst, max(len(h) for h in n1))
        idx2 = fps_numpy(c1, mcfg.n_centroids2, start=0)
        n2 = radius_numpy(c1, c1[idx2], mcfg.r2, 10**9)
        worst = max(worst, max(len(h) for h in n2))
    return worst


class TestReferenceForwardParity:
    def test_pointwise_forward_matches_reference(self):
        """Whole-forward equality with shared weights, K >= true counts."""
        rng = np.random.default_rng(7)
        mcfg = _parity_config()
        feats, xyz = _synthetic_batch(rng, b=2, n=mcfg.subsample_size)
        assert _max_neighbor_count(xyz, mcfg) <= min(mcfg.k1, mcfg.k2), (
            "test geometry violated the K >= neighbor-count regime"
        )

        sd = make_reference_state_dict(seed=3)
        model = params_from_torch_state_dict(sd, mcfg)

        cov_ref, proba_ref = reference_forward(
            sd, feats, xyz,
            n_centroids1=mcfg.n_centroids1, n_centroids2=mcfg.n_centroids2,
            r1=mcfg.r1, r2=mcfg.r2, max_num_neighbors=2000,
        )
        cov, proba, _ = pointnet2_forward(
            model, jnp.asarray(feats), jnp.asarray(xyz), mcfg, train=False
        )
        # f32 accumulation-order differences only
        np.testing.assert_allclose(np.asarray(proba), proba_ref, atol=2e-5)
        np.testing.assert_allclose(np.asarray(cov), cov_ref, atol=2e-5)

    def test_plotwise_projection_matches_reference(self):
        """project_to_plotwise_coverages on identical pointwise inputs."""
        rng = np.random.default_rng(11)
        b, n, p = 3, 500, 20
        cov = rng.uniform(0, 1, (b, n, 4)).astype(np.float32)
        xy = rng.uniform(-10, 10, (b, n, 2)).astype(np.float32)
        want = reference_plotwise_coverages(cov, xy, p)
        got = np.asarray(plotwise_coverages(jnp.asarray(cov), jnp.asarray(xy), p))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_end_to_end_coverage_parity(self):
        """forward + plotwise projection composed: the quantity BASELINE.json
        calls 'coverage-MAE parity' — plot-level coverages agree end to end."""
        rng = np.random.default_rng(23)
        mcfg = _parity_config()
        feats, xyz = _synthetic_batch(rng, b=2, n=mcfg.subsample_size)
        sd = make_reference_state_dict(seed=5)
        model = params_from_torch_state_dict(sd, mcfg)

        cov_ref, _ = reference_forward(
            sd, feats, xyz,
            n_centroids1=mcfg.n_centroids1, n_centroids2=mcfg.n_centroids2,
            r1=mcfg.r1, r2=mcfg.r2,
        )
        # the projection consumes the model-input xy scale (centered m / 10)
        xy = (xyz[..., :2] / 10.0).astype(np.float32)
        pl_ref = reference_plotwise_coverages(cov_ref, xy, mcfg.diam_pix)

        cov, _, _ = pointnet2_forward(
            model, jnp.asarray(feats), jnp.asarray(xyz), mcfg, train=False
        )
        pl = np.asarray(
            plotwise_coverages(cov, jnp.asarray(xy), mcfg.diam_pix)
        )
        np.testing.assert_allclose(pl, pl_ref, atol=5e-5)
        assert np.max(np.abs(pl - pl_ref)) < 5e-5

    def test_oracle_state_dict_roundtrip_through_torch_save(self, tmp_path):
        """The oracle's state_dict is import-compatible with the archived
        checkpoint path (utils.torch_import.load_reference_checkpoint)."""
        from stratanet2_tpu.utils.torch_import import load_reference_checkpoint

        sd = make_reference_state_dict(seed=1)
        path = str(tmp_path / "PCC_model_full.pt")
        torch.save(
            {"state_dict": {k: torch.as_tensor(v) for k, v in sd.items()},
             "best_metric_epoch": 3, "best_metric_value": 0.1},
            path,
        )
        mcfg = _parity_config()
        model = load_reference_checkpoint(path, mcfg)
        np.testing.assert_allclose(
            np.asarray(model.params["lin2"]["b"]),
            [0.733, 0.266, 0.235, 0.358, 0.500],
            atol=0,
        )
