"""Unit tests for the core point-cloud ops against numpy oracles
(test strategy per SURVEY.md §4: pure-function tests with hand-computable /
oracle-checked cases)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stratanet2_tpu.ops import (
    farthest_point_sampling,
    ball_query,
    knn_interpolate,
    plotwise_coverages,
    raster_projection,
)


def fps_oracle(xyz, n_samples, start=0):
    n = xyz.shape[0]
    sel = [start]
    d2 = np.full(n, np.inf)
    for _ in range(n_samples - 1):
        diff = xyz - xyz[sel[-1]]
        d2 = np.minimum(d2, np.sum(diff * diff, axis=1))
        sel.append(int(np.argmax(d2)))
    return np.array(sel)


class TestFPS:
    def test_matches_oracle(self, rng):
        xyz = rng.normal(size=(200, 3)).astype(np.float32)
        got = np.asarray(farthest_point_sampling(jnp.asarray(xyz), 50, use_pallas=False))
        want = fps_oracle(xyz, 50)
        np.testing.assert_array_equal(got, want)

    def test_batched(self, rng):
        xyz = rng.normal(size=(4, 128, 3)).astype(np.float32)
        got = np.asarray(farthest_point_sampling(jnp.asarray(xyz), 32, use_pallas=False))
        assert got.shape == (4, 32)
        for b in range(4):
            np.testing.assert_array_equal(got[b], fps_oracle(xyz[b], 32))

    def test_no_replacement(self, rng):
        xyz = rng.normal(size=(100, 3)).astype(np.float32)
        idx = np.asarray(farthest_point_sampling(jnp.asarray(xyz), 100, use_pallas=False))
        assert len(set(idx.tolist())) == 100

    def test_partitioned_start_contract(self, rng):
        """parts>1: out[..., 0] must still be start_idx (advisor r3 — the
        old code left start_idx at part q's slot, so the first output was a
        different point). Part starts deliberately share the local residue:
        that makes partitioned FPS bit-equivalent to the point-sharded
        per-device FPS (tests/test_point_sharded.py exact-match tests)."""
        xyz = rng.normal(size=(2, 2048, 3)).astype(np.float32)
        starts = jnp.asarray([1500, 37], jnp.int32)
        out = np.asarray(
            farthest_point_sampling(
                jnp.asarray(xyz), 512, start_idx=starts,
                use_pallas=False, parts=2,
            )
        )
        np.testing.assert_array_equal(out[:, 0], np.asarray(starts))
        for b in range(2):  # still without replacement across parts
            assert len(set(out[b].tolist())) == 512
        # start=0 must be a pure identity reordering of the pre-contract
        # output (the model's only call pattern — keeps the point-sharded
        # equivalence intact)
        out0 = np.asarray(
            farthest_point_sampling(
                jnp.asarray(xyz), 512, use_pallas=False, parts=2
            )
        )
        assert out0[0, 0] == 0 and out0[1, 0] == 0

    def test_pallas_interpret_matches_lax(self, rng):
        """Index-clobber-tolerant oracle (r3): the kernel's packed cache
        truncates selection distances by ~2^(nbits-24), so near-tied picks
        may differ from the exact lax path. The oracle therefore checks the
        FPS *quality* invariants instead of exact indices: no duplicates,
        and coverage radius (max over points of min distance to the
        selected set) within the truncation tolerance of exact FPS."""
        from stratanet2_tpu.ops.pallas_kernels import fps_pallas_batched

        xyz = rng.normal(size=(3, 200, 3)).astype(np.float32)
        start = jnp.zeros((3,), jnp.int32)
        got = np.asarray(fps_pallas_batched(jnp.asarray(xyz), 64, start))
        want = np.asarray(
            farthest_point_sampling(jnp.asarray(xyz), 64, use_pallas=False)
        )

        def coverage_radius(pts, sel):
            d2 = np.sum((pts[:, None] - pts[sel][None]) ** 2, axis=-1)
            return np.sqrt(d2.min(axis=1).max())

        for b in range(3):
            assert got[b, 0] == want[b, 0] == 0
            assert len(set(got[b].tolist())) == 64, "duplicate selection"
            cr_got = coverage_radius(xyz[b], got[b])
            cr_want = coverage_radius(xyz[b], want[b])
            assert cr_got <= cr_want * (1 + 1e-2) + 1e-3


class TestBallQuery:
    def test_within_radius_and_nearest(self, rng):
        pts = rng.normal(size=(500, 3)).astype(np.float32)
        cen = pts[:32]
        r, k = 0.7, 16
        idx, mask = ball_query(jnp.asarray(cen), jnp.asarray(pts), r, k)
        idx, mask = np.asarray(idx), np.asarray(mask)
        tol = 1e-4  # expanded-form d2 vs direct d2 float32 rounding at the boundary
        for c in range(32):
            d2 = np.sum((pts - cen[c]) ** 2, axis=1)
            inside_lo = np.where(d2 <= r * r - tol)[0]
            inside_hi = np.where(d2 <= r * r + tol)[0]
            got = idx[c][mask[c]]
            # all selected are within radius (tolerance for fp rounding)
            assert np.all(d2[got] <= r * r + tol)
            # count within the boundary-ambiguity band
            cnt = mask[c].sum()
            assert min(k, len(inside_lo)) <= cnt <= min(k, len(inside_hi))
            # selected distances are the cnt smallest among candidates
            np.testing.assert_allclose(
                np.sort(d2[got]),
                np.sort(d2[inside_hi])[:cnt],
                rtol=1e-4, atol=tol,
            )

    def test_masked_slots_are_zero(self, rng):
        pts = rng.normal(size=(64, 3)).astype(np.float32) * 100.0
        cen = jnp.zeros((1, 3))
        idx, mask = ball_query(cen, jnp.asarray(pts), 0.01, 8)
        assert not np.any(np.asarray(mask))
        assert np.all(np.asarray(idx) == 0)

    def test_grouped_pallas_pad_points_never_selected(self, rng):
        """Round-5 poisoned-pn masking regression: group padding sits at the
        ZERO coordinates in the grouped layout, so a centroid at the origin
        with all real points far away would select a pad slot if the poison
        (1e30 pn rows, replacing the old in-kernel pad where) ever broke."""
        from stratanet2_tpu.ops.pallas_kernels import ball_query_grouped_pallas

        n, k = 250, 16  # k*g_real = 256 > n: 6 poisoned tail slots
        pts = rng.normal(size=(1, n, 3)).astype(np.float32)
        pts += 50.0 * np.sign(pts + 1e-9)  # keep every real point far out
        cen = np.zeros((1, 2, 3), np.float32)
        cen[0, 1] = pts[0, 37]  # sanity: a reachable centroid
        idx, mask = ball_query_grouped_pallas(
            jnp.asarray(cen), jnp.asarray(pts), radius=2.0, k=k
        )
        idx, mask = np.asarray(idx), np.asarray(mask)
        assert not mask[0, 0].any(), "pad slot selected by origin centroid"
        assert mask[0, 1].any()
        assert np.all(idx[0, 1][mask[0, 1]] < n)

    def test_grouped_matches_oracle(self, rng):
        pts = rng.normal(size=(130, 3)).astype(np.float32)  # non-divisible N
        cen = rng.normal(size=(20, 3)).astype(np.float32)
        r, k = 1.2, 8
        idx, mask = ball_query(jnp.asarray(cen), jnp.asarray(pts), r, k, method="grouped")
        idx, mask = np.asarray(idx), np.asarray(mask)
        g = -(-130 // k)
        for c in range(20):
            d2 = np.sum((pts - cen[c]) ** 2, axis=1)
            for j in range(k):
                grp = np.arange(j * g, min((j + 1) * g, 130))
                inside = grp[d2[grp] <= r * r]
                if len(inside) == 0:
                    assert not mask[c, j]
                else:
                    assert mask[c, j]
                    want = inside[np.argmin(d2[inside])]
                    # ties aside, distances must match the group min
                    assert d2[idx[c, j]] == pytest.approx(d2[want], rel=1e-5, abs=1e-6)

    def test_grouped_keeps_sparse_neighbors(self, rng):
        # with fewer in-radius points than k in distinct groups, all are found
        pts = np.full((64, 3), 100.0, np.float32)
        close_ids = [3, 20, 40, 60]  # distinct groups for k=8 (g=8)
        for i in close_ids:
            pts[i] = [0.1 * i, 0, 0]
        cen = jnp.zeros((1, 3))
        idx, mask = ball_query(cen, jnp.asarray(pts), 10.0, 8, method="grouped")
        got = set(np.asarray(idx)[0][np.asarray(mask)[0]].tolist())
        assert got == set(close_ids)

    def test_chunking_invariance(self, rng):
        pts = rng.normal(size=(300, 3)).astype(np.float32)
        cen = rng.normal(size=(70, 3)).astype(np.float32)
        i1, m1 = ball_query(jnp.asarray(cen), jnp.asarray(pts), 1.0, 8, chunk=16)
        i2, m2 = ball_query(jnp.asarray(cen), jnp.asarray(pts), 1.0, 8, chunk=1024)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))

    def test_pallas_packed_path_matches_lax(self, rng):
        """Regression for the PROD-geometry NaN (r3): the packed min/argmin
        bit-trick requires d2 >= 0 — the transposed kernel once packed the
        norm-less xn - 2ab (negative for near points; int32 order reverses
        among negative floats), so real centroids lost their self slot at
        g >= 256. This forces the packed branch (g = 256) off-TPU via
        interpret mode and pins pallas == lax, self-inclusion included."""
        from stratanet2_tpu.ops.pallas_kernels import (
            _use_packed,
            ball_query_grouped_pallas,
        )

        k, n = 4, 1024  # g_real = 256 -> packed branch
        assert _use_packed(256)
        pts = (rng.normal(size=(2, n, 3)) * 4).astype(np.float32)
        cen = pts[:, ::16][:, :32]  # real points -> self slot must be valid
        r = 1.5
        ip, mp = ball_query_grouped_pallas(
            jnp.asarray(cen), jnp.asarray(pts), r, k
        )
        il, ml = ball_query(
            jnp.asarray(cen), jnp.asarray(pts), r, k, method="grouped"
        )
        np.testing.assert_array_equal(np.asarray(mp), np.asarray(ml))
        # compare selected distances (tie-tolerant), and self-inclusion
        for b in range(2):
            for c in range(32):
                d2 = np.sum((pts[b] - cen[b, c]) ** 2, axis=1)
                sel_p = np.asarray(ip)[b, c][np.asarray(mp)[b, c]]
                sel_l = np.asarray(il)[b, c][np.asarray(ml)[b, c]]
                np.testing.assert_allclose(
                    np.sort(d2[sel_p]), np.sort(d2[sel_l]), atol=2e-3
                )
                assert np.any(np.asarray(mp)[b, c]), "centroid lost all slots"
                assert d2[sel_p].min() < 1e-3, "self point not selected"

        # kc layout is the same data transposed
        ik, mk = ball_query_grouped_pallas(
            jnp.asarray(cen), jnp.asarray(pts), r, k, layout="kc"
        )
        np.testing.assert_array_equal(
            np.asarray(ik), np.swapaxes(np.asarray(ip), 1, 2)
        )

    def test_pallas_multi_block_pipeline_matches_lax(self, rng):
        """k=32 at n=1024 gives blk=16 -> nb=2 blocks, exercising the
        cross-block software pipeline (fori_loop body + epilogue merge)
        against the lax oracle; k=4 covers the nb=1 epilogue-only path."""
        from stratanet2_tpu.ops.pallas_kernels import ball_query_grouped_pallas

        for k, n, c in ((32, 1024, 40), (4, 256, 12)):
            pts = (rng.normal(size=(2, n, 3)) * 3).astype(np.float32)
            cen = pts[:, :: n // c][:, :c]
            r = 1.5
            ip, mp = ball_query_grouped_pallas(
                jnp.asarray(cen), jnp.asarray(pts), r, k
            )
            il, ml = ball_query(
                jnp.asarray(cen), jnp.asarray(pts), r, k, method="grouped"
            )
            np.testing.assert_array_equal(np.asarray(mp), np.asarray(ml))
            for b in range(2):
                for ci in range(c):
                    d2 = np.sum((pts[b] - cen[b, ci]) ** 2, axis=1)
                    sp = np.asarray(ip)[b, ci][np.asarray(mp)[b, ci]]
                    sl = np.asarray(il)[b, ci][np.asarray(ml)[b, ci]]
                    np.testing.assert_allclose(
                        np.sort(d2[sp]), np.sort(d2[sl]), atol=2e-3
                    )


def knn_interpolate_oracle(x, pos_x, pos_y, k):
    """torch_geometric.nn.knn_interpolate semantics (inverse d^2, clamped)."""
    out = np.zeros((pos_y.shape[0], x.shape[1]), np.float64)
    for i in range(pos_y.shape[0]):
        d2 = np.sum((pos_x - pos_y[i]) ** 2, axis=1)
        nn = np.argsort(d2)[:k]
        w = 1.0 / np.maximum(d2[nn], 1e-16)
        out[i] = (x[nn] * w[:, None]).sum(0) / w.sum()
    return out


class TestKnnInterpolate:
    @pytest.mark.parametrize("k", [1, 3])
    def test_matches_oracle(self, rng, k):
        x = rng.normal(size=(40, 7)).astype(np.float32)
        pos_x = rng.normal(size=(40, 3)).astype(np.float32)
        pos_y = rng.normal(size=(90, 3)).astype(np.float32)
        got = np.asarray(knn_interpolate(jnp.asarray(x), jnp.asarray(pos_x), jnp.asarray(pos_y), k=k))
        want = knn_interpolate_oracle(x, pos_x, pos_y, k)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_batched(self, rng):
        x = rng.normal(size=(2, 20, 4)).astype(np.float32)
        px = rng.normal(size=(2, 20, 3)).astype(np.float32)
        py = rng.normal(size=(2, 50, 3)).astype(np.float32)
        got = np.asarray(knn_interpolate(jnp.asarray(x), jnp.asarray(px), jnp.asarray(py), k=3))
        assert got.shape == (2, 50, 4)
        for b in range(2):
            np.testing.assert_allclose(
                got[b], knn_interpolate_oracle(x[b], px[b], py[b], 3), rtol=2e-4, atol=2e-5
            )


def plotwise_oracle(cov, xy, p):
    """Direct numpy transcription of the reference math
    (model/project_to_2d.py:7-55)."""
    mn, mx = xy.min(0), xy.max(0)
    b = np.floor((xy - mn) / (mx - mn + 1e-4) * p).astype(int)
    flat = b[:, 0] * p + b[:, 1]
    out = []
    pix_ids = np.unique(flat)
    pix_max = np.stack([cov[flat == i].max(0) for i in pix_ids])
    low = pix_max[:, 0]
    return np.array([
        low.mean(),
        (1 - low).mean(),
        pix_max[:, 2].mean(),
        pix_max[:, 3].mean(),
    ])


class TestProjection:
    def test_plotwise_matches_reference_math(self, rng):
        n, p = 400, 20
        cov = rng.uniform(size=(2, n, 4)).astype(np.float32)
        xy = rng.uniform(-1, 1, size=(2, n, 2)).astype(np.float32)
        got = np.asarray(plotwise_coverages(jnp.asarray(cov), jnp.asarray(xy), p))
        for b in range(2):
            np.testing.assert_allclose(got[b], plotwise_oracle(cov[b], xy[b], p), rtol=1e-5, atol=1e-6)

    def test_raster_matches_reference_math(self, rng):
        n, p, m = 300, 20, 20
        cov = rng.uniform(size=(n, 4)).astype(np.float32)
        # rescaled coords: meters/10, plot radius 10m -> [-1, 1]
        xy = rng.uniform(-0.95, 0.95, size=(n, 2)).astype(np.float32)
        got = np.asarray(raster_projection(jnp.asarray(xy), jnp.asarray(cov), p, m))
        # oracle: reference project_to_2d_rasters (model/project_to_2d.py:58-113)
        sf = 10 * p / m
        b = np.floor((xy + 1e-4) * sf + m // 2).astype(int)
        b = np.clip(b, 0, p - 1)
        want = np.full((3, p, p), np.nan)
        for ch_out, ch_in in enumerate([0, 2, 3]):
            for i in range(n):
                k, mm = b[i]
                v = want[ch_out, mm, k]
                want[ch_out, mm, k] = cov[i, ch_in] if np.isnan(v) else max(v, cov[i, ch_in])
        want = want[:, ::-1, :]
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    def test_raster_nan_for_empty(self):
        cov = jnp.ones((5, 4)) * 0.5
        xy = jnp.zeros((5, 2))  # all points in one pixel
        r = np.asarray(raster_projection(xy, cov, 20, 20))
        assert np.isnan(r).sum() == 3 * (400 - 1)
        assert np.nansum(r) == pytest.approx(1.5)


class TestGradientEquality:
    """Gradient-equality of every custom VJP against the plain-XLA math
    (VERDICT round-1 item 2 verification): the MXU scatter/gather VJPs and
    the fused kNN kernel must backpropagate identically to the composition
    they replace."""

    def test_knn_pallas_grad_matches_lax(self, rng):
        from stratanet2_tpu.ops.pallas_kernels import knn_interpolate_pallas
        from stratanet2_tpu.ops.knn import knn_interpolate as knn_lax

        x = jnp.asarray(rng.normal(size=(2, 30, 5)).astype(np.float32))
        ps = jnp.asarray(rng.normal(size=(2, 30, 3)).astype(np.float32))
        pt = jnp.asarray(rng.normal(size=(2, 70, 3)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(2, 70, 5)).astype(np.float32))

        g_pallas = jax.grad(lambda y: jnp.sum(knn_interpolate_pallas(y, ps, pt, 3) * w))(x)
        g_lax = jax.grad(lambda y: jnp.sum(knn_lax(y, ps, pt, k=3, use_pallas=False) * w))(x)
        # rtol 1e-3: the two paths normalize the inverse-d^2 weights in
        # different accumulation orders
        np.testing.assert_allclose(
            np.asarray(g_pallas), np.asarray(g_lax), rtol=1e-3, atol=3e-5
        )

    def test_knn_pallas_position_cotangent_shapes(self, rng):
        """Advisor r2 (medium): bwd read t from idx.shape[1] after the idx
        layout moved to (B, k, T) — the pos_tgt cotangent came back (B, k, 3)
        instead of (B, T, 3). Positions carry zero gradient by design, but
        the shapes must match the primals."""
        from stratanet2_tpu.ops.pallas_kernels import knn_interpolate_pallas

        x = jnp.asarray(rng.normal(size=(2, 30, 5)).astype(np.float32))
        ps = jnp.asarray(rng.normal(size=(2, 30, 3)).astype(np.float32))
        pt = jnp.asarray(rng.normal(size=(2, 70, 3)).astype(np.float32))

        gs, gt = jax.grad(
            lambda a, b: jnp.sum(knn_interpolate_pallas(x, a, b, 3)), argnums=(0, 1)
        )(ps, pt)
        assert gs.shape == ps.shape
        assert gt.shape == pt.shape
        assert not np.any(np.asarray(gs)) and not np.any(np.asarray(gt))

    def test_gather_vjp_matches_take(self, rng):
        from stratanet2_tpu.models.pointnet2 import _gather, _gather_raw

        x = jnp.asarray(rng.normal(size=(3, 40, 6)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 40, size=(3, 10, 4)).astype(np.int32))
        w = jnp.asarray(rng.normal(size=(3, 10, 4, 6)).astype(np.float32))

        g_vjp = jax.grad(lambda y: jnp.sum(_gather(y, idx) * w))(x)
        g_raw = jax.grad(lambda y: jnp.sum(_gather_raw(y, idx) * w))(x)
        np.testing.assert_allclose(
            np.asarray(g_vjp), np.asarray(g_raw), rtol=1e-4, atol=1e-5
        )

    def test_plotwise_grad_matches_segment_max_form(self, rng):
        """The dense masked-max projection must backpropagate exactly like
        the segment_max formulation it replaced."""
        from stratanet2_tpu.ops import plotwise_coverages

        cov = jnp.asarray(rng.uniform(size=(2, 300, 4)).astype(np.float32))
        xy = jnp.asarray(rng.uniform(-1, 1, size=(2, 300, 2)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))

        def seg_version(c):
            def one(cov1, xy1):
                mn = jnp.min(xy1, axis=0, keepdims=True)
                mx = jnp.max(xy1, axis=0, keepdims=True)
                b = jnp.floor((xy1 - mn) / (mx - mn + 1e-4) * 20).astype(jnp.int32)
                b = jnp.clip(b, 0, 19)
                pix = b[:, 0] * 20 + b[:, 1]
                pix_max = jax.ops.segment_max(cov1, pix, num_segments=400)
                occ = jax.ops.segment_max(
                    jnp.ones((cov1.shape[0],), jnp.float32), pix, num_segments=400
                ) > 0
                pix_max = jnp.where(occ[:, None], pix_max, 0.0)
                n_occ = jnp.maximum(jnp.sum(occ.astype(jnp.float32)), 1.0)
                low = pix_max[:, 0]
                bare = jnp.where(occ, 1.0 - low, 0.0)
                return jnp.stack(
                    [jnp.sum(low), jnp.sum(bare), jnp.sum(pix_max[:, 2]), jnp.sum(pix_max[:, 3])]
                ) / n_occ
            return jax.vmap(one)(c, xy)

        g_dense = jax.grad(lambda c: jnp.sum(plotwise_coverages(c, xy, 20) * w))(cov)
        g_seg = jax.grad(lambda c: jnp.sum(seg_version(c) * w))(cov)
        np.testing.assert_allclose(
            np.asarray(g_dense), np.asarray(g_seg), rtol=1e-4, atol=1e-6
        )

    def test_train_grads_pallas_vs_lax_paths(self, rng):
        """Full train-loss gradients agree between the custom-VJP model
        path and a pure-lax model configuration."""
        from tests.synthetic import tiny_config
        from stratanet2_tpu.learning.kde import fit_kde_mixture
        from stratanet2_tpu.learning.losses import total_loss
        from stratanet2_tpu.models import init_pointnet2, pointnet2_forward
        from stratanet2_tpu.ops import plotwise_coverages

        cfg = tiny_config()
        mcfg = cfg.model
        kde = fit_kde_mixture(np.random.default_rng(0).uniform(0, 20, 500))
        kg, kp = jnp.asarray(kde.grid), jnp.asarray(kde.pdfs)
        model = init_pointnet2(jax.random.PRNGKey(0), mcfg)
        b, n = 2, mcfg.subsample_size
        cloud = jnp.asarray(rng.uniform(0, 1, (b, n, 10)).astype(np.float32))
        xyz = jnp.asarray(rng.uniform(-10, 10, (b, n, 3)).astype(np.float32))
        gt = jnp.asarray(rng.uniform(0, 1, (b, 4)).astype(np.float32))

        def loss_fn(params):
            cov, proba, _ = pointnet2_forward(
                type(model)(params, model.state), cloud[..., 2:], xyz, mcfg,
                train=True,
            )
            pred = plotwise_coverages(cov, cloud[..., :2], mcfg.diam_pix)
            loss, _ = total_loss(
                pred, gt, proba, cloud[..., 2] * mcfg.z_max, kg, kp, 0.1, 0.04
            )
            return loss

        g = jax.grad(loss_fn)(model.params)
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.all(np.isfinite(np.asarray(leaf)))
        # at least one nonzero gradient per top-level module
        for name, sub in g.items():
            total = sum(
                float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(sub)
            )
            assert total > 0, f"zero gradient for {name}"


class TestPixelMaxKernel:
    """The VMEM pixel-max kernel (ops/pallas_kernels.pixel_max_pallas) that
    carries the projection ops on TPU, exercised in interpret mode: exact
    forward (max + winning index) vs a numpy scatter-max oracle, and
    gradient equality vs the dense masked-max formulation it replaces."""

    def test_matches_scatter_max_oracle(self, rng):
        from stratanet2_tpu.ops.pallas_kernels import pixel_max_pallas

        b, n, c, p2 = 3, 700, 4, 400
        pix = rng.integers(0, p2, (b, n)).astype(np.int32)
        vals = rng.uniform(0, 1, (b, n, c)).astype(np.float32)
        vmax, amax = pixel_max_pallas(jnp.asarray(pix), jnp.asarray(vals), p2)
        vm = np.full((b, p2, c), -3.4e38, np.float32)
        am = np.full((b, p2, c), -1, np.int64)
        for bb in range(b):
            for i in range(n):
                for ch in range(c):
                    if vals[bb, i, ch] > vm[bb, pix[bb, i], ch]:
                        vm[bb, pix[bb, i], ch] = vals[bb, i, ch]
                        am[bb, pix[bb, i], ch] = i
        np.testing.assert_array_equal(np.asarray(vmax), vm)
        np.testing.assert_array_equal(np.asarray(amax), am)

    @pytest.mark.parametrize("n", [5, 127, 1025])
    def test_odd_sizes(self, rng, n):
        from stratanet2_tpu.ops.pallas_kernels import pixel_max_pallas

        pix = rng.integers(0, 9, (2, n)).astype(np.int32)
        vals = rng.uniform(0, 1, (2, n, 3)).astype(np.float32)
        vmax, _ = pixel_max_pallas(jnp.asarray(pix), jnp.asarray(vals), 9)
        vm = np.full((2, 9, 3), -3.4e38, np.float32)
        for bb in range(2):
            for i in range(n):
                vm[bb, pix[bb, i]] = np.maximum(vm[bb, pix[bb, i]], vals[bb, i])
        np.testing.assert_array_equal(np.asarray(vmax), vm)

    def test_grad_matches_dense_masked_max(self, rng):
        from stratanet2_tpu.ops.pallas_kernels import pixel_max_pallas

        b, n, c, p2 = 2, 300, 4, 100
        pix = jnp.asarray(rng.integers(0, p2, (b, n)).astype(np.int32))
        vals = jnp.asarray(rng.uniform(0, 1, (b, n, c)).astype(np.float32))
        w = jnp.asarray(rng.uniform(-1, 1, (b, p2, c)).astype(np.float32))

        def f_pallas(v):
            vmax, amax = pixel_max_pallas(pix, v, p2)
            return jnp.sum(jnp.where(amax >= 0, vmax, 0.0) * w)

        def f_dense(v):
            seg = jnp.arange(p2, dtype=jnp.int32)
            mask = pix[:, None, :] == seg[None, :, None]
            e = jnp.where(mask[..., None], v[:, None], -3.4e38)
            vmax = jnp.max(e, axis=2)
            occ = jnp.any(mask, axis=2)
            return jnp.sum(jnp.where(occ[..., None], vmax, 0.0) * w)

        np.testing.assert_allclose(float(f_pallas(vals)), float(f_dense(vals)), rtol=1e-6)
        g1, g2 = jax.grad(f_pallas)(vals), jax.grad(f_dense)(vals)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6, atol=1e-7)

    def test_projection_kernel_paths_match_default(self, rng, monkeypatch):
        """Force the TPU kernel gate on (interpret mode on CPU) and pin both
        public projection ops against their default XLA paths."""
        from stratanet2_tpu.ops import projection as proj

        n, p = 611, 20  # unique shape -> fresh jit trace under the patch
        cov = jnp.asarray(rng.uniform(size=(2, n, 4)).astype(np.float32))
        xy = jnp.asarray(rng.uniform(-1, 1, size=(2, n, 2)).astype(np.float32))
        want_pl = np.asarray(plotwise_coverages(cov, xy, p))
        want_ra = np.asarray(
            proj.batched_raster_projection(xy * 0.9, cov, p, 20)
        )
        monkeypatch.setattr(proj, "_use_pixel_max_kernel", lambda: True)
        got_pl = np.asarray(proj.plotwise_coverages.__wrapped__(cov, xy, p))
        got_ra = np.asarray(
            proj.batched_raster_projection.__wrapped__(xy * 0.9, cov, p, 20)
        )
        np.testing.assert_allclose(got_pl, want_pl, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(got_ra, want_ra, rtol=1e-6, atol=1e-7)
