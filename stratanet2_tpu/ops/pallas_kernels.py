"""Pallas TPU kernels for the point-cloud hot loops.

`fps_pallas` — farthest point sampling with the running min-distance cache
resident in VMEM for the whole selection loop. The lax fallback
(`ops.fps._fps_lax`) re-reads the (B, N) distance array from HBM every
iteration (~2 GB of traffic for B=20, N=10k, S=2.5k); this kernel keeps
xyz (B,3,N ~ 2.4 MB) and the cache (B,N ~ 0.8 MB) on-chip, so the loop is
VPU-bound.

The kernel is batched: one grid step processes ALL clouds per FPS iteration
(the selection loop is sequential, so batching across B is the only
parallelism available — same reasoning as the reference's per-batch CUDA
kernel, torch_cluster fps).

Per iteration (all shapes (B, N), VPU element ops):
  1. one-hot of last selected index -> selected xyz via masked row-sums
  2. squared distance to selected point
  3. min into the cache
  4. per-row argmax -> next index
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _sds(shape, dtype, like=None):
    """ShapeDtypeStruct that inherits the varying-axes type (vma) of `like`
    when tracing under shard_map(check_vma=True) — pallas outputs must
    declare how they vary across mesh axes
    (parallel/point_sharded.make_point_sharded_train_step)."""
    try:
        vma = jax.typeof(like).vma if like is not None else None
    except (AttributeError, TypeError):
        vma = None
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mxu_dist2(a: jax.Array, bt: jax.Array) -> jax.Array:
    """Squared distances (A, B) between rows of a (A, 3) and columns of
    bt (3, B), with the cross term on the MXU: d2 = |a|^2 + |b|^2 - 2 a.b.

    precision=HIGHEST runs the multi-pass f32 MXU algorithm; the residual
    cancellation error is ~|a||b|*eps_f32 (~1e-4 m^2 at 10 m coordinates),
    negligible against the ball radii (r^2 >= 2) and only able to flip
    selections between near-equidistant neighbors. This moves the dominant
    O(C*N) sweep from 9 VPU ops/element to 3 (plus MXU work that overlaps),
    measured ~3x on the selection kernels (docs/KERNELS.md).
    """
    an = jnp.sum(a * a, axis=1, keepdims=True)  # (A, 1)
    bn = jnp.sum(bt * bt, axis=0, keepdims=True)  # (1, B)
    ab = jax.lax.dot_general(
        a, bt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return an + bn - 2.0 * ab


# --- hi/lo-split bf16 distance cross terms ---------------------------------
#
# The HIGHEST-precision f32 MXU matmul runs 6 passes; with a contraction dim
# of only 3 (padded to the MXU's 128) that sextuples an already 2%-utilized
# matmul. Splitting each coordinate x = hi + lo into two bf16 halves gives
# x.y ~= hi_x.hi_y + lo_x.hi_y + hi_x.lo_y (dropping lo.lo <= 4e-4 m^2) as a
# SINGLE bf16 MXU pass over a 9-wide contraction. The MXU accumulates in
# f32, so the only other error is the split itself; total |d2 error| is
# ~1e-3 m^2 worst-case at 10 m coordinates — selection-grade (ball radii
# r^2 >= 2), used for picking neighbors, never for values fed to the MLPs.


def _hilo_split(x: jax.Array, in_kernel: bool = False):
    # Outside kernels the split MUST use reduce_precision, not a bf16 cast
    # round-trip: XLA runs with --xla_allow_excess_precision and is free to
    # elide the downcast in x - f32(bf16(x)), silently zeroing the lo half
    # (observed: 2.6% wrong neighbor picks). Mosaic has no reduce_precision
    # but lowers casts literally, so the round-trip is safe in-kernel.
    if in_kernel:
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo
    hi_f32 = jax.lax.reduce_precision(x, exponent_bits=8, mantissa_bits=7)
    hi = hi_f32.astype(jnp.bfloat16)  # exact: already bf16-representable
    lo = (x - hi_f32).astype(jnp.bfloat16)
    return hi, lo


def _hilo9_rows(xt: jax.Array) -> jax.Array:
    """(..., 3, L) f32 -> (..., 9, L) bf16 rows [hi, hi, lo] for the 9-wide
    cross-term contraction (pairs with `_hilo9_cols`)."""
    hi, lo = _hilo_split(xt)
    return jnp.concatenate([hi, hi, lo], axis=-2)


def _hilo9_cols(a: jax.Array) -> jax.Array:
    """(A, 3) f32 -> (A, 9) bf16 columns [hi, lo, hi]. Kernel-side helper."""
    hi, lo = _hilo_split(a, in_kernel=True)
    return jnp.concatenate([hi, lo, hi], axis=-1)


def _mxu_dist2_hilo(a9, an, bt9, bn) -> jax.Array:
    """d2 from pre-split operands: a9 (A, 9) bf16, an (A, 1) f32 row norms,
    bt9 (9, B) bf16, bn (1, B) f32 column norms."""
    ab = jax.lax.dot_general(
        a9, bt9,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return an + bn - 2.0 * ab


# NOTE: the packed min/argmin trick (f32 bit pattern of d2 >= 0 is
# int-monotonic; clobber the low mantissa bits with the lane index so one
# int32 min returns both min and argmin) is inlined by _fps_kernel,
# _bq_kernel and _sa_kernel, each with its own nbits/clamping — see
# docs/KERNELS.md for the d2>=0 precondition lesson.


def _fps_kernel(n_samples: int, n_valid: int):
    def kernel(start_ref, xyz_ref, out_ref, dist_ref):
        # xyz_ref: (3, B, Np) VMEM f32 (coordinate planes leading);
        # start_ref: (B, 1) VMEM int32
        # out_ref: (n_samples, B) int32 VMEM; dist_ref: (B, Np) int32 scratch
        #
        # The min-distance cache is stored as PACKED int32 keys
        # (f32 d2 bits with the low ceil(log2(Np)) mantissa bits clobbered
        # by the lane index). d2 >= 0 keeps the bit pattern int-monotonic,
        # and both keys of an element share the same index bits, so the
        # per-element min compares the (truncated) distances — and the
        # per-row argmax becomes ONE int max reduction whose low bits ARE
        # the index (no iota/select argmax temporaries, no re-pack pass).
        # Cost: ~2^(nbits-24) relative truncation of the selection
        # distances (~2^-10 at Np=10240) — FPS is a sampling heuristic and
        # near-ties are interchangeable; the test oracle checks coverage,
        # not exact indices (docs/KERNELS.md r3).
        _, b, npad = xyz_ref.shape
        nbits = max(1, (npad - 1).bit_length())
        low = (1 << nbits) - 1
        col = jax.lax.broadcasted_iota(jnp.int32, (b, npad), dimension=1)
        valid = col < n_valid

        # init: +inf (packed) on valid lanes; bitcast(-1.0) on padding —
        # negative floats sort below every packed d2 >= 0, so pads are
        # never the argmax and stay losers of every min-update.
        inf_key = (
            jax.lax.bitcast_convert_type(
                jnp.full((b, npad), 3.4e38, jnp.float32), jnp.int32
            )
            & ~low
        ) | col
        neg_key = jax.lax.bitcast_convert_type(
            jnp.full((b, npad), -1.0, jnp.float32), jnp.int32
        )
        dist_ref[:, :] = jnp.where(valid, inf_key, neg_key)

        start = start_ref[:, 0]  # (B,)
        out_ref[0, :] = start
        v = xyz_ref[:, :, :]  # (3, B, Np)

        def body(i, last):
            # last: (B,) int32 indices of the most recent selection.
            # Extraction of the selected coordinates runs as ONE masked
            # reduction over the (3, B, Np) coordinate planes instead of
            # three separate (B, Np) sums (the reduction launches dominated
            # the extraction cost; a stacked (3B, Np) 2-D form hit Mosaic's
            # "input offsets outside of the first tile" on sublane slices at
            # some batch sizes — static plane indexing avoids it).
            onehot = (col == last[:, None]).astype(jnp.float32)  # (B, Np)
            s3 = jnp.sum(v * onehot[None], axis=2, keepdims=True)  # (3, B, 1)
            dv = v - s3
            dsq = dv * dv
            d2 = dsq[0] + dsq[1] + dsq[2]  # >= 0 (sum of squares)
            d2key = (
                jax.lax.bitcast_convert_type(d2, jnp.int32) & ~low
            ) | col
            cache = jnp.minimum(
                dist_ref[:, :], jnp.where(valid, d2key, neg_key)
            )
            dist_ref[:, :] = cache
            nxt = jnp.max(cache, axis=1) & low  # (B,) — argmax IS the low bits
            out_ref[i, :] = nxt
            return nxt

        jax.lax.fori_loop(1, n_samples, body, start)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_samples",))
def fps_pallas_batched(
    xyz: jax.Array, n_samples: int, start_idx: jax.Array
) -> jax.Array:
    """FPS over a batch of clouds.

    Args:
      xyz: (B, N, 3) float positions.
      n_samples: static selection count.
      start_idx: (B,) int32 first indices.

    Returns:
      (B, n_samples) int32 indices.
    """
    b, n, _ = xyz.shape
    npad = _round_up(n, _LANE)
    xt = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (B, 3, N)
    if npad != n:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, npad - n)))
    # coordinate planes leading: (3, B, Np) so the kernel's coordinate
    # extraction is one wide reduction with static plane indexing
    x3 = jnp.swapaxes(xt, 0, 1)
    start = start_idx.astype(jnp.int32).reshape(b, 1)

    # Batch-block the kernel when the whole flattened batch would blow the
    # ~16 MB scoped-VMEM limit (measured: B_eff=512 x Np=2048 compiles to a
    # 16.41M stack alloc and is rejected — r4 batch sweep at eval b=256,
    # fps_parts=2). Whole-array VMEM ~= coords (3*bb*Np*4) + packed-key
    # cache (bb*Np*4) + out (n_samples*bb*4). Two regimes:
    #   - fits whole-batch (<= ~12M measured-safe): keep the ungridded call
    #     (no block windows, single-buffered).
    #   - else: batch-grid it. Mosaic DOUBLE-buffers gridded block windows
    #     (measured: bb=256 blocks of 8.9M compile to a 21.27M stack
    #     alloc), so the per-block budget must leave 2x headroom.
    # Blocks are independent clouds: splitting is bitwise-identical to the
    # whole-batch call.
    whole_budget = int(os.environ.get("STRATANET2_FPS_VMEM_BUDGET", 12_000_000))
    block_budget = whole_budget // 2

    def _cost(bb: int) -> int:
        return 4 * bb * (4 * npad + n_samples)

    if _cost(b) <= whole_budget:
        out = pl.pallas_call(
            _fps_kernel(n_samples, n),
            name="fps",
            out_shape=_sds((n_samples, b), jnp.int32, like=x3),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((b, npad), jnp.int32)],
            interpret=jax.default_backend() != "tpu",
        )(start, x3)
        return out.T

    bb = 1
    for d in range(b, 0, -1):
        if b % d == 0 and _cost(d) <= block_budget:
            bb = d
            break

    out = pl.pallas_call(
        _fps_kernel(n_samples, n),
        name="fps",
        grid=(b // bb,),
        out_shape=_sds((n_samples, b), jnp.int32, like=x3),
        in_specs=[
            pl.BlockSpec((bb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, bb, npad), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_samples, bb), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((bb, npad), jnp.int32)],
        interpret=jax.default_backend() != "tpu",
    )(start, x3)
    return out.T


def fps_pallas(xyz: jax.Array, n_samples: int, start_idx: jax.Array) -> jax.Array:
    """Single-cloud wrapper: (N, 3) -> (n_samples,)."""
    return fps_pallas_batched(xyz[None], n_samples, jnp.reshape(start_idx, (1,)))[0]


# ---------------------------------------------------------------------------
# fused kNN interpolation
# ---------------------------------------------------------------------------
#
# The lax path (ops/knn.py) materializes the (T, S) distance matrix in HBM
# and re-reads it for each of the k argmin passes (~3 GB of traffic for the
# FP1 stage at B=32, T=4096, S=1024). This kernel computes each distance
# tile in VMEM, runs the k exact argmin passes on-chip, and gathers the
# selected source features with a one-hot MXU matmul — HBM traffic drops to
# the inputs + outputs.


def _knn_kernel(k: int, s_valid: int):
    def kernel(tgtt_ref, src11_ref, featt_ref, out_ref, idx_ref, w_ref):
        # tgtt_ref: (1, 3, TC) TRANSPOSED targets; src11 (1, 11, S) bf16
        # rows [x9 hi/hi/lo | sn_hi | sn_lo]; featt_ref: (1, F, S)
        # transposed; out_ref: (1, F, TC) transposed; idx/w: (1, k, TC)
        #
        # Fully transposed orientation (same playbook as _sa_kernel): the
        # distance tile is (S, TC) via a dim-0-contracted dot of src rows
        # against the hi/lo split of the transposed targets, so each argmin
        # reduces over sublanes and yields a lane-major index — the one-hot
        # builds with no sublane<->lane relayout, and the gather matmul
        # sel^T (F, TC) = featsT (F, S) @ onehot^T (S, TC) puts F=34/64 on
        # the 8-padded M dim instead of the 128-padded N dim. (The earlier
        # half-transposed attempt kept the (TC, S) argmin and paid a ~4 MB
        # broadcast relayout per pass — that, not the small-M matmuls, is
        # what made it slow.) Feature values ride explicit hi/lo bf16: in
        # this orientation Mosaic demotes a single f32 dot to one bf16 pass.
        #
        # Round 5: the 11-wide contraction against [-2t9 | 1 | 1] emits the
        # finished selection metric dpart = |x|^2 - 2 x.t in ONE dot (the
        # target norm is constant per lane and cannot change the argmin) —
        # the per-chunk xn relayout + subtract + pad-where disappear. The
        # r3b rejection of a "norm-folded 11-row dot" was its SINGLE bf16
        # norm row (1e-3-scale d2 error); sn here rides a hi/lo SPLIT
        # (~2^-17 relative, the same scale as the existing cross-term
        # error). Exact dmin is still recovered by direct subtraction
        # against the GATHERED winner coordinates, so weights stay exact.
        # Callers that lane-pad sources must poison the sn rows (1e30).
        tc = tgtt_ref.shape[2]
        s = src11_ref.shape[2]
        tgt3 = tgtt_ref[0]  # (3, TC) f32
        thi = tgt3.astype(jnp.bfloat16)
        tlo = (tgt3 - thi.astype(jnp.float32)).astype(jnp.bfloat16)
        one = jnp.ones((1, tc), jnp.bfloat16)
        t11t = jnp.concatenate(
            [-2.0 * thi, -2.0 * tlo, -2.0 * thi, one, one], axis=0
        )  # (11, TC); -2 scale is exact (power of two)
        dn_ab = (((0,), (0,)), ((), ()))  # src11 (11, S) . t11t (11, TC)
        dpart = jax.lax.dot_general(
            src11_ref[0], t11t, dn_ab, preferred_element_type=jnp.float32
        )  # (S, TC) finished selection metric
        rows2 = jax.lax.broadcasted_iota(jnp.int32, (s, tc), 0)

        featst = featt_ref[0]  # (F, S)
        fhi = featst.astype(jnp.bfloat16)
        flo = (featst - fhi.astype(jnp.float32)).astype(jnp.bfloat16)
        # ONE stacked gather operand [f_hi; x_hi; f_lo; x_lo] (2F+6, S):
        # the MXU pads the M dim to 128 rows regardless, so a separate
        # hi/lo dot PAIR costs twice one dot even at F+3=37 rows — stacking
        # both halves into one operand halves the gather MXU work (the
        # gather dots are the kernel's dominant FLOPs: padded-M 128 x TC x
        # S per dot vs the 9-row distance dot). The coordinate rows ride
        # along so the winner's exact position (hi+lo, ~1e-5 relative)
        # comes out of the same dot and dmin = |x_sel - t|^2 by direct
        # subtraction.
        fx = jnp.concatenate(
            [fhi, src11_ref[0, 0:3], flo, src11_ref[0, 6:9]], axis=0
        )  # (2F+6, S)
        f = featst.shape[0]
        acc = jnp.zeros((out_ref.shape[1], tc), jnp.float32)
        wsum = jnp.zeros((1, tc), jnp.float32)
        ws, idxs = [], []
        dn_gather = (((1,), (0,)), ((), ()))  # (2F+6, S) @ (S, TC)

        # Hand software-pipelined k-loop (roofline: the fwd previously sat
        # AT its no-overlap MXU+VPU bound because each gather dot's result
        # was consumed immediately, so the in-order schedule stalled the
        # VPU on the MXU every pass). Here pass j+1's argmin/one-hot/mask
        # (pure VPU, independent of dot_j) are issued BETWEEN dot_j and its
        # consumers (dmin/w/acc), letting the MXU crunch dot_j while the
        # VPU finds the next winner. Pure reorder of independent ops —
        # bit-exact same arithmetic per element.
        def select(dp):
            idx = jnp.argmin(dp, axis=0).astype(jnp.int32)[None, :]
            hit = rows2 == idx  # (S, TC)
            selx = jax.lax.dot_general(
                fx,
                hit.astype(jnp.bfloat16),
                dn_gather,
                preferred_element_type=jnp.float32,
            )  # (2F+6, TC) — issued; not consumed until after the next argmin
            return idx, hit, selx

        def consume(selx):
            sel = selx[: f + 3] + selx[f + 3 :]  # hi + lo, (F+3, TC)
            dxyz = sel[f:] - tgt3  # (3, TC)
            dmin = jnp.sum(dxyz * dxyz, axis=0, keepdims=True)  # exact |x-t|^2
            w = 1.0 / jnp.maximum(dmin, 1e-16)  # (1, TC)
            return sel, w

        idx, hit, selx = select(dpart)
        idxs.append(idx)
        for j in range(1, k):
            dpart = jnp.where(hit, jnp.float32(3.4e38), dpart)
            idx, hit, selx_next = select(dpart)
            idxs.append(idx)
            sel, w = consume(selx)  # waits on dot_{j-1} only
            acc = acc + sel[:f] * w
            wsum = wsum + w
            ws.append(w)
            selx = selx_next
        sel, w = consume(selx)
        acc = acc + sel[:f] * w
        wsum = wsum + w
        ws.append(w)
        out_ref[0] = acc / wsum
        # idx/w ride a (k, TC) layout: a (TC, k) block would put k on the
        # 128-lane tile dim, inflating the HBM array ~40x and dragging
        # multi-ms pad/broadcast/copy ops into the VJP (seen in the step
        # trace as s32[20,40448,1]-style data formatting).
        idx_ref[0] = jnp.concatenate(idxs, axis=0)
        w_ref[0] = jnp.concatenate(ws, axis=0) / wsum

    return kernel


def _knn_pallas_raw(x_src, pos_src, pos_tgt, k: int, tc: int = 0):
    b, s, f = x_src.shape
    t = pos_tgt.shape[1]
    if tc <= 0:
        # adapt the target tile to VMEM: the kernel holds the (tc, S)
        # distance tile plus a same-size one-hot per argmin pass (~3 live
        # (tc, S) f32 buffers) and the (S, F) feature table. Round-3
        # calibration against the 16 MB scoped-vmem limit: budget 16e6 ->
        # tc=512 at s=2500 (tc=768 OOMs; tc 256->512 cut PROD FP1
        # 6.6 -> 5.2 ms — per-chunk fixed work dominates). Round-4 v5e
        # re-calibration: the software-pipelined kernel's extra live
        # (S, tc) bf16 one-hot still COMPILES at budget 16e6 / tc=512
        # (the 3-f32-buffer model has ~17% slack) and runs 3.66 ms at
        # PROD — the interim 13e6 default (tc=384) measured 4.72 ms, so
        # 16e6 is restored. STRATANET2_KNN_TC_BUDGET overrides.
        budget = int(os.environ.get("STRATANET2_KNN_TC_BUDGET", 16_000_000))
        tc = max(128, min(1024, (budget // (s * 4 * 3)) // 128 * 128))
    tc = min(tc, t)
    tpad = _round_up(t, tc)
    if tpad != t:
        pos_tgt = jnp.concatenate(
            [pos_tgt, jnp.broadcast_to(pos_tgt[:, :1], (b, tpad - t, 3))], axis=1
        )
    n_chunks = tpad // tc

    srct = jnp.swapaxes(pos_src.astype(jnp.float32), 1, 2)  # (B, 3, S)
    sn = jnp.sum(srct * srct, axis=1, keepdims=True)  # (B, 1, S)
    snh = jax.lax.reduce_precision(sn, exponent_bits=8, mantissa_bits=7)
    src11 = jnp.concatenate(
        [
            _hilo9_rows(srct),
            snh.astype(jnp.bfloat16),
            (sn - snh).astype(jnp.bfloat16),
        ],
        axis=1,
    )  # (B, 11, S): [x9 | sn_hi | sn_lo], pairs the kernel's t11t
    tgtt = jnp.swapaxes(pos_tgt.astype(jnp.float32), 1, 2)  # (B, 3, Tpad)
    xt = jnp.swapaxes(x_src.astype(jnp.float32), 1, 2)  # (B, F, S)

    outt, idx, w = pl.pallas_call(
        _knn_kernel(k, s),
        name="knn_fwd",
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 3, tc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 11, s), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, s), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, f, tc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, tc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, tc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            _sds((b, f, tpad), jnp.float32, like=xt),
            _sds((b, k, tpad), jnp.int32, like=xt),
            _sds((b, k, tpad), jnp.float32, like=xt),
        ),
        interpret=jax.default_backend() != "tpu",
    )(tgtt, src11, xt)
    out = jnp.swapaxes(outt, 1, 2)
    # idx/w stay in their (B, k, T) layout — consumed only by the scatter VJP
    return out[:, :t], idx[:, :, :t], w[:, :, :t]


def _knn_scatter_kernel(k: int):
    def kernel(idx_ref, w_ref, gt_ref, out_ref):
        # idx/w (1, k, TC) (k on sublanes, see _knn_kernel); gt (1, F, TC)
        # TRANSPOSED cotangents; out (1, F, SP) f32, accumulated across
        # target-chunk grid steps.
        #
        # The matmuls run TRANSPOSED — dx^T (F, SP) = wg^T (F, TC) @ onehot
        # (TC, SP) — so the small feature count rides the M (sublane) dim,
        # padded to 8, instead of the N (lane) dim, padded to 128: at F=16/34
        # the untransposed form wastes 4-8x of the MXU (measured 11.2 ms of
        # scatter per PROD train step, the single largest item in the step
        # trace).
        tc = idx_ref.shape[2]
        spad = out_ref.shape[2]
        cols = jax.lax.broadcasted_iota(jnp.int32, (tc, spad), 1)
        gt = gt_ref[0]  # (F, TC)
        acc = jnp.zeros((out_ref.shape[1], spad), jnp.float32)
        dn = (((1,), (0,)), ((), ()))  # (F, TC) @ (TC, SP)
        fdim = out_ref.shape[1]

        # Hand software-pipelined like _knn_kernel: pass j+1's one-hot
        # build + hi/lo split (pure VPU) are issued BETWEEN dot_j and its
        # accumulation, so the VPU prepares the next operands while the
        # MXU crunches the current dot. Pure reorder — bit-exact.
        def prep(j):
            onehot = (cols == idx_ref[0, j, :][:, None]).astype(jnp.bfloat16)
            wg = gt * w_ref[0, j, :][None, :]  # (F, TC) f32
            hi = wg.astype(jnp.bfloat16)
            lo = (wg - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            # stacked hi/lo halves in one dot (see _knn_kernel: a dot PAIR
            # pays the per-dot fixed cost twice; M just streams)
            hl = jnp.concatenate([hi, lo], axis=0)  # (2F, TC)
            return jax.lax.dot_general(
                hl, onehot, dn, preferred_element_type=jnp.float32
            )  # (2F, SP)

        d = prep(0)
        for j in range(1, k):
            d_next = prep(j)
            acc = acc + d[:fdim] + d[fdim:]
            d = d_next
        acc = acc + d[:fdim] + d[fdim:]

        jc = pl.program_id(1)

        @pl.when(jc == 0)
        def _init():
            out_ref[0] = acc

        @pl.when(jc > 0)
        def _accum():
            out_ref[0] = out_ref[0] + acc

    return kernel


def _knn_scatter_pallas(idx, w, g, s: int):
    """Transpose of the kNN gather: dx[b, idx[b,t,j]] += w[b,t,j] * g[b,t].

    The XLA scatter-add (segment_sum) serializes on TPU (~10 ms at the FP1
    PROD geometry); here each target chunk builds its one-hot in VMEM and
    accumulates via MXU matmuls (~1 ms). Cotangents ride hi/lo-split bf16
    matmuls, f32-exact to lo rounding (~2^-17 relative).
    """
    b, k, t = idx.shape
    f = g.shape[2]
    tc_cap = int(os.environ.get("STRATANET2_KNN_SCATTER_TC", 512))
    tc = max(128, min(tc_cap, _round_up(t, 128) // max(1, t // tc_cap)))
    tc = min(tc, _round_up(t, 8))
    tpad = _round_up(t, tc)
    if tpad != t:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, tpad - t)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, tpad - t)))
        g = jnp.pad(g, ((0, 0), (0, tpad - t), (0, 0)))  # zero cotangents
    spad = _round_up(s, _LANE)
    gt = jnp.swapaxes(g.astype(jnp.float32), 1, 2)  # (B, F, Tpad)

    out = pl.pallas_call(
        _knn_scatter_kernel(k),
        name="knn_scatter_bwd",
        grid=(b, tpad // tc),
        in_specs=[
            pl.BlockSpec((1, k, tc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, tc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, tc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, f, spad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=_sds((b, f, spad), jnp.float32, like=gt),
        interpret=jax.default_backend() != "tpu",
    )(idx, w.astype(jnp.float32), gt)
    return jnp.swapaxes(out, 1, 2)[:, :s]


def scatter_add_pallas(idx: jax.Array, vals: jax.Array, n: int) -> jax.Array:
    """out[b, idx[b, m]] += vals[b, m] for flat index lists: (B, M) int32,
    (B, M, F) values -> (B, n, F). MXU one-hot formulation of the XLA
    scatter-add (which serializes on TPU). Used as the VJP of differentiable
    gathers (`gather_rows`) and exercised by the kNN VJP."""
    b, m = idx.shape
    return _knn_scatter_pallas(
        idx[:, None, :], jnp.ones((b, 1, m), jnp.float32), vals, n
    )


def gather_rows_raw(x: jax.Array, idx: jax.Array) -> jax.Array:
    b, n, f = x.shape
    flat = x.reshape(b * n, f)
    off = (jnp.arange(b, dtype=idx.dtype) * n).reshape((b,) + (1,) * (idx.ndim - 1))
    out = jnp.take(flat, (idx + off).reshape(-1), axis=0)
    return out.reshape(idx.shape + (f,))


@jax.custom_vjp
def _gather_rows_vjp(x: jax.Array, idx: jax.Array) -> jax.Array:
    return gather_rows_raw(x, idx)


def gather_rows(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched gather: x (B, N, F), idx (B, ...) -> (B, ..., F).

    Flattens the batch into axis 0 and gathers with offset indices — XLA
    lowers this to an efficient row gather on TPU, unlike the vmapped fancy
    index or take_along_axis forms (~10x slower, measured on v5e). The VJP
    is the MXU one-hot scatter (`scatter_add_pallas`): the default jnp.take
    transpose is an XLA scatter-add, which serializes on TPU.

    Under shard_map(check_vma=True) (point-sharded training) on a NON-TPU
    backend the raw path with the default XLA transpose is used instead:
    interpret-mode pallas lowers block fetches as dynamic_slice with
    invariant grid indices, which the VMA checker rejects against varying
    operands. On the TPU backend the pallas VJP compiles (out_shape vma is
    declared via _sds(like=...)), so point-sharded training keeps the MXU
    one-hot scatter instead of paying XLA's serialized scatter-add
    (advisor r3)."""
    try:
        if jax.typeof(x).vma and jax.default_backend() != "tpu":
            return gather_rows_raw(x, idx)
    except (AttributeError, TypeError):
        pass
    return _gather_rows_vjp(x, idx)


def _gather_rows_fwd(x, idx):
    token = jnp.zeros(x.shape + (0,), x.dtype)
    return gather_rows_raw(x, idx), (idx, token)


def _gather_rows_bwd(res, g):
    idx, token = res
    b, n, f, _ = token.shape
    dx = scatter_add_pallas(
        idx.reshape(b, -1).astype(jnp.int32), g.reshape(b, -1, f), n
    )
    return dx.astype(token.dtype), None


_gather_rows_vjp.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@functools.lru_cache(maxsize=None)
def _knn_pallas_for_k(k: int):
    """custom_vjp closure for a given (static) k.

    Differentiable in x_src; positions are treated as constants (they are
    raw input coordinates in this model, never parameter-dependent — the
    reference's knn index search also runs under no_grad,
    torch_geometric knn_interpolate)."""

    @jax.custom_vjp
    def knn(x_src, pos_src, pos_tgt):
        out, _idx, _w = _knn_pallas_raw(x_src, pos_src, pos_tgt, k)
        return out.astype(x_src.dtype)

    def fwd(x_src, pos_src, pos_tgt):
        out, idx, w = _knn_pallas_raw(x_src, pos_src, pos_tgt, k)
        # zero-size token carries the source shape/dtype into bwd
        token = jnp.zeros((x_src.shape[0], x_src.shape[1], x_src.shape[2], 0), x_src.dtype)
        return out.astype(x_src.dtype), (idx, w, token)

    def bwd(res, g):
        idx, w, token = res
        b, s, f, _ = token.shape
        src_dtype = token.dtype
        t = idx.shape[2]  # idx layout is (B, k, T) — advisor r2: shape[1] is k
        # dx_src[b, idx[b,t,j]] += w[b,t,j] * g[b,t] — MXU one-hot scatter
        dx = _knn_scatter_pallas(idx, w, g, s)
        zeros3 = jnp.zeros((b, s, 3), jnp.float32)
        zeros_t = jnp.zeros((b, t, 3), jnp.float32)
        return dx.astype(src_dtype), zeros3, zeros_t

    knn.defvjp(fwd, bwd)
    return knn


def knn_interpolate_pallas(x_src, pos_src, pos_tgt, k: int = 3):
    """Batched fused kNN interpolation: (B,S,F), (B,S,3), (B,T,3) -> (B,T,F).

    Exact inverse-d^2 k-NN (torch_geometric semantics, same as ops.knn)."""
    return _knn_pallas_for_k(int(k))(x_src, pos_src, pos_tgt)


# ---------------------------------------------------------------------------
# grouped ball query (indices only)
# ---------------------------------------------------------------------------
#
# Selection part of the fused SA kernel, exposed standalone for the TRAINING
# path: the XLA formulation materializes the (B, C, N) distance matrix in
# HBM (~2 GB at the reference's PROD geometry); here each (CC, G) distance
# tile lives only in VMEM. Outputs are indices + mask (no gradient flows
# through selection), so no custom VJP is needed.


def _grouped_layout(points: jax.Array, k: int, align: int = _LANE):
    """(B, N, 3) -> (B, 3, K*G) with each group align-rounded (G =
    ceil(N/k) rounded to `align`). Group gi holds original points
    [gi*g_real, gi*g_real + g_real) in lanes [gi*G, gi*G + g_real); tail
    lanes are zero padding.

    align=128 (lane) lets kernels slice per-group LANE views of tables
    with no relayout; the fully-transposed bq kernel only ever slices
    per-group SUBLANE views of the (K*G, CC) distance tile, so align=8
    (f32 sublane granularity) suffices there and cuts the group padding
    (bq1 PROD: G 384 -> 320; bq2: 128 -> 40)."""
    b, n, _ = points.shape
    g_real = -(-n // k)
    g = _round_up(g_real, align)
    xyz = points
    if k * g_real != n:
        xyz = jnp.pad(xyz, ((0, 0), (0, k * g_real - n), (0, 0)))
    xg = xyz.reshape(b, k, g_real, 3)
    if g != g_real:
        xg = jnp.pad(xg, ((0, 0), (0, 0), (0, g - g_real), (0, 0)))
    xt = jnp.swapaxes(xg.reshape(b, k * g, 3), 1, 2)
    return xt.astype(jnp.float32), g_real, g


def _block_layout(x: jax.Array, k: int, blk: int, g_real: int, g: int):
    """(B, N, F) -> (B, nb, F, blk*G) block-batched grouped layout: block bi
    holds groups [bi*blk, (bi+1)*blk), each lane-aligned as in
    `_grouped_layout`."""
    b, n, f = x.shape
    nb = k // blk
    if k * g_real != n:
        x = jnp.pad(x, ((0, 0), (0, k * g_real - n), (0, 0)))
    xg = x.reshape(b, nb, blk, g_real, f)
    if g != g_real:
        xg = jnp.pad(xg, ((0, 0), (0, 0), (0, 0), (0, g - g_real), (0, 0)))
    xg = jnp.moveaxis(xg, -1, 2)  # (b, nb, f, blk, g)
    return xg.reshape(b, nb, f, blk * g)


def _group_blocks(k: int, g: int, cc: int = 512, budget: int = 12 * 2**20) -> int:
    """Groups batched per MXU distance matmul inside the selection kernels,
    bounded by VMEM for the (CC, blk*G) f32 result tile."""
    lanes = budget // (cc * 4)
    blk = max(1, min(k, 16, lanes // g))
    while k % blk:
        blk -= 1
    return blk


def _use_packed(g: int) -> bool:
    # The fused packed min+argmin wins for wide groups (bq1: 13.6 -> 4.6 ms)
    # but measured slower than plain min/argmin for narrow ones (bq2 g=128:
    # 4.0 -> 8.4 ms).
    return g >= 256


def _bq_kernel(k: int, g_real: int, n_valid: int, r2: float, blk: int):
    def kernel(centt_ref, x13_ref, idx_ref, mask_ref):
        # centt (1,3,CC) TRANSPOSED centroids; x13 (1,K/blk,13,blk*G) bf16
        # rows [x9 hi/hi/lo (9) | pn_hi | pn_lo | 1 | 1]; idx/mask (1,K,CC).
        #
        # FULLY transposed orientation (same playbook as _sa_kernel/_knn_
        # kernel, docs/KERNELS.md "full transposition beats half"): the
        # distance tile is (blk*G, CC) via ONE dim-0-contracted dot per
        # block, so each group's min/argmin reduces over SUBLANES and yields
        # a lane-major (1, CC) result — the where-merges into the (K, CC)
        # accumulators are cheap sublane broadcasts of lane vectors.
        #
        # Round 5: the WHOLE d2 = |x|^2 + |c|^2 - 2 x.c assembles inside
        # the dot — the c side carries [-2c9 | 1 | 1 | cn_hi | cn_lo]
        # so the 13-wide contraction emits finished distances (a <=128
        # contraction costs the same MXU rows as the 9-wide one), and
        # lane-pad/n_valid masking rides POISONED pn rows (host-set 1e30,
        # bf16-finite): padded points lose every argmin and fail every
        # radius test. Zero per-element VPU assemble or masking remains;
        # groups round to 8 sublanes instead of 128 lanes (bq1 G 384 ->
        # 320, bq2 128 -> 40) since only SUBLANE slices of the tile are
        # taken.
        #
        # fori_loop over group BLOCKS (not a Python unroll): argmin's
        # iota/select temporaries are (G, CC)-sized, and an unrolled loop
        # keeps all k of them live (~22 MB of scoped vmem, OOM).
        cc = centt_ref.shape[2]
        g = x13_ref.shape[3] // blk
        c3 = centt_ref[0]  # (3, CC) f32
        cn = jnp.sum(c3 * c3, axis=0, keepdims=True)  # (1, CC)
        hi = c3.astype(jnp.bfloat16)
        lo = (c3 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        cnh = cn.astype(jnp.bfloat16)
        cnl = (cn - cnh.astype(jnp.float32)).astype(jnp.bfloat16)
        one = jnp.ones((1, cc), jnp.bfloat16)
        c13t = jnp.concatenate(
            [-2.0 * hi, -2.0 * lo, -2.0 * hi, one, one, cnh, cnl], axis=0
        )  # (13, CC), pairs x13 rows; -2 scale is exact (power of two)
        rowg2 = jax.lax.broadcasted_iota(jnp.int32, (g, cc), 0)
        rowk = jax.lax.broadcasted_iota(jnp.int32, (k, cc), 0)
        dn_ab = (((0,), (0,)), ((), ()))  # x13 (13, blk*G) . c13t (13, CC)

        packed = _use_packed(g)
        nbits = max(1, (g - 1).bit_length())
        low = (1 << nbits) - 1

        def dot_block(bi):
            return jax.lax.dot_general(
                x13_ref[0, bi], c13t, dn_ab, preferred_element_type=jnp.float32
            )  # (blk*G, CC) finished d2 (poisoned rows ~1e30)

        def merge_block(bi, d2_t, idx_acc, mask_acc):
            for l in range(blk):
                gi = bi * blk + l
                sl = slice(l * g, (l + 1) * g)
                if packed:
                    # the bit-trick needs d2 >= 0: int32 order is REVERSED
                    # among negative floats, and hi/lo rounding can leave
                    # small negatives near self-matches (docs/KERNELS.md
                    # round-3 NaN lesson)
                    d2 = jnp.maximum(d2_t[sl], 0.0)  # (G, CC)
                    key = (
                        jax.lax.bitcast_convert_type(d2, jnp.int32) & ~low
                    ) | rowg2
                    kmin = jnp.min(key, axis=0, keepdims=True)  # (1, CC)
                    within = kmin & low
                    dmin = jax.lax.bitcast_convert_type(kmin & ~low, jnp.float32)
                else:
                    # unpacked min/argmin are sign-safe: no clamp needed
                    d2 = d2_t[sl]
                    dmin = jnp.min(d2, axis=0, keepdims=True)
                    within = jnp.argmin(d2, axis=0).astype(jnp.int32)[None, :]
                valid = dmin <= r2  # (1, CC)
                here = rowk == gi  # (K, CC)
                gidx = jnp.where(valid, within + gi * g_real, 0)  # (1, CC)
                idx_acc = jnp.where(here, gidx, idx_acc)
                mask_acc = jnp.where(here, valid.astype(jnp.int32), mask_acc)
            return idx_acc, mask_acc

        # Serial dot -> merge loop, ONE live (blk*G, CC) f32 tile so the
        # full 12 MiB block budget fits. A round-4 cross-block software
        # pipeline (prefetch dot bi+1 before merging bi, block budget
        # halved so two tiles fit) MEASURED SLOWER on v5e: 1.96 -> 2.86
        # ms/step at PROD — Mosaic schedules by dependence, not program
        # order, so the reorder bought no MXU/VPU overlap while the
        # halved blk (16 -> 8) doubled the per-dot fixed cost. Reverted;
        # see docs/KERNELS.md "software pipelining".
        idx0 = jnp.zeros((k, cc), jnp.int32)
        m0 = jnp.zeros((k, cc), jnp.int32)

        def body(bi, carry):
            idx_acc, mask_acc = carry
            return merge_block(bi, dot_block(bi), idx_acc, mask_acc)

        idx_out, mask_out = jax.lax.fori_loop(0, k // blk, body, (idx0, m0))
        idx_ref[0] = idx_out
        mask_ref[0] = mask_out

    return kernel


@functools.partial(jax.jit, static_argnames=("radius", "k", "cc", "layout"))
def ball_query_grouped_pallas(
    centroids: jax.Array,  # (B, C, 3)
    points: jax.Array,  # (B, N, 3)
    radius: float,
    k: int,
    cc: int = 512,
    layout: str = "ck",
):
    """Grouped ball query (ops.ball_query method='grouped' semantics) with
    VMEM-resident distance tiles.

    layout="ck" returns ((B, C, k) int32, (B, C, k) bool) — the historical
    API. layout="kc" returns the kernel-native ((B, k, C), (B, k, C)) with
    K on sublanes — no transpose on the way out; the SA training path
    consumes this directly (the (B, C, k) form costs two HBM relayouts)."""
    b, n, _ = points.shape
    c = centroids.shape[1]
    # align=8: the transposed kernel only takes SUBLANE slices of the
    # distance tile, so groups need 8-row (not 128-lane) alignment —
    # bq1 PROD G 384 -> 320, bq2 128 -> 40 (docs/KERNELS.md round 5)
    xt, g_real, g = _grouped_layout(points, k, align=8)
    xt9 = _hilo9_rows(xt)  # (B, 9, K*G) bf16
    pn = jnp.sum(xt * xt, axis=1, keepdims=True)  # (B, 1, K*G) f32
    # POISON padded rows (in-group tail + beyond-n): 1e30 (bf16-finite)
    # loses every argmin and fails every radius test, so the kernel needs
    # no pad mask at all. Membership: lane j belongs to group j // g at
    # within-group row j % g, which is real iff row < g_real and the
    # original point index (j//g)*g_real + row < n.
    lane = jnp.arange(k * g)
    row = lane % g
    orig = (lane // g) * g_real + row
    pad_mask = (row >= g_real) | (orig >= n)
    pn = jnp.where(pad_mask[None, None, :], jnp.float32(1e30), pn)
    pnh = jax.lax.reduce_precision(pn, exponent_bits=8, mantissa_bits=7)
    x13 = jnp.concatenate(
        [
            xt9,
            pnh.astype(jnp.bfloat16),
            (pn - pnh).astype(jnp.bfloat16),
            jnp.ones((b, 2, k * g), jnp.bfloat16),
        ],
        axis=1,
    )  # (B, 13, K*G): [x9 | pn_hi | pn_lo | 1 | 1], pairs the kernel's c13t
    # Full 12 MiB block budget (one live (blk*G, CC) f32 distance tile —
    # the serial kernel loop). STRATANET2_BQ_BLOCK_BUDGET overrides
    # (bytes) — bench.py's compile-failure retry path shrinks it if
    # Mosaic rejects the default.
    blk = _group_blocks(
        k, g, budget=int(os.environ.get("STRATANET2_BQ_BLOCK_BUDGET", 12 * 2**20))
    )
    nb = k // blk
    x13 = x13.reshape(b, 13, nb, blk * g).swapaxes(1, 2)  # (B, nb, 13, blk*G)

    cc = min(cc, c)
    cpad = _round_up(c, cc)
    cent = centroids
    if cpad != c:
        cent = jnp.pad(cent, ((0, 0), (0, cpad - c), (0, 0)))
    centt = jnp.swapaxes(cent.astype(jnp.float32), 1, 2)  # (B, 3, Cpad)

    idx, mask = pl.pallas_call(
        _bq_kernel(k, g_real, n, float(radius) ** 2, blk),
        name="ball_query",
        grid=(b, cpad // cc),
        in_specs=[
            pl.BlockSpec((1, 3, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, 13, blk * g), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, k, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            _sds((b, k, cpad), jnp.int32, like=x13),
            _sds((b, k, cpad), jnp.int32, like=x13),
        ),
        interpret=jax.default_backend() != "tpu",
    )(centt, x13)
    if layout == "kc":
        return idx[:, :, :c], mask[:, :, :c].astype(bool)
    idx = jnp.swapaxes(idx, 1, 2)
    mask = jnp.swapaxes(mask, 1, 2)
    return idx[:, :c], mask[:, :c].astype(bool)


# ---------------------------------------------------------------------------
# fused set-abstraction interior (eval path)
# ---------------------------------------------------------------------------
#
# Fuses grouped ball query + neighbor gather + the per-edge shared MLP +
# masked max into one kernel (the SAModule interior, reference
# model/point_net2.py:14-29). Two tricks make this cheap:
#   1. the first Linear layer distributes over the edge concat
#      [x_j, pos_j - pos_c] @ W1 = (x_j@W1x + pos_j@W1p) - pos_c@W1p, so a
#      per-POINT projection q (N, C1) is computed once outside on the MXU
#      and each edge costs one subtraction instead of a (K*C, F) gather;
#   2. eval-mode BatchNorm folds into per-channel affines.
# The (C, N) distance tile, the per-group argmin selection, the one-hot
# MXU gathers of q, and both MLP layers all stay in VMEM — the XLA path
# materializes each of these to HBM (~6 ms of the forward at K=32/64).
# Training keeps the unfused path (batch statistics need the global edge
# tensor); selection semantics are identical (grouped ball query).


def _sa_kernel(
    k: int,
    g_real: int,
    n_valid: int,
    r2: float,
    two_layer: bool,
    blk: int,
    compact_q: bool = False,
):
    def kernel(centt_ref, ctermt_ref, x13_ref, q_ref, aff_ref, w2t_ref, out_ref):
        # centt (1,3,CC) TRANSPOSED centroids; ctermt (1,C1,CC) transposed
        # centroid terms; x13 (1,nb,13,blk*G) — or (1,13,Npad) compact —
        # bf16 rows [x9 hi/hi/lo | pn_hi | pn_lo | 1 | 1]; q
        # (1,nb,C1,blk*G) f32 (channel-on-sublane / points-on-lane layout:
        # the G axis sits on lanes so the small channel axes don't pad to
        # 128), or compact (1,C1,Npad);
        # aff (6, Cmax): rows a1,c1,b2,a2,c2,unused; w2t (C2,C1) transposed
        # out (1, C2, CC) transposed
        #
        # The WHOLE kernel runs in centroids-on-lanes orientation: distances
        # are computed TRANSPOSED (G, CC), so the per-group argmin reduces
        # over sublanes and its result is a lane vector — the one-hot for the
        # q gather and the validity mask then build with no sublane<->lane
        # relayouts (a (CC,)-sublane-major idx broadcast across a (G, CC)
        # tile materialized ~4 MB per group and blew scoped VMEM). The q
        # gather matmul is sel^T (C1, CC) = q (C1, G) @ onehot^T (G, CC):
        # C1=16 rides the 8-padded M dim instead of the 128-padded N dim
        # (8x less MXU work), and the affine/relu/max epilogue touches 4x
        # fewer vregs ((16, CC) tiles vs (CC, 128-padded-16)).
        #
        # Round 5 (docs/KERNELS.md bq section, applied here too): the
        # 13-wide contraction against [-2c9 | 1 | 1 | cn_hi | cn_lo] emits
        # FINISHED d2 tiles at the same MXU cost as the 9-wide cross term;
        # pad/n_valid masking rides host-POISONED pn rows (1e30), so zero
        # per-element assemble or masking VPU work remains.
        cc = centt_ref.shape[2]
        c1 = q_ref.shape[1] if compact_q else q_ref.shape[2]
        c2 = out_ref.shape[1]
        c3 = centt_ref[0]  # (3, CC) f32
        ctermt = ctermt_ref[0]  # (C1, CC)
        cn = jnp.sum(c3 * c3, axis=0, keepdims=True)  # (1, CC)
        hi = c3.astype(jnp.bfloat16)
        lo = (c3 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        cnh = cn.astype(jnp.bfloat16)
        cnl = (cn - cnh.astype(jnp.float32)).astype(jnp.bfloat16)
        one = jnp.ones((1, cc), jnp.bfloat16)
        c13t = jnp.concatenate(
            [-2.0 * hi, -2.0 * lo, -2.0 * hi, one, one, cnh, cnl], axis=0
        )  # (13, CC), pairs x13 rows; -2 scale is exact (power of two)
        a1 = aff_ref[0, :c1][:, None]
        c1v = aff_ref[1, :c1][:, None]
        dn_ab = (((0,), (0,)), ((), ()))  # x13 (13, L) . c13t (13, CC)
        dn_gather = (((1,), (0,)), ((), ()))  # (C1, G) @ (G, CC)

        def epilogue(sel, valid, maxacc):
            e = jax.nn.relu(sel - ctermt) * a1 + c1v
            if two_layer:
                b2 = aff_ref[2, :c2][:, None]
                a2 = aff_ref[3, :c2][:, None]
                c2v = aff_ref[4, :c2][:, None]
                e = jnp.dot(w2t_ref[:, :], e, preferred_element_type=jnp.float32)
                e = jax.nn.relu(e + b2) * a2 + c2v
            e = jnp.where(valid, e, jnp.float32(-3.4e38))
            return jnp.maximum(maxacc, e)

        if compact_q:
            # COMPACT path (g_real << LANE, blk == LANE/g_real, g_real % 8
            # == 0): q/x13 stay COMPACT (C, N) in HBM — the _block_layout
            # lane pad (8x at the SA2 bench shape) + its relayout copy were
            # the top two non-kernel ops of the eval step. Each kernel block
            # covers EXACTLY one 128-lane tile = blk whole groups, so:
            #   * ONE (LANE, CC) distance dot serves all blk groups (the
            #     r4 per-group dots computed the same tile blk times with
            #     7/8 of the rows lane padding);
            #   * the per-group argmin is a static SUBLANE slice (g_real
            #     rows, 8-aligned) of that tile;
            #   * the winner one-hot keeps its (LANE, CC) contraction.
            # Always unpacked (g_real < 256): min/argmin/compare are
            # sign-safe, so no >= 0 clamp is needed on the dot's output.
            lane_b = blk * g_real
            rowc = jax.lax.broadcasted_iota(jnp.int32, (lane_b, cc), 0)

            def body_c(bi, maxacc):
                x13b = x13_ref[0, :, pl.ds(bi * lane_b, lane_b)]  # (13, LANE)
                qb = q_ref[0, :, pl.ds(bi * lane_b, lane_b)]
                qhl = _sa_hilo_stack(qb)  # (2C1, LANE)
                d2p = jax.lax.dot_general(
                    x13b, c13t, dn_ab, preferred_element_type=jnp.float32
                )  # (LANE, CC) finished d2 (poisoned rows ~1e30)
                for l in range(blk):
                    d2l = d2p[l * g_real : (l + 1) * g_real]  # (g_real, CC)
                    dmin = jnp.min(d2l, axis=0, keepdims=True)
                    idx = jnp.argmin(d2l, axis=0).astype(jnp.int32)[None, :]
                    valid = dmin <= r2  # (1, CC)
                    onehot_t = (rowc == (l * g_real + idx)).astype(
                        jnp.bfloat16
                    )  # (LANE, CC)
                    selhl = jax.lax.dot_general(
                        qhl, onehot_t, dn_gather,
                        preferred_element_type=jnp.float32,
                    )  # (2C1, CC)
                    maxacc = epilogue(selhl[:c1] + selhl[c1:], valid, maxacc)
                return maxacc

            init = jnp.full((c2, cc), -3.4e38, jnp.float32)
            out_ref[0] = jax.lax.fori_loop(0, k // blk, body_c, init)
            return

        g = q_ref.shape[3] // blk
        rowg2 = jax.lax.broadcasted_iota(jnp.int32, (g, cc), 0)
        packed = _use_packed(g)
        nbits = max(1, (g - 1).bit_length())
        low = (1 << nbits) - 1

        def body(bi, maxacc):
            x13b = x13_ref[0, bi]  # (13, blk*G) bf16
            qb = q_ref[0, bi]  # (C1, blk*G) f32
            # stacked hi/lo split so the one-hot gather runs as ONE bf16
            # matmul while returning the q values f32-exact (to lo
            # rounding, ~2^-17 relative) — 6x cheaper than a HIGHEST
            # f32 matmul
            qhl = _sa_hilo_stack(qb)  # (2C1, blk*G)
            # ONE block-wide dot for all blk groups (the old per-group dots
            # recomputed lane slices); per-group views are SUBLANE slices
            d2_t = jax.lax.dot_general(
                x13b, c13t, dn_ab, preferred_element_type=jnp.float32
            )  # (blk*G, CC) finished d2 (poisoned rows ~1e30)
            for l in range(blk):
                sl = slice(l * g, (l + 1) * g)
                if packed:
                    # bit-trick needs d2 >= 0 (docs/KERNELS.md r3 lesson);
                    # hi/lo rounding can leave small negatives near
                    # self-matches
                    d2 = jnp.maximum(d2_t[sl], 0.0)  # (G, CC)
                    key = (
                        jax.lax.bitcast_convert_type(d2, jnp.int32) & ~low
                    ) | rowg2
                    kmin = jnp.min(key, axis=0, keepdims=True)
                    idx = kmin & low  # (1, CC)
                    dmin = jax.lax.bitcast_convert_type(kmin & ~low, jnp.float32)
                else:
                    d2 = d2_t[sl]
                    dmin = jnp.min(d2, axis=0, keepdims=True)
                    idx = jnp.argmin(d2, axis=0).astype(jnp.int32)[None, :]
                valid = dmin <= r2  # (1, CC)
                onehot_t = (rowg2 == idx).astype(jnp.bfloat16)  # (G, CC)
                selhl = jax.lax.dot_general(
                    qhl[:, sl], onehot_t, dn_gather,
                    preferred_element_type=jnp.float32,
                )  # (2C1, CC) stacked halves, one dot (_sa_hilo_stack)
                maxacc = epilogue(selhl[:c1] + selhl[c1:], valid, maxacc)
            return maxacc

        init = jnp.full((c2, cc), -3.4e38, jnp.float32)
        out_ref[0] = jax.lax.fori_loop(0, k // blk, body, init)

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "cc", "radius"))
def sa_fused_eval(
    q: jax.Array,  # (B, N, C1) per-point layer-1 projection incl. bias
    xyz: jax.Array,  # (B, N, 3)
    centroids: jax.Array,  # (B, C, 3)
    cterm: jax.Array,  # (B, C, C1) centroid term of layer 1
    a1: jax.Array, c1: jax.Array,  # folded eval BN of layer 1, (C1,)
    w2, b2, a2, c2,  # layer 2 (or None for single-layer MLPs)
    radius: float,
    k: int,
    cc: int = 0,  # centroid chunk; 0 = adaptive whole-C (see below)
) -> jax.Array:
    b, n, ch1 = q.shape
    c = centroids.shape[1]
    two_layer = w2 is not None
    ch2 = w2.shape[1] if two_layer else ch1

    g_real = -(-n // k)
    g = _round_up(g_real, _LANE)
    if cc <= 0:
        # Adaptive whole-C chunk (r5 tile-size lesson, measured: PROD
        # serve fwd 6.20 -> 5.78 ms at whole C=2500 vs cc=1024 — the
        # per-chunk fixed work outweighed the smaller live tiles even
        # at blk=1), bounded so the (G, cc) f32 distance tile stays
        # within the block budget. STRATANET2_SA_EVAL_CC overrides.
        cc = int(os.environ.get("STRATANET2_SA_EVAL_CC", 0)) or max(
            1024,
            min(_round_up(c, _LANE), (6 * 2**20 // (g * 4)) // _LANE * _LANE),
        )
    cc = min(cc, c)
    # Compact-q (see _sa_kernel): engages for narrow groups, where blk is
    # pinned to LANE/g_real so each block's groups span exactly one
    # 128-lane tile of the compact q. The per-group temporaries stay small
    # there (cc is small at those shapes), so the blk<=4 VMEM cap below
    # does not apply.
    compact_q = (
        g_real < _LANE
        and _LANE % g_real == 0
        # static sublane slices of the block distance tile need 8-aligned
        # group rows (f32 sublane granularity)
        and g_real % 8 == 0
        and k % (_LANE // g_real) == 0
        # last block's q slice must stay inside the lane-padded compact q
        and k * g_real <= _round_up(n, _LANE)
    )
    if compact_q:
        blk = _LANE // g_real
    else:
        # blk capped at 4: the transposed epilogue's unrolled per-group
        # temporaries tipped scoped VMEM over 16 MB at blk=8 (bench SA1
        # shape); blk only batches the d2 matmul, so the cap costs little
        blk = min(4, _group_blocks(k, g, cc=cc, budget=6 * 2**20))
        while k % blk:
            blk -= 1
    nb = k // blk
    # Narrow groups (g_real << LANE) lane-pad the grouped tables by up to
    # LANE/g_real (8x at the SA2 bench shape) and force relayout copies —
    # the top two non-kernel ops of the eval step. Keep q AND the x13
    # distance table COMPACT (B, C, N) there; the kernel slices one
    # 128-lane tile per block and serves all its groups from ONE distance
    # dot (see _sa_kernel compact path). Both modes: the 13-row x table
    # is [x9 | pn_hi | pn_lo | 1 | 1] with lane-pad/n_valid masking
    # POISONED into pn (1e30, bf16-finite: padded points lose every
    # argmin and fail every radius test — no in-kernel pad mask).
    def _x13(xt, pad_mask):
        pn = jnp.sum(xt * xt, axis=-2, keepdims=True)
        pn = jnp.where(pad_mask, jnp.float32(1e30), pn)
        pnh = jax.lax.reduce_precision(pn, exponent_bits=8, mantissa_bits=7)
        ones = jnp.ones(pn.shape[:-2] + (2,) + pn.shape[-1:], jnp.bfloat16)
        return jnp.concatenate(
            [
                _hilo9_rows(xt),
                pnh.astype(jnp.bfloat16),
                (pn - pnh).astype(jnp.bfloat16),
                ones,
            ],
            axis=-2,
        )

    if compact_q:
        npadl = _round_up(n, _LANE)
        qg = jnp.swapaxes(q.astype(jnp.float32), 1, 2)  # (B, C1, N)
        xt = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (B, 3, N)
        if npadl != n:
            qg = jnp.pad(qg, ((0, 0), (0, 0), (0, npadl - n)))
            xt = jnp.pad(xt, ((0, 0), (0, 0), (0, npadl - n)))
        pad_mask = (jnp.arange(npadl) >= n)[None, None, :]
        x13 = _x13(xt, pad_mask)  # (B, 13, npadl) bf16
    else:
        xb = _block_layout(xyz.astype(jnp.float32), k, blk, g_real, g)
        # lane j of block bi holds group l = j // g, within-row j % g; real
        # iff row < g_real and (bi*blk + l)*g_real + row < n
        lane = jnp.arange(blk * g)
        row = lane % g
        orig = (
            (jnp.arange(nb)[:, None] * blk + (lane // g)[None, :]) * g_real
            + row[None, :]
        )  # (nb, blk*G)
        pad_mask = ((row >= g_real)[None, :] | (orig >= n))[None, :, None, :]
        x13 = _x13(xb, pad_mask)  # (B, nb, 13, blk*G) bf16
        qg = _block_layout(q.astype(jnp.float32), k, blk, g_real, g)

    cpad = _round_up(c, cc)
    if cpad != c:
        centroids = jnp.pad(centroids, ((0, 0), (0, cpad - c), (0, 0)))
        cterm = jnp.pad(cterm, ((0, 0), (0, cpad - c), (0, 0)))
    ctermt = jnp.swapaxes(cterm.astype(jnp.float32), 1, 2)  # (B, C1, Cpad)
    centt = jnp.swapaxes(centroids.astype(jnp.float32), 1, 2)  # (B, 3, Cpad)

    cmax = max(ch1, ch2)
    aff = jnp.zeros((6, cmax), jnp.float32)
    aff = aff.at[0, :ch1].set(a1).at[1, :ch1].set(c1)
    if two_layer:
        aff = aff.at[2, :ch2].set(b2).at[3, :ch2].set(a2).at[4, :ch2].set(c2)
        w2t = jnp.swapaxes(w2.astype(jnp.float32), 0, 1)  # (C2, C1)
    else:
        w2t = jnp.zeros((ch1, ch1), jnp.float32)

    if compact_q:
        q_spec = pl.BlockSpec(
            (1, ch1, qg.shape[2]), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        )
        x13_spec = pl.BlockSpec(
            (1, 13, x13.shape[2]), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        )
    else:
        q_spec = pl.BlockSpec(
            (1, nb, ch1, blk * g), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM
        )
        x13_spec = pl.BlockSpec(
            (1, nb, 13, blk * g), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM
        )
    outt = pl.pallas_call(
        _sa_kernel(k, g_real, n, float(radius) ** 2, two_layer, blk, compact_q),
        name="sa_fused",
        grid=(b, cpad // cc),
        in_specs=[
            pl.BlockSpec((1, 3, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch1, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            x13_spec,
            q_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ch2, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, ch2, cpad), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(
        centt, ctermt, x13, qg, aff, w2t
    )
    return jnp.swapaxes(outt, 1, 2)[:, :c]


# ---------------------------------------------------------------------------
# per-pixel max projection (scatter-max replacement)
# ---------------------------------------------------------------------------
#
# The projection ops (ops/projection.py, reference model/project_to_2d.py)
# need a per-pixel max of pointwise values over data-dependent pixel bins.
# jax.ops.segment_max lowers to a serialized TPU scatter, and the dense
# masked-max XLA form materializes / re-reads (P^2, N)-sized intermediates
# in HBM (~4 ms fwd + ~2 ms bwd per train step at the PROD geometry). Here
# the (P^2, NC) compare + select + max tiles live entirely in VMEM: one
# sequential pass over point chunks carries the running per-pixel (max,
# argmax) in scratch. The custom VJP routes each pixel's cotangent to its
# stored argmax point with the same chunked compare in VMEM (an exact
# one-winner max backward; XLA's scatter-add never appears).


def _pixel_max_kernel(n_pix: int, c: int, nc: int, p2p: int):
    def kernel(pix_ref, vals_ref, vmax_ref, amax_ref):
        # pix (1, 1, Np) int32; vals (1, C, Np) f32 (channel-on-sublane)
        # vmax (1, P2p, C) f32; amax (1, P2p, C) int32
        #
        # One grid step per cloud; the point-chunk loop is a fori_loop INSIDE
        # the kernel with the running per-pixel (max, argmax) columns as
        # vreg-resident carries — the grid-per-chunk form with VMEM scratch
        # accumulators measured ~40 us of overhead per grid step (5.1 ms vs
        # 4.2 ms fwd at the PROD geometry).
        n = pix_ref.shape[2]
        row = jax.lax.broadcasted_iota(jnp.int32, (p2p, nc), 0)
        neg = jnp.float32(-3.4e38)

        def body(j, carry):
            off = j * nc
            mask = pix_ref[0, :, pl.ds(off, nc)] == row  # padded pix = -1
            v = vals_ref[0, :, pl.ds(off, nc)]  # (C, nc)
            out = []
            for ci in range(c):
                vm, am = carry[2 * ci], carry[2 * ci + 1]  # (P2p, 1)
                e = jnp.where(mask, v[ci : ci + 1, :], neg)
                m = jnp.max(e, axis=1, keepdims=True)
                a = jnp.argmax(e, axis=1).astype(jnp.int32)[:, None] + off
                better = m > vm
                out.append(jnp.where(better, m, vm))
                out.append(jnp.where(better, a, am))
            return tuple(out)

        init = []
        for _ in range(c):
            init.append(jnp.full((p2p, 1), -3.4e38, jnp.float32))
            init.append(jnp.full((p2p, 1), -1, jnp.int32))
        final = jax.lax.fori_loop(0, n // nc, body, tuple(init))
        vmax_ref[0] = jnp.concatenate(final[0::2], axis=1)
        amax_ref[0] = jnp.concatenate(final[1::2], axis=1)

    return kernel


def _pixel_max_bwd_kernel(c: int):
    def kernel(amax_ref, g_ref, dv_ref):
        # amax/g (1, P2p, C); dv (1, C, NC) block for point chunk j
        j = pl.program_id(1)
        nc = dv_ref.shape[2]
        p2p = amax_ref.shape[1]
        col = jax.lax.broadcasted_iota(jnp.int32, (p2p, nc), 1) + j * nc
        am = amax_ref[0]  # (P2p, C); -1 for empty pixels never matches
        gg = g_ref[0]
        outs = []
        for ci in range(c):
            hit = am[:, ci : ci + 1] == col
            contrib = jnp.where(hit, gg[:, ci : ci + 1], 0.0)
            outs.append(jnp.sum(contrib, axis=0, keepdims=True))  # (1, NC)
        dv_ref[0] = jnp.concatenate(outs, axis=0)

    return kernel


def _pixel_chunk(n: int, n_pix: int, budget: int = 10 * 2**20) -> int:
    """Point-chunk width for the pixel-max kernels, bounded by VMEM for the
    ~3 live (P2p, nc) f32 temporaries of the compare/max/argmax chain."""
    p2p = _round_up(n_pix, 8)
    nc = max(_LANE, (budget // (p2p * 4 * 3)) // _LANE * _LANE)
    return min(nc, 2048, _round_up(n, _LANE))


def _pixel_max_fwd_raw(pix: jax.Array, vals: jax.Array, n_pix: int):
    b, n, c = vals.shape
    nc = _pixel_chunk(n, n_pix)
    npad = _round_up(n, nc)
    p2p = _round_up(n_pix, 8)
    pixp = pix.astype(jnp.int32)
    if npad != n:
        pixp = jnp.pad(pixp, ((0, 0), (0, npad - n)), constant_values=-1)
    vt = jnp.swapaxes(vals.astype(jnp.float32), 1, 2)  # (B, C, N)
    if npad != n:
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, npad - n)))

    vmax, amax = pl.pallas_call(
        _pixel_max_kernel(n_pix, c, nc, p2p),
        name="pixel_max_fwd",
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, npad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, npad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, p2p, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p2p, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, p2p, c), jnp.float32),
            jax.ShapeDtypeStruct((b, p2p, c), jnp.int32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(pixp[:, None, :], vt)
    return vmax[:, :n_pix], amax[:, :n_pix]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pixel_max_pallas(pix: jax.Array, vals: jax.Array, n_pix: int):
    """Per-pixel max of pointwise values with data-dependent pixel bins.

    The TPU-native scatter_max (torch_scatter, reference
    model/project_to_2d.py:39): VMEM-resident chunked compare/max with a
    carried running (max, argmax) — no XLA scatter, no (P^2, N) HBM
    intermediate.

    Args:
      pix: (B, N) int32 pixel ids in [0, n_pix); ids outside the range never
        match (used for padding).
      vals: (B, N, C) float values; must be > -3e38.
      n_pix: static number of pixels.

    Returns:
      vmax: (B, n_pix, C) f32 per-pixel max (-3.4e38 where empty).
      amax: (B, n_pix, C) int32 winning point index (-1 where empty). Ties
        go to the lowest point index.

    Differentiable in `vals`: each pixel's cotangent flows to its stored
    argmax point (exact one-winner max backward).
    """
    return _pixel_max_fwd_raw(pix, vals, n_pix)


def _pixel_max_fwd(pix, vals, n_pix):
    vmax, amax = _pixel_max_fwd_raw(pix, vals, n_pix)
    token = jnp.zeros(vals.shape[:2] + (0,), vals.dtype)
    return (vmax, amax), (amax, token)


def _pixel_max_bwd(n_pix, res, cts):
    amax, token = res
    n, vdtype = token.shape[1], token.dtype
    g, _ = cts  # amax is int-valued; its cotangent is zero
    b, p2, c = g.shape
    nc = min(1024, _round_up(n, _LANE))
    npad = _round_up(n, nc)
    p2p = _round_up(p2, 8)
    if p2p != p2:
        amax = jnp.pad(amax, ((0, 0), (0, p2p - p2), (0, 0)), constant_values=-1)
        g = jnp.pad(g, ((0, 0), (0, p2p - p2), (0, 0)))

    dv = pl.pallas_call(
        _pixel_max_bwd_kernel(c),
        name="pixel_max_bwd",
        grid=(b, npad // nc),
        in_specs=[
            pl.BlockSpec((1, p2p, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p2p, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c, nc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, npad), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(amax, g.astype(jnp.float32))
    dvals = jnp.swapaxes(dv, 1, 2)[:, :n].astype(vdtype)
    return None, dvals


pixel_max_pallas.defvjp(_pixel_max_fwd, _pixel_max_bwd)


# ---------------------------------------------------------------------------
# fused set-abstraction interior (TRAIN path)
# ---------------------------------------------------------------------------
#
# The training path could not use `sa_fused_eval` because BatchNorm batch
# statistics need reductions over the GLOBAL edge set — the XLA formulation
# materialized the (B, C, K, F) edge tensors in HBM (100-200 MB each,
# ~10 ms of the PROD train step: edge gather 2.1 + BN stat fusions ~5 +
# relayouts, VERDICT r2 missing #2). These kernels keep every edge tensor in
# VMEM, rematerializing edges from the per-point layer-1 projection q
# (selection indices come from `ball_query_grouped_pallas`, no gradient):
#
#   fwd A (2-layer only): masked per-channel sum / sum-sq of
#     h1 = relu(q_j - cterm_c) -> BN1 batch stats.
#   fwd main: folded BN1 affine -> layer-2 matmul (transposed (C2, CC)
#     orientation) -> masked sum/sum-sq of the PRE-BN h (BN2 stats) + per-
#     centroid masked max AND min of h with winner indices. BatchNorm's
#     per-channel transform is a monotone affine, so
#     max(BN(h)) == BN(max(h)) when gamma >= 0 and BN(min(h)) otherwise —
#     the affine + sign-select run outside on the (B, C2, C) output.
#   bwd: the one-winner max cotangent + the standard BN backward
#     dx = gamma/sigma (dy - S1/M - xhat * S2/M) over masked edges. For the
#     LAST BN, dy is nonzero only at winners, so S1/S2 reduce over stored
#     winner values (no edge pass). For the inner BN (2-layer), bwd pass 1
#     rematerializes edges to accumulate S1/S2 (+ dW2/db2); bwd pass 2
#     rematerializes again to emit de0 -> dq (grouped-layout one-hot MXU
#     scatter, exactly like _knn_scatter) and dcterm.
#
# Gradients leave the op as dq / dcterm: q = [x, pos] @ W1 + b1 and
# cterm = pos_c @ W1p are computed OUTSIDE in XLA, so dW1/db1/dx flow by
# ordinary autodiff of those matmuls — no edge-level scatter ever hits HBM.
# Reference interior: /root/reference/model/point_net2.py:14-29.


def _sa_row(ref, gi):
    """(1, K, CC) ref -> (1, CC) row gi (dynamic sublane slice)."""
    return ref[0, pl.ds(gi, 1), :]


def _sa_hilo(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _sa_hilo_stack(x):
    """hi/lo halves stacked along dim 0: one MXU dot instead of a pair.

    A hi/lo dot PAIR pays the per-dot fixed MXU cost twice while the M dim
    merely streams — stacking both bf16 halves into a (2C, ...) operand
    halves the gather matmul cost (measured r3c on _knn_kernel: knn_fwd
    4.08 -> 3.66 ms/step at PROD)."""
    hi, lo = _sa_hilo(x)
    return jnp.concatenate([hi, lo], axis=0)


_DN_G = (((1,), (0,)), ((), ()))  # (C, G) @ (G, CC)


def _sa_gather(qhl, sl, onehot_t):
    """Stacked hi/lo one-hot gather: (C1, CC) = q[:, sl] @ onehot (G, CC),
    qhl = [q_hi; q_lo] (2C1, blk*G) bf16 (see _sa_hilo_stack)."""
    d = jax.lax.dot_general(
        qhl[:, sl], onehot_t, _DN_G, preferred_element_type=jnp.float32
    )
    c = d.shape[0] // 2
    return d[:c] + d[c:]


def _sa_stats1_kernel(k: int, g_real: int, blk: int):
    def kernel(idx_ref, mask_ref, qg_ref, ctermt_ref, aff0_ref, stats_ref):
        # idx/mask (1,K,CC) i32 (lane-major, from ball_query layout='kc');
        # qg (1,nb,C1,blk*G) f32; ctermt (1,C1,CC); aff0 (16,128) row 0 =
        # per-channel running-mean shift; stats (1,C1,128) f32 partials:
        # lane 0 = masked sum of (h1-c), lane 1 = masked sum of (h1-c)^2.
        # The shift removes the catastrophic cancellation of the unshifted
        # E[x^2]-E[x]^2 variance when |mean| >> std (same fix as
        # models/nn.batchnorm, advisor r2).
        cc = ctermt_ref.shape[2]
        c1 = ctermt_ref.shape[1]
        g = qg_ref.shape[3] // blk
        ctermt = ctermt_ref[0]
        shift = aff0_ref[0, :c1][:, None]  # (C1, 1)
        rowg2 = jax.lax.broadcasted_iota(jnp.int32, (g, cc), 0)

        def body(bi, carry):
            ssum, ssq = carry
            qb = qg_ref[0, bi]
            qhl = _sa_hilo_stack(qb)
            for l in range(blk):
                gi = bi * blk + l
                sl = slice(l * g, (l + 1) * g)
                within = _sa_row(idx_ref, gi) - gi * g_real  # (1, CC)
                vmask = (_sa_row(mask_ref, gi) > 0).astype(jnp.float32)
                onehot_t = (rowg2 == within).astype(jnp.bfloat16)
                h1 = jax.nn.relu(_sa_gather(qhl, sl, onehot_t) - ctermt)
                hc = h1 - shift
                hm = hc * vmask
                ssum = ssum + jnp.sum(hm, axis=1, keepdims=True)
                ssq = ssq + jnp.sum(hm * hc, axis=1, keepdims=True)
            return ssum, ssq

        z = jnp.zeros((c1, 1), jnp.float32)
        ssum, ssq = jax.lax.fori_loop(0, k // blk, body, (z, z))
        stats_ref[0, 0] = jnp.concatenate(
            [ssum, ssq, jnp.zeros((c1, 126), jnp.float32)], axis=1
        )

    return kernel


def _sa_train_main_kernel(k: int, g_real: int, blk: int, two_layer: bool):
    def kernel(
        idx_ref, mask_ref, qg_ref, ctermt_ref, aff_ref, w2t_ref,
        stats_ref, vmax_ref, vmin_ref, amax_ref, amin_ref,
    ):
        # aff (16, CL) rows: 0=a1 (gamma1/sigma1-folded affine scale),
        # 1=c1 (affine shift), 2=b2 (layer-2 linear bias), 13=running-mean
        # shift of the LAST layer (shifted one-pass stats); w2t (C2, C1).
        # outputs: stats partials of the PRE-BN last-layer h as in stats1;
        # vmax/vmin (1, C2, CC) f32, amax/amin (1, C2, CC) i32 (group idx).
        cc = ctermt_ref.shape[2]
        c1 = ctermt_ref.shape[1]
        c2 = vmax_ref.shape[1]
        g = qg_ref.shape[3] // blk
        ctermt = ctermt_ref[0]
        shiftl = aff_ref[13, :c2][:, None]  # (C2, 1)
        rowg2 = jax.lax.broadcasted_iota(jnp.int32, (g, cc), 0)
        if two_layer:
            a1 = aff_ref[0, :c1][:, None]
            c1v = aff_ref[1, :c1][:, None]
            b2 = aff_ref[2, :c2][:, None]
            dn_l2 = (((1,), (0,)), ((), ()))  # (C2, C1) @ (C1, CC)

        def body(bi, carry):
            ssum, ssq, vmax, vmin, amax, amin = carry
            qb = qg_ref[0, bi]
            qhl = _sa_hilo_stack(qb)
            for l in range(blk):
                gi = bi * blk + l
                sl = slice(l * g, (l + 1) * g)
                within = _sa_row(idx_ref, gi) - gi * g_real
                mrow = _sa_row(mask_ref, gi) > 0  # (1, CC) bool
                vmask = mrow.astype(jnp.float32)
                onehot_t = (rowg2 == within).astype(jnp.bfloat16)
                h1 = jax.nn.relu(_sa_gather(qhl, sl, onehot_t) - ctermt)
                if two_layer:
                    y1 = h1 * a1 + c1v
                    u = jax.lax.dot_general(
                        w2t_ref[:, :], y1, dn_l2,
                        preferred_element_type=jnp.float32,
                    ) + b2
                    h = jax.nn.relu(u)
                else:
                    h = h1
                hc = h - shiftl
                hm = hc * vmask
                ssum = ssum + jnp.sum(hm, axis=1, keepdims=True)
                ssq = ssq + jnp.sum(hm * hc, axis=1, keepdims=True)
                e_hi = jnp.where(mrow, h, jnp.float32(-3.4e38))
                e_lo = jnp.where(mrow, h, jnp.float32(3.4e38))
                better = e_hi > vmax
                vmax = jnp.where(better, e_hi, vmax)
                amax = jnp.where(better, gi, amax)
                worse = e_lo < vmin
                vmin = jnp.where(worse, e_lo, vmin)
                amin = jnp.where(worse, gi, amin)
            return ssum, ssq, vmax, vmin, amax, amin

        z = jnp.zeros((c2, 1), jnp.float32)
        init = (
            z, z,
            jnp.full((c2, cc), -3.4e38, jnp.float32),
            jnp.full((c2, cc), 3.4e38, jnp.float32),
            jnp.zeros((c2, cc), jnp.int32),
            jnp.zeros((c2, cc), jnp.int32),
        )
        ssum, ssq, vmax, vmin, amax, amin = jax.lax.fori_loop(
            0, k // blk, body, init
        )
        stats_ref[0, 0] = jnp.concatenate(
            [ssum, ssq, jnp.zeros((c2, 126), jnp.float32)], axis=1
        )
        vmax_ref[0] = vmax
        vmin_ref[0] = vmin
        amax_ref[0] = amax
        amin_ref[0] = amin

    return kernel


def _sa_train_bwd1_kernel(k: int, g_real: int, blk: int):
    """2-layer only: edge pass accumulating the inner-BN correction sums
    S1_1 = sum(dy1), S2_1 = sum(dy1 * xhat1) plus dW2 / db2."""

    def kernel(
        idx_ref, mask_ref, qg_ref, ctermt_ref, aff_ref, w2t_ref,
        awin_ref, gt_ref, acc_ref,
    ):
        # aff rows: 0=a1, 1=c1v, 2=b2, 3=gos2 (gamma2/sigma2), 4=m2,
        # 5=inv_s2, 6=s1n (S1_2/M), 7=s2n (S2_2/M), 8=m1, 9=inv_s1.
        # awin/gt (1, C2, CC); acc (1, CP, 136) f32 partials:
        # lane 0 = S1_1 (C1), lane 1 = S2_1 (C1), lane 2 = db2 (C2),
        # lanes 8..8+C1 = dW2 (C2, C1).
        cc = ctermt_ref.shape[2]
        c1 = ctermt_ref.shape[1]
        c2 = gt_ref.shape[1]
        g = qg_ref.shape[3] // blk
        ctermt = ctermt_ref[0]
        rowg2 = jax.lax.broadcasted_iota(jnp.int32, (g, cc), 0)
        a1 = aff_ref[0, :c1][:, None]
        c1v = aff_ref[1, :c1][:, None]
        b2 = aff_ref[2, :c2][:, None]
        gos2 = aff_ref[3, :c2][:, None]
        m2 = aff_ref[4, :c2][:, None]
        inv_s2 = aff_ref[5, :c2][:, None]
        s1n = aff_ref[6, :c2][:, None]
        s2n = aff_ref[7, :c2][:, None]
        m1 = aff_ref[8, :c1][:, None]
        inv_s1 = aff_ref[9, :c1][:, None]
        awin = awin_ref[0]
        gt = gt_ref[0]
        dn_l2 = (((1,), (0,)), ((), ()))  # (C2, C1) @ (C1, CC)
        dn_w2 = (((1,), (1,)), ((), ()))  # (C2, CC) . (C1, CC) -> (C2, C1)
        dn_y1 = (((0,), (0,)), ((), ()))  # w2t (C2, C1) . du (C2, CC)
        # dy1 = w2^T du via 2 bf16 dots instead of a 6-pass HIGHEST f32 dot:
        # [w2hi | w2lo] (C2, 2C1) @ duhi covers hi.hi + lo.hi in one dot,
        # + w2hi @ dulo; lo.lo dropped (~2^-16 relative, inside the grad-
        # equality test tolerance).
        w2hi, w2lo = _sa_hilo(w2t_ref[:, :])
        w2hl = jnp.concatenate([w2hi, w2lo], axis=1)  # (C2, 2C1)

        def body(bi, carry):
            s11, s21, db2, dw2 = carry
            qb = qg_ref[0, bi]
            qhl = _sa_hilo_stack(qb)
            for l in range(blk):
                gi = bi * blk + l
                sl = slice(l * g, (l + 1) * g)
                within = _sa_row(idx_ref, gi) - gi * g_real
                vmask = (_sa_row(mask_ref, gi) > 0).astype(jnp.float32)
                onehot_t = (rowg2 == within).astype(jnp.bfloat16)
                h1 = jax.nn.relu(_sa_gather(qhl, sl, onehot_t) - ctermt)
                y1 = h1 * a1 + c1v
                u = jax.lax.dot_general(
                    w2t_ref[:, :], y1, dn_l2, preferred_element_type=jnp.float32
                ) + b2
                h2 = jax.nn.relu(u)
                xhat2 = (h2 - m2) * inv_s2
                dy2 = jnp.where(awin == gi, gt, 0.0)
                dh2 = gos2 * (dy2 - s1n - xhat2 * s2n) * vmask
                du = jnp.where(u > 0, dh2, 0.0)  # (C2, CC)
                duhi, dulo = _sa_hilo(du)
                y1hi, y1lo = _sa_hilo(y1)
                y1hl = jnp.concatenate([y1hi, y1lo], axis=0)  # (2C1, CC)
                # duhi @ [y1hi; y1lo] in ONE dot (see _sa_hilo_stack) + the
                # dulo @ y1hi cross term; lo.lo dropped as before
                dhl = jax.lax.dot_general(
                    duhi, y1hl, dn_w2, preferred_element_type=jnp.float32
                )  # (C2, 2C1)
                dw2 = dw2 + dhl[:, :c1] + dhl[:, c1:] + jax.lax.dot_general(
                    dulo, y1hi, dn_w2, preferred_element_type=jnp.float32
                )
                db2 = db2 + jnp.sum(du, axis=1, keepdims=True)
                dyhl = jax.lax.dot_general(
                    w2hl, duhi, dn_y1, preferred_element_type=jnp.float32
                )  # (2C1, CC)
                dy1 = dyhl[:c1] + dyhl[c1:] + jax.lax.dot_general(
                    w2hi, dulo, dn_y1, preferred_element_type=jnp.float32
                )  # (C1, CC)
                xhat1 = (h1 - m1) * inv_s1
                s11 = s11 + jnp.sum(dy1 * vmask, axis=1, keepdims=True)
                s21 = s21 + jnp.sum(dy1 * xhat1 * vmask, axis=1, keepdims=True)
            return s11, s21, db2, dw2

        cp = acc_ref.shape[2]
        z1 = jnp.zeros((c1, 1), jnp.float32)
        z2 = jnp.zeros((c2, 1), jnp.float32)
        s11, s21, db2, dw2 = jax.lax.fori_loop(
            0, k // blk, body,
            (z1, z1, z2, jnp.zeros((c2, c1), jnp.float32)),
        )
        pad_r = lambda x, r: jnp.pad(x, ((0, cp - x.shape[0]), (0, 0)))
        out = jnp.concatenate(
            [
                pad_r(s11, cp), pad_r(s21, cp), pad_r(db2, cp),
                jnp.zeros((cp, 5), jnp.float32),
                jnp.pad(dw2, ((0, cp - c2), (0, 128 - c1))),
            ],
            axis=1,
        )
        acc_ref[0, 0] = out

    return kernel


def _sa_train_bwd2_kernel(k: int, g_real: int, blk: int, two_layer: bool):
    """Edge pass emitting de0 -> dq (grouped layout, accumulated across
    centroid chunks) and dcterm."""

    def kernel(
        idx_ref, mask_ref, qg_ref, ctermt_ref, aff_ref, w2t_ref,
        awin_ref, gt_ref, dqg_ref, dct_ref,
    ):
        # aff rows as bwd1 + 10=gos1 (gamma1/sigma1), 11=s11n (S1_1/M),
        # 12=s21n (S2_1/M). Single-layer: rows 8/9/10/11/12 refer to BN1
        # and awin/gt carry the layer-1 winners/cotangents (C2 == C1).
        cc = ctermt_ref.shape[2]
        c1 = ctermt_ref.shape[1]
        g = qg_ref.shape[3] // blk
        ctermt = ctermt_ref[0]
        rowg2 = jax.lax.broadcasted_iota(jnp.int32, (g, cc), 0)
        m1 = aff_ref[8, :c1][:, None]
        inv_s1 = aff_ref[9, :c1][:, None]
        gos1 = aff_ref[10, :c1][:, None]
        s11n = aff_ref[11, :c1][:, None]
        s21n = aff_ref[12, :c1][:, None]
        if two_layer:
            c2 = gt_ref.shape[1]
            a1 = aff_ref[0, :c1][:, None]
            c1v = aff_ref[1, :c1][:, None]
            b2 = aff_ref[2, :c2][:, None]
            gos2 = aff_ref[3, :c2][:, None]
            m2 = aff_ref[4, :c2][:, None]
            inv_s2 = aff_ref[5, :c2][:, None]
            s1n = aff_ref[6, :c2][:, None]
            s2n = aff_ref[7, :c2][:, None]
            dn_l2 = (((1,), (0,)), ((), ()))
            dn_y1 = (((0,), (0,)), ((), ()))
            w2hi, w2lo = _sa_hilo(w2t_ref[:, :])
            w2hl = jnp.concatenate([w2hi, w2lo], axis=1)  # (C2, 2C1)
        awin = awin_ref[0]
        gt = gt_ref[0]
        dn_sc = (((1,), (1,)), ((), ()))  # de0 (C1, CC) . onehot (G, CC)

        jc = pl.program_id(1)

        @pl.when(jc == 0)
        def _init():
            dqg_ref[0] = jnp.zeros_like(dqg_ref[0])

        def body(bi, dct):
            qb = qg_ref[0, bi]
            qhl = _sa_hilo_stack(qb)
            dq_pieces = []
            for l in range(blk):
                gi = bi * blk + l
                sl = slice(l * g, (l + 1) * g)
                within = _sa_row(idx_ref, gi) - gi * g_real
                vmask = (_sa_row(mask_ref, gi) > 0).astype(jnp.float32)
                onehot_t = (rowg2 == within).astype(jnp.bfloat16)
                e0 = _sa_gather(qhl, sl, onehot_t) - ctermt
                h1 = jax.nn.relu(e0)
                if two_layer:
                    y1 = h1 * a1 + c1v
                    u = jax.lax.dot_general(
                        w2t_ref[:, :], y1, dn_l2,
                        preferred_element_type=jnp.float32,
                    ) + b2
                    h2 = jax.nn.relu(u)
                    xhat2 = (h2 - m2) * inv_s2
                    dy2 = jnp.where(awin == gi, gt, 0.0)
                    dh2 = gos2 * (dy2 - s1n - xhat2 * s2n) * vmask
                    du = jnp.where(u > 0, dh2, 0.0)
                    duhi, dulo = _sa_hilo(du)
                    dyhl = jax.lax.dot_general(
                        w2hl, duhi, dn_y1, preferred_element_type=jnp.float32
                    )  # (2C1, CC); see bwd1: 2 bf16 dots vs 6-pass HIGHEST
                    dy1 = dyhl[:c1] + dyhl[c1:] + jax.lax.dot_general(
                        w2hi, dulo, dn_y1, preferred_element_type=jnp.float32
                    )
                else:
                    dy1 = jnp.where(awin == gi, gt, 0.0)
                xhat1 = (h1 - m1) * inv_s1
                dh1 = gos1 * (dy1 - s11n - xhat1 * s21n) * vmask
                de0 = jnp.where(e0 > 0, dh1, 0.0)  # (C1, CC)
                dct = dct - de0
                dehl = _sa_hilo_stack(de0)  # (2C1, CC)
                ohf = onehot_t  # bf16 (G, CC)
                dsc = jax.lax.dot_general(
                    dehl, ohf, dn_sc, preferred_element_type=jnp.float32
                )  # (2C1, G)
                contrib = dsc[:c1] + dsc[c1:]  # (C1, G)
                dq_pieces.append(contrib)
            # per-group G-slices are disjoint: the concat IS the block's
            # scatter accumulation (Mosaic has no scatter-add lowering)
            dq_acc = dq_pieces[0] if blk == 1 else jnp.concatenate(dq_pieces, axis=1)
            cur = dqg_ref[0, pl.ds(bi, 1), :, :]
            dqg_ref[0, pl.ds(bi, 1), :, :] = cur + dq_acc[None]
            return dct

        dct = jax.lax.fori_loop(
            0, k // blk, body, jnp.zeros((c1, cc), jnp.float32)
        )
        dct_ref[0] = dct

    return kernel


def _sa_blk(k: int, g: int) -> int:
    blk = min(4, _group_blocks(k, g, budget=6 * 2**20))
    while k % blk:
        blk -= 1
    return blk


def _sa_layouts(q, cterm, idx, mask, k, cc):
    """Shared fwd/bwd input layouts: block-grouped q, padded transposed
    cterm, padded (B, K, Cpad) idx/mask."""
    b, n, c1 = q.shape
    c = cterm.shape[1]
    g_real = -(-n // k)
    g = _round_up(g_real, _LANE)
    blk = _sa_blk(k, g)
    qg = _block_layout(q.astype(jnp.float32), k, blk, g_real, g)
    cc = min(cc, c)
    cpad = _round_up(c, cc)
    if cpad != c:
        cterm = jnp.pad(cterm, ((0, 0), (0, cpad - c), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, cpad - c)))
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, cpad - c)))
    ctermt = jnp.swapaxes(cterm.astype(jnp.float32), 1, 2)
    return qg, ctermt, idx.astype(jnp.int32), mask.astype(jnp.int32), (
        g_real, g, blk, cc, cpad
    )


def _unblock_layout(xg, k, blk, g_real, g, n):
    """Inverse of `_block_layout`: (B, nb, F, blk*G) -> (B, N, F)."""
    b, nb, f, _ = xg.shape
    xg = xg.reshape(b, nb, f, blk, g)[:, :, :, :, :g_real]
    xg = jnp.moveaxis(xg, 2, 4)  # (b, nb, blk, g_real, f)
    return xg.reshape(b, k * g_real, f)[:, :n]


def _sa_train_stats(qg, ctermt, idxp, maskp, k, geo, shift1):
    g_real, g, blk, cc, cpad = geo
    b = qg.shape[0]
    nb = qg.shape[1]
    c1 = ctermt.shape[1]
    nchunks = cpad // cc
    aff0 = jnp.zeros((16, 128), jnp.float32).at[0, :c1].set(shift1)
    out = pl.pallas_call(
        _sa_stats1_kernel(k, g_real, blk),
        name="sa_train_stats1",
        grid=(b, nchunks),
        in_specs=[
            pl.BlockSpec((1, k, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, c1, blk * g), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c1, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, c1, 128), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, nchunks, c1, 128), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(idxp, maskp, qg, ctermt, aff0)
    sums = jnp.sum(out, axis=(0, 1))  # (C1, 128)
    return sums[:, 0], sums[:, 1]


def _sa_train_main(qg, ctermt, aff, w2t, idxp, maskp, k, c2, geo, two_layer):
    g_real, g, blk, cc, cpad = geo
    b, nb, c1, _ = qg.shape
    nchunks = cpad // cc
    stats, vmax, vmin, amax, amin = pl.pallas_call(
        _sa_train_main_kernel(k, g_real, blk, two_layer),
        name="sa_train_main",
        grid=(b, nchunks),
        in_specs=[
            pl.BlockSpec((1, k, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, c1, blk * g), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c1, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, c2, 128), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, nchunks, c2, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, c2, cpad), jnp.float32),
            jax.ShapeDtypeStruct((b, c2, cpad), jnp.float32),
            jax.ShapeDtypeStruct((b, c2, cpad), jnp.int32),
            jax.ShapeDtypeStruct((b, c2, cpad), jnp.int32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(idxp, maskp, qg, ctermt, aff, w2t)
    sums = jnp.sum(stats, axis=(0, 1))
    return (sums[:, 0], sums[:, 1]), vmax, vmin, amax, amin


def _sa_train_bwd1(qg, ctermt, aff, w2t, idxp, maskp, awin, gt, k, geo):
    g_real, g, blk, cc, cpad = geo
    b, nb, c1, _ = qg.shape
    c2 = gt.shape[1]
    cp = _round_up(max(c1, c2), 8)
    nchunks = cpad // cc
    acc = pl.pallas_call(
        _sa_train_bwd1_kernel(k, g_real, blk),
        name="sa_train_bwd1",
        grid=(b, nchunks),
        in_specs=[
            pl.BlockSpec((1, k, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, c1, blk * g), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c1, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, cp, 136), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, nchunks, cp, 136), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(idxp, maskp, qg, ctermt, aff, w2t, awin, gt)
    sums = jnp.sum(acc, axis=(0, 1))  # (CP, 136)
    s11 = sums[:c1, 0]
    s21 = sums[:c1, 1]
    db2 = sums[:c2, 2]
    dw2 = sums[:c2, 8 : 8 + c1]  # (C2, C1)
    return s11, s21, db2, dw2


def _sa_train_bwd2(qg, ctermt, aff, w2t, idxp, maskp, awin, gt, k, geo, two_layer):
    g_real, g, blk, cc, cpad = geo
    b, nb, c1, _ = qg.shape
    c2 = gt.shape[1]
    nchunks = cpad // cc
    dqg, dct = pl.pallas_call(
        _sa_train_bwd2_kernel(k, g_real, blk, two_layer),
        name="sa_train_bwd2",
        grid=(b, nchunks),
        in_specs=[
            pl.BlockSpec((1, k, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, c1, blk * g), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c1, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, nb, c1, blk * g), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c1, cc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, nb, c1, blk * g), jnp.float32),
            jax.ShapeDtypeStruct((b, c1, cpad), jnp.float32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(idxp, maskp, qg, ctermt, aff, w2t, awin, gt)
    return dqg, dct


def _bn_fold(gamma, beta, mean, var, eps):
    inv = jax.lax.rsqrt(var + eps) * gamma
    return inv, beta - mean * inv


_BN_EPS_SA = 1e-5  # torch BatchNorm1d default, matches models.nn.BN_EPS


@functools.lru_cache(maxsize=None)
def _sa_train_for(k: int, two_layer: bool):
    """custom_vjp closure over the static config (k, #layers).

    Primals (two-layer): q (B,N,C1), cterm (B,C,C1), gamma1, beta1 (C1,),
    w2 (C1,C2), b2 (C2,), gamma2, beta2 (C2,), idx (B,K,C) i32,
    mask (B,K,C) bool. Single-layer drops w2/b2/gamma2/beta2.

    Returns (out (B,C,C2), (mean1, var1[, mean2, var2]), n_valid_edges).
    The stats outputs feed the BatchNorm running-state update only; their
    cotangents are ignored (running stats are never differentiated — the
    train loss flows through `out` alone, learning/train.py loss_fn).
    """
    import numpy as np
    from jax import dtypes as jdt

    eps = _BN_EPS_SA

    def fwd_common(
        q, cterm, gamma1, beta1, shift1, w2, b2, gamma2, beta2, shift2,
        idx, mask,
    ):
        # shift1/shift2: per-channel running means — the batch stats
        # accumulate (h - shift) / (h - shift)^2 inside the kernels
        # (shifted one-pass form, same numerics fix as nn.batchnorm).
        b, n, c1 = q.shape
        c = cterm.shape[1]
        c2 = w2.shape[1] if two_layer else c1
        # Centroid-chunk size: the round-3b kNN lesson (tile size beats
        # micro-optimizations) applies here too — the r5 sweep on the v5e
        # measured cc 512 -> 1024 -> 1280 -> 2560 (whole-C) cutting the
        # three SA train kernels 4.52 -> 2.32 ms combined (per-chunk fixed
        # work, not arithmetic, was the cost). Default: whole padded C,
        # bounded by ~3 live (G, cc) tiles against a 12 MiB budget.
        # STRATANET2_SA_TRAIN_CC overrides.
        g_tmp = _round_up(-(-n // k), _LANE)
        cc_def = max(
            512,
            min(
                (12 * 2**20 // (g_tmp * 12)) // _LANE * _LANE,
                _round_up(c, _LANE),
            ),
        )
        qg, ctermt, idxp, maskp, geo = _sa_layouts(
            q, cterm, idx, mask, k,
            int(os.environ.get("STRATANET2_SA_TRAIN_CC", cc_def)),
        )
        m_edges = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
        shift_l = shift2 if two_layer else shift1

        aff = jnp.zeros((16, 128), jnp.float32)
        aff = aff.at[13, :c2].set(shift_l)
        if two_layer:
            s1, sq1 = _sa_train_stats(qg, ctermt, idxp, maskp, k, geo, shift1)
            s1, sq1 = s1[:c1], sq1[:c1]
            dmean1 = s1 / m_edges
            mean1 = dmean1 + shift1
            var1 = jnp.maximum(sq1 / m_edges - dmean1 * dmean1, 0.0)
            a1, c1v = _bn_fold(gamma1, beta1, mean1, var1, eps)
            aff = aff.at[0, :c1].set(a1).at[1, :c1].set(c1v)
            aff = aff.at[2, :c2].set(b2)
            w2t = jnp.swapaxes(w2.astype(jnp.float32), 0, 1)  # (C2, C1)
        else:
            mean1 = var1 = None
            w2t = jnp.zeros((c1, c1), jnp.float32)

        (sl, sql), vmax, vmin, amax, amin = _sa_train_main(
            qg, ctermt, aff, w2t, idxp, maskp, k, c2, geo, two_layer
        )
        sl, sql = sl[:c2], sql[:c2]
        dmean_l = sl / m_edges
        mean_l = dmean_l + shift_l
        var_l = jnp.maximum(sql / m_edges - dmean_l * dmean_l, 0.0)
        g_last = gamma2 if two_layer else gamma1
        b_last = beta2 if two_layer else beta1
        inv_l, shift_l = _bn_fold(g_last, b_last, mean_l, var_l, eps)
        pos_g = (g_last >= 0)[None, :, None]
        hwin = jnp.where(pos_g, vmax, vmin)  # (B, C2, Cpad)
        awin = jnp.where(pos_g, amax, amin)
        outt = hwin * inv_l[None, :, None] + shift_l[None, :, None]
        out = jnp.swapaxes(outt, 1, 2)[:, :c]  # (B, C, C2)
        return (
            out, mean1, var1, mean_l, var_l, m_edges,
            (qg, ctermt, idxp, maskp, aff, w2t, hwin, awin, geo),
        )

    if two_layer:

        @jax.custom_vjp
        def f(q, cterm, gamma1, beta1, shift1, w2, b2, gamma2, beta2,
              shift2, idx, mask):
            out, m1, v1, m2, v2, me, _ = fwd_common(
                q, cterm, gamma1, beta1, shift1, w2, b2, gamma2, beta2,
                shift2, idx, mask
            )
            return out, (m1, v1, m2, v2), me

        def f_fwd(q, cterm, gamma1, beta1, shift1, w2, b2, gamma2, beta2,
                  shift2, idx, mask):
            out, m1, v1, m2, v2, me, keep = fwd_common(
                q, cterm, gamma1, beta1, shift1, w2, b2, gamma2, beta2,
                shift2, idx, mask
            )
            # zero-size token carries q's (n, dtype) into bwd (residuals
            # must be JAX types)
            token = jnp.zeros((q.shape[0], q.shape[1], 0), q.dtype)
            res = (keep, m1, v1, m2, v2, me, gamma1, gamma2, token)
            return (out, (m1, v1, m2, v2), me), res

        def f_bwd(res, cts):
            (keep, m1, v1, m2, v2, me, gamma1, gamma2, token) = res
            n = token.shape[1]
            q_dtype = token.dtype
            qg, ctermt, idxp, maskp, aff, w2t, hwin, awin, geo = keep
            g_out = cts[0]  # stats/count cotangents ignored (see docstring)
            b, c, c2 = g_out.shape
            c1 = ctermt.shape[1]
            cpad = ctermt.shape[2]
            idx_shape = (b, idxp.shape[1], c)
            gt = jnp.swapaxes(g_out.astype(jnp.float32), 1, 2)
            if cpad != c:
                gt = jnp.pad(gt, ((0, 0), (0, 0), (0, cpad - c)))

            sig2 = jnp.sqrt(v2 + eps)
            inv_s2 = 1.0 / sig2
            # last-BN correction sums from stored winners (dy2 is winner-only)
            xw = (hwin[:, :, :c] - m2[None, :, None]) * inv_s2[None, :, None]
            S1_2 = jnp.sum(gt[:, :, :c], axis=(0, 2))
            S2_2 = jnp.sum(gt[:, :, :c] * xw, axis=(0, 2))
            dgamma2 = S2_2
            dbeta2 = S1_2

            sig1 = jnp.sqrt(v1 + eps)
            aff_b = aff.at[3, :c2].set(gamma2 * inv_s2)
            aff_b = aff_b.at[4, :c2].set(m2).at[5, :c2].set(inv_s2)
            aff_b = aff_b.at[6, :c2].set(S1_2 / me).at[7, :c2].set(S2_2 / me)
            aff_b = aff_b.at[8, :c1].set(m1).at[9, :c1].set(1.0 / sig1)

            s11, s21, db2, dw2 = _sa_train_bwd1(
                qg, ctermt, aff_b, w2t, idxp, maskp, awin, gt, k, geo
            )
            dgamma1 = s21
            dbeta1 = s11
            aff_b = aff_b.at[10, :c1].set(gamma1 / sig1)
            aff_b = aff_b.at[11, :c1].set(s11 / me).at[12, :c1].set(s21 / me)

            dqg, dct = _sa_train_bwd2(
                qg, ctermt, aff_b, w2t, idxp, maskp, awin, gt, k, geo, True
            )
            g_real, g, blk, cc, _ = geo
            dq = _unblock_layout(dqg, k, blk, g_real, g, n).astype(q_dtype)
            dcterm = jnp.swapaxes(dct, 1, 2)[:, :c]
            fz = lambda shp: np.zeros(shp, jdt.float0)
            return (
                dq, dcterm, dgamma1, dbeta1, jnp.zeros_like(dbeta1),
                jnp.swapaxes(dw2, 0, 1), db2, dgamma2, dbeta2,
                jnp.zeros_like(dbeta2),
                fz(idx_shape), fz(idx_shape),
            )

        f.defvjp(f_fwd, f_bwd)
        return f

    @jax.custom_vjp
    def f1(q, cterm, gamma1, beta1, shift1, idx, mask):
        out, _, _, m, v, me, _ = fwd_common(
            q, cterm, gamma1, beta1, shift1, None, None, None, None, None,
            idx, mask
        )
        return out, (m, v), me

    def f1_fwd(q, cterm, gamma1, beta1, shift1, idx, mask):
        out, _, _, m, v, me, keep = fwd_common(
            q, cterm, gamma1, beta1, shift1, None, None, None, None, None,
            idx, mask
        )
        token = jnp.zeros((q.shape[0], q.shape[1], 0), q.dtype)
        res = (keep, m, v, me, gamma1, token)
        return (out, (m, v), me), res

    def f1_bwd(res, cts):
        keep, m, v, me, gamma1, token = res
        n = token.shape[1]
        q_dtype = token.dtype
        qg, ctermt, idxp, maskp, aff, w2t, hwin, awin, geo = keep
        g_out = cts[0]
        b, c, c1 = g_out.shape
        cpad = ctermt.shape[2]
        idx_shape = (b, idxp.shape[1], c)
        gt = jnp.swapaxes(g_out.astype(jnp.float32), 1, 2)
        if cpad != c:
            gt = jnp.pad(gt, ((0, 0), (0, 0), (0, cpad - c)))

        sig = jnp.sqrt(v + eps)
        inv_s = 1.0 / sig
        xw = (hwin[:, :, :c] - m[None, :, None]) * inv_s[None, :, None]
        S1 = jnp.sum(gt[:, :, :c], axis=(0, 2))
        S2 = jnp.sum(gt[:, :, :c] * xw, axis=(0, 2))
        dgamma1 = S2
        dbeta1 = S1

        aff_b = aff.at[8, :c1].set(m).at[9, :c1].set(inv_s)
        aff_b = aff_b.at[10, :c1].set(gamma1 * inv_s)
        aff_b = aff_b.at[11, :c1].set(S1 / me).at[12, :c1].set(S2 / me)

        dqg, dct = _sa_train_bwd2(
            qg, ctermt, aff_b, w2t, idxp, maskp, awin, gt, k, geo, False
        )
        g_real, g, blk, cc, _ = geo
        dq = _unblock_layout(dqg, k, blk, g_real, g, n).astype(q_dtype)
        dcterm = jnp.swapaxes(dct, 1, 2)[:, :c]
        fz = lambda shp: np.zeros(shp, jdt.float0)
        return (
            dq, dcterm, dgamma1, dbeta1, jnp.zeros_like(dbeta1),
            fz(idx_shape), fz(idx_shape),
        )

    f1.defvjp(f1_fwd, f1_bwd)
    return f1


def sa_train_fused(
    q, cterm, bn_scales, bn_biases, w2, b2, idx, mask, k: int,
    bn_shifts=None,
):
    """Fused SA interior for the TRAINING path (see section comment).

    Args:
      q: (B, N, C1) per-point layer-1 projection incl. bias (f32).
      cterm: (B, C, C1) centroid term of layer 1.
      bn_scales/bn_biases: tuple of per-layer BatchNorm (gamma, beta) — one
        entry for single-layer MLPs, two for two-layer.
      w2, b2: layer-2 Linear (in,out)/(out,) or None for single-layer.
      idx, mask: (B, K, C) selection from ball_query_grouped_pallas(
        layout='kc'); no gradient flows through selection.
      k: static neighbor cap.
      bn_shifts: per-layer running means used as the variance shift
        (shifted one-pass batch stats, models/nn.batchnorm numerics fix);
        zeros when omitted.

    Returns:
      out: (B, C, C2) the masked-max SA output (identical math to the
        unfused gather + masked-BN MLP + max composition).
      stats: per-layer (batch_mean, biased_batch_var) tuples.
      n_valid_edges: scalar f32 count backing the stats (for the unbiased
        running-var correction).
    """
    two_layer = w2 is not None
    fn = _sa_train_for(int(k), two_layer)
    if bn_shifts is None:
        bn_shifts = tuple(jnp.zeros_like(b_) for b_ in bn_biases)
    if two_layer:
        out, (m1, v1, m2, v2), me = fn(
            q, cterm, bn_scales[0], bn_biases[0], bn_shifts[0], w2, b2,
            bn_scales[1], bn_biases[1], bn_shifts[1], idx, mask,
        )
        return out, ((m1, v1), (m2, v2)), me
    out, (m, v), me = fn(
        q, cterm, bn_scales[0], bn_biases[0], bn_shifts[0], idx, mask
    )
    return out, ((m, v),), me
