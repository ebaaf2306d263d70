"""Device-resident training dataset: the whole plot set lives in HBM and the
per-item augmentation + subsampling pipeline runs ON DEVICE under jit.

Why: the host pipeline (transforms.load_cloud_item via data/loader.PlotLoader)
costs ~1.3 s/epoch at PROD geometry on this 1-core host while the device step
is ~0.1 s (RESULTS.md 'Epoch-loop pipelining'); with the dataset resident,
only a (n_batches, B) int32 index table and one PRNG key cross the relay per
EPOCH — the epoch itself is a single `lax.scan`-chained device program.

Semantics mirror the reference per-item pipeline
(/root/reference/data_loader/loader.py:73-87, our transforms.load_cloud_item):

  build (host, ONCE per fold): center -> fake ground points -> xyz snapshot
    -> feature rescale. Rescale is hoisted ahead of augmentation: x and y
    share the /10 scale, so the shared z-rotation and axis flips are
    isometries of the scaled plane, and the clipped xy feature noise
    (sigma 0.1 m, clip 0.3 m raw — loader.py:196-206) becomes sigma 0.01 /
    clip 0.03 in scaled units. Exact commutation, not an approximation.

  sample (device, per step): shared z-rotation (uniform whole degree,
    loader.py:165) + x/y flips on features and positions, clipped Gaussian
    xy noise on features only, fixed-size subsample via a key-sort.

Subsample distribution (reference loader.py:233-246 = our
transforms.sample_cloud): plots are CYCLE-padded to M rows at build time
(row n+j repeats row j mod n). Selection draws one uniform key per row —
originals in (-1, 0), cycled copies in (0, 1) — and takes the N smallest by
a variadic `lax.sort` over all channels:
  * n >= N: all winners are originals -> an exact uniform N-subset
    (matches rng.choice(n, N, replace=False) in distribution).
  * n < N: every original is selected plus N-n repeats drawn WITHOUT
    replacement from the copy pool (the reference draws repeats WITH
    replacement). Same support, repeat multiplicities capped at
    ceil((M-n)/n)+1 instead of unbounded — a documented, negligible
    deviation (docs/PARITY.md).

No gathers anywhere on the per-point axis (XLA TPU gathers serialize —
CLAUDE.md): selection is a sort, batch assembly gathers only B whole-plot
slices and (B, 4) coverage rows.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from stratanet2_tpu.config import Config, ModelConfig
from stratanet2_tpu.data.transforms import (
    add_fake_empty_ground_points,
    center_cloud,
    rescale_cloud,
)

__all__ = [
    "DeviceDataset",
    "build_device_dataset",
    "make_device_sampler",
    "make_device_epoch",
    "make_device_eval",
    "eval_index_table",
]


class DeviceDataset(NamedTuple):
    """Device-resident plot arrays (HBM cost: P * M * 13 * 4 bytes —
    ~60 MB at reference scale P=110, M~10.5k)."""

    feats: jax.Array  # (P, M, F) rescaled features, cycle-padded
    xyz: jax.Array  # (P, M, 3) centered raw-meter positions, cycle-padded
    n: jax.Array  # (P,) valid point counts (pre-padding)
    coverages: jax.Array  # (P, 4) GT, or (P, 0) when absent (SSL/inference)
    plot_ids: Tuple[str, ...]  # host-side id order matching axis 0


def _cycle_pad(arr: np.ndarray, m: int) -> np.ndarray:
    """Pad (n, C) to (m, C) with rows j mod n — every padding row is a real
    point, so repeat selection needs no gather."""
    n = arr.shape[0]
    if n >= m:
        return arr[:m]
    reps = np.arange(m - n) % n
    return np.concatenate([arr, arr[reps]], axis=0)


def build_device_dataset(
    dataset: Dict[str, Dict],
    plot_ids: Sequence[str],
    mcfg: ModelConfig,
) -> DeviceDataset:
    """Host-side one-time build: per plot run the deterministic pipeline
    prefix (center -> fake points -> rescale), cycle-pad to the common M,
    upload once."""
    feats_l, xyz_l, n_l, cov_l = [], [], [], []
    m = mcfg.subsample_size
    prepared = []
    for pid in plot_ids:
        data = dataset[pid]
        # center in float64 like the host loader (absolute coords lose
        # ~0.25 m in float32), then drop to float32 for the device table
        cloud = np.asarray(data["cloud"], np.float64)
        cloud = center_cloud(cloud, data["plot_center"]).astype(np.float32)
        cloud = add_fake_empty_ground_points(
            cloud, mcfg.diam_meters, mcfg.n_input_feats
        )
        xyz = cloud[:3].copy()
        cloud = rescale_cloud(cloud, mcfg.z_max)
        prepared.append((cloud.T, xyz.T, np.asarray(data.get("coverages", np.empty(0)), np.float32)))
        m = max(m, cloud.shape[1])
    for cloud_t, xyz_t, cov in prepared:
        n_l.append(cloud_t.shape[0])
        feats_l.append(_cycle_pad(cloud_t, m))
        xyz_l.append(_cycle_pad(xyz_t, m))
        cov_l.append(cov)
    # size 4 = supervised GT, size 0 = no GT (SSL); anything else is a
    # malformed entry that would otherwise silently zero the whole table
    # to (P, 0) — the host PlotLoader path fails loudly at np.stack
    bad = [pid for pid, c in zip(plot_ids, cov_l) if c.size not in (0, 4)]
    n_with_gt = sum(c.size == 4 for c in cov_l)
    if bad or 0 < n_with_gt < len(cov_l):
        bad = bad or [pid for pid, c in zip(plot_ids, cov_l) if c.size != 4]
        raise ValueError(
            f"{len(bad)} of {len(plot_ids)} plots have malformed or missing "
            f"coverages (expected 4 values, or none for SSL): {bad[:5]}"
        )
    covs = (
        np.stack(cov_l)
        if cov_l and n_with_gt == len(cov_l)
        else np.zeros((len(plot_ids), 0), np.float32)
    )
    return DeviceDataset(
        feats=jnp.asarray(np.stack(feats_l)),
        xyz=jnp.asarray(np.stack(xyz_l)),
        n=jnp.asarray(np.asarray(n_l, np.int32)),
        coverages=jnp.asarray(covs),
        plot_ids=tuple(plot_ids),
    )


def _augment_subsample_one(
    feats: jax.Array,  # (M, F) rescaled
    xyz: jax.Array,  # (M, 3) raw meters
    n: jax.Array,  # () int32
    key: jax.Array,
    n_out: int,
    train: bool,
):
    """One plot: shared rotation/flips (+feature xy noise) then the key-sort
    subsample. All per-point work is elementwise or a variadic sort — no
    point-axis gathers."""
    m = feats.shape[0]
    k_rot, k_fx, k_fy, k_noise, k_sel = jax.random.split(key, 5)

    if train:
        # np.radians(rng.choice(360)) — whole-degree shared rotation
        angle = jnp.radians(
            jax.random.randint(k_rot, (), 0, 360).astype(jnp.float32)
        )
        c, s = jnp.cos(angle), jnp.sin(angle)
        # transforms.rotate_around_z: [x, y] @ [[c, -s], [s, c]]
        sx = jnp.where(jax.random.uniform(k_fx) > 0.5, -1.0, 1.0)
        sy = jnp.where(jax.random.uniform(k_fy) > 0.5, -1.0, 1.0)

        def rot(xy):
            x, y = xy[..., 0], xy[..., 1]
            return jnp.stack([(x * c + y * s) * sx, (-x * s + y * c) * sy], -1)

        # clipped Gaussian xy noise on FEATURES only (scaled units)
        noise = jnp.clip(
            0.01 * jax.random.normal(k_noise, (m, 2)), -0.03, 0.03
        )
        feats = jnp.concatenate([rot(feats[:, :2]) + noise, feats[:, 2:]], -1)
        xyz = jnp.concatenate([rot(xyz[:, :2]), xyz[:, 2:]], -1)

    # key-sort selection: originals in (-1, 0), cycled copies in (0, 1)
    pos = jnp.arange(m, dtype=jnp.int32)
    u = jax.random.uniform(k_sel, (m,))
    order = jnp.where(pos < n, u - 1.0, u)
    cols = [feats[:, i] for i in range(feats.shape[1])] + [
        xyz[:, i] for i in range(3)
    ]
    sorted_ops = jax.lax.sort([order] + cols, dimension=0, num_keys=1)
    picked = [op[:n_out] for op in sorted_ops[1:]]
    f = feats.shape[1]
    return jnp.stack(picked[:f], -1), jnp.stack(picked[f:], -1)


def replicate_device_dataset(mesh, dd: "DeviceDataset") -> "DeviceDataset":
    """Pre-replicate the device arrays over a DP mesh. The epoch/eval
    programs declare replicated in_shardings for the dataset operands, so a
    single-device-committed dataset would be re-broadcast across the mesh on
    EVERY call; replicating once at build time makes those transfers a
    no-op. plot_ids is host-side metadata and passes through."""
    from stratanet2_tpu.parallel import replicate

    return dd._replace(
        feats=replicate(mesh, dd.feats),
        xyz=replicate(mesh, dd.xyz),
        n=replicate(mesh, dd.n),
        coverages=replicate(mesh, dd.coverages),
    )


def _sample_batch(mcfg: ModelConfig, feats, xyz_all, n_all, plot_idx, key, train):
    """Shared batch-assembly body: gather B whole-plot rows and
    augment+subsample each (the single source of the sampling semantics for
    make_device_sampler / make_device_epoch / make_device_eval)."""
    keys = jax.random.split(key, plot_idx.shape[0])
    return jax.vmap(
        lambda f, x, n, k: _augment_subsample_one(
            f, x, n, k, mcfg.subsample_size, train
        )
    )(feats[plot_idx], xyz_all[plot_idx], n_all[plot_idx], keys)


def make_device_sampler(mcfg: ModelConfig, train: bool):
    """Jitted (dd, plot_idx (B,), key) -> batch dict of device arrays with
    the PlotLoader batch schema (cloud/xyz/coverages)."""

    @jax.jit
    def _sample(feats, xyz_all, n_all, coverages, plot_idx, key):
        cloud, xyz = _sample_batch(mcfg, feats, xyz_all, n_all, plot_idx, key, train)
        return {
            "cloud": cloud,
            "xyz": xyz,
            "coverages": coverages[plot_idx],
        }

    def sample(dd: DeviceDataset, plot_idx, key):
        # dd.plot_ids is host-side strings — keep it out of the jit boundary
        return _sample(
            dd.feats, dd.xyz, dd.n, dd.coverages, jnp.asarray(plot_idx), key
        )

    return sample


def make_device_epoch(cfg: Config, train_step_fn, mesh=None):
    """One WHOLE training epoch as a single jitted program: lax.scan over
    the per-batch (sample -> train step) body. Host sends the shuffled
    (n_batches, B) plot-index table + one key; receives summed loss
    components once.

    `train_step_fn` is the un-jitted step body from make_train_step (the
    scan jit subsumes the per-call jit).

    With `mesh`, the epoch runs data-parallel: the (small, ~60 MB) dataset
    and the model replicate, the idx table's BATCH column shards across
    devices, and GSPMD propagates the batch sharding through sampling +
    forward and inserts the gradient all-reduce (psum over ICI) where the
    loss mean crosses the batch axis — the device-resident analogue of the
    per-batch DP path in learning/train.train_one_epoch. Requires
    batch_size % n_devices == 0."""

    mcfg = cfg.model

    def epoch(ts, feats, xyz, n, coverages, idx_table, key):
        def body(ts, inp):
            plot_idx, i = inp
            kb = jax.random.fold_in(key, i)
            cloud_b, xyz_s = _sample_batch(
                mcfg, feats, xyz, n, plot_idx, jax.random.fold_in(kb, 1), True
            )
            ts, comps = train_step_fn(
                ts, cloud_b, xyz_s, coverages[plot_idx],
                jax.random.fold_in(kb, 2),
            )
            return ts, comps

        nb = idx_table.shape[0]
        ts, comps_all = jax.lax.scan(
            body, ts, (idx_table, jnp.arange(nb, dtype=jnp.int32))
        )
        sums = jax.tree_util.tree_map(lambda a: jnp.sum(a, axis=0), comps_all)
        return ts, sums

    if mesh is None:
        return jax.jit(epoch, donate_argnums=(0,))

    from jax.sharding import NamedSharding, PartitionSpec as P

    from stratanet2_tpu.parallel.mesh import BATCH_AXIS

    assert cfg.train.batch_size % mesh.devices.size == 0, (
        f"batch_size {cfg.train.batch_size} must divide over "
        f"{mesh.devices.size} devices"
    )
    rep = NamedSharding(mesh, P())
    idx_sh = NamedSharding(mesh, P(None, BATCH_AXIS))  # (nb, B) table
    return jax.jit(
        epoch,
        donate_argnums=(0,),
        in_shardings=(rep, rep, rep, rep, rep, idx_sh, rep),
        out_shardings=(rep, rep),
    )


def make_device_eval(cfg: Config, eval_core):
    """The whole VALIDATION pass as ONE jitted program (the eval analogue of
    make_device_epoch): lax.scan over (subsample -> eval forward + per-item
    losses). Periodic evals previously re-uploaded every val batch through
    the host loader and fetched per batch — with the val set HBM-resident,
    one (nb, B) index table goes up and the per-plot (pred_pl, loss
    components) come back in a single fetch (~45 s of per-fold eval overhead
    at the reference schedule, RESULTS.md).

    `eval_core` is learning/train.make_eval_core's body: (model, cloud, xyz,
    gt) -> (pred_pl, comps) with per-item components — the same math the
    host-loader eval step uses, minus the per-point outputs (cov/proba/aux/
    embeddings) that only figures need; stacking those over the scan would
    return (nb, B, N, .) tensors, so the fast path is for figure-free evals.

    Subsampling uses the deterministic eval pipeline (no augmentation) with
    a caller-fixed key: every eval epoch sees the same subsample, so the
    early-stopping signal is not jittered by selection noise."""
    mcfg = cfg.model

    @jax.jit
    def run(model, feats, xyz, n, coverages, idx_table, key):
        def body(_, inp):
            plot_idx, i = inp
            cloud_b, xyz_s = _sample_batch(
                mcfg, feats, xyz, n, plot_idx, jax.random.fold_in(key, i), False
            )
            pred_pl, comps = eval_core(model, cloud_b, xyz_s, coverages[plot_idx])
            return 0, (pred_pl, comps)

        nb = idx_table.shape[0]
        _, (preds, comps) = jax.lax.scan(
            body, 0, (idx_table, jnp.arange(nb, dtype=jnp.int32))
        )
        return preds, comps  # (nb, B, 4), dict of (nb, B)

    return run


def eval_index_table(n_plots: int, batch_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Sequential val table padded to a batch multiple: returns
    ((nb, B) int32 plot indices, (nb*B,) bool valid mask). Padding repeats
    plot 0; the mask drops the duplicates at host aggregation."""
    nb = -(-n_plots // batch_size)
    idx = np.zeros(nb * batch_size, np.int32)
    idx[:n_plots] = np.arange(n_plots, dtype=np.int32)
    valid = np.zeros(nb * batch_size, bool)
    valid[:n_plots] = True
    return idx.reshape(nb, batch_size), valid


def epoch_index_table(
    n_plots: int, batch_size: int, seed: int, epoch: int
) -> np.ndarray:
    """Shuffled drop_last batch table, same schedule semantics as
    PlotLoader.__iter__ (seeded rng per epoch, learning/train.py:33-38)."""
    ids = np.arange(n_plots)
    rng = np.random.default_rng(seed + epoch)
    rng.shuffle(ids)
    nb = n_plots // batch_size
    return ids[: nb * batch_size].reshape(nb, batch_size).astype(np.int32)
