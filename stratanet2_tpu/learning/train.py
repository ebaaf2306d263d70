"""Training engine: jitted train/eval steps and the full training loop.

Replaces the reference's torch loop (learning/train.py:29-177) with a single
compiled train step — forward, in-graph plotwise projection, all three loss
terms, backward, Adam update — executed once per batch with no host round
trips (the reference crossed GPU->CPU->GPU for the KDE NLL every step,
learning/loss_functions.py:30-53).

Optimizer parity: torch Adam(weight_decay=wd) adds wd*param to the gradient
*before* the moment updates (L2, not decoupled AdamW), and StepLR multiplies
the LR by lr_decay every `step_size` epochs (learning/train.py:180-185).
Expressed here as optax.chain(add_decayed_weights, scale_by_adam,
staircase exponential_decay schedule per optimizer step).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from stratanet2_tpu.config import Config
from stratanet2_tpu.learning.kde import KdeMixture
from stratanet2_tpu.learning.losses import (
    absolute_loss_by_strata,
    entropy_loss,
    nll_loss,
    total_loss,
)
from stratanet2_tpu.models import PointNet2Params, init_pointnet2, pointnet2_forward, count_params
from stratanet2_tpu.ops import plotwise_coverages
from stratanet2_tpu.utils import checkpoint as ckpt

logger = logging.getLogger("stratanet2_tpu")


class TrainState(NamedTuple):
    params: Any
    model_state: Any  # batch-norm running stats
    opt_state: Any
    step: jax.Array


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=cfg.train.lr,
        transition_steps=max(steps_per_epoch * cfg.train.step_size, 1),
        decay_rate=cfg.train.lr_decay,
        staircase=True,
    )
    return optax.chain(
        optax.add_decayed_weights(cfg.train.wd),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    )


def init_train_state(
    cfg: Config,
    optimizer: optax.GradientTransformation,
    seed: int = 0,
    pretrained_path: Optional[str] = None,
) -> TrainState:
    model = init_pointnet2(jax.random.PRNGKey(seed), cfg.model)
    params, model_state = model.params, model.state
    if pretrained_path:
        payload = ckpt.load_checkpoint(pretrained_path)
        params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
        model_state = jax.tree_util.tree_map(jnp.asarray, payload["model_state"])
        logger.info("Loaded pretrained weights from %s", pretrained_path)
    logger.info("Total number of parameters: %d", count_params(params))
    opt_state = optimizer.init(params)
    return TrainState(params, model_state, opt_state, jnp.zeros((), jnp.int32))


def make_train_step(
    cfg: Config,
    optimizer: optax.GradientTransformation,
    kde: KdeMixture,
    jit: bool = True,
):
    """One fused optimization step (forward + projection + 3-term loss +
    backward + Adam), jitted with donated state.

    `jit=False` returns the raw step body for callers that embed it in a
    larger compiled program (data/device_dataset.make_device_epoch scans it
    over a whole epoch)."""
    mcfg = cfg.model
    m, e = cfg.train.m, cfg.train.e
    kde_grid = jnp.asarray(kde.grid)
    kde_pdfs = jnp.asarray(kde.pdfs)

    def step(ts: TrainState, cloud, xyz, gt, rng):
        # inputs may arrive in the reduced transfer dtype (f16 over the
        # wire, DataConfig.transfer_dtype); compute is always f32
        cloud = cloud.astype(jnp.float32)
        xyz = xyz.astype(jnp.float32)
        gt = gt.astype(jnp.float32)

        def loss_fn(params):
            cov, proba, new_state = pointnet2_forward(
                PointNet2Params(params, ts.model_state),
                cloud[..., 2:],
                xyz,
                mcfg,
                train=True,
                rng=rng,
            )
            pred_pl = plotwise_coverages(cov, cloud[..., :2], mcfg.diam_pix)
            z_m = cloud[..., 2] * mcfg.z_max
            loss, (comps, _aux) = total_loss(
                pred_pl, gt, proba, z_m, kde_grid, kde_pdfs, m, e
            )
            return loss, (comps, new_state)

        (_, (comps, new_state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts.params
        )
        updates, new_opt = optimizer.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        return TrainState(new_params, new_state, new_opt, ts.step + 1), comps

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,))


def _eval_per_item(cfg: Config, kde_grid, kde_pdfs):
    """Per-plot eval losses — the single implementation shared by the
    host-loader eval step and the device-resident eval program."""

    def per_item(pred1, gt1, proba1, z1):
        l_abs_strata = absolute_loss_by_strata(pred1[None], gt1[None])
        l_abs = jnp.mean(l_abs_strata)
        # Same uniform-grid NLL as the train path (single implementation;
        # jnp.interp's searchsorted serializes on TPU — see losses.nll_loss).
        l_nll, (p_all, pdf) = nll_loss(proba1, z1, kde_grid, kde_pdfs)
        l_e = entropy_loss(proba1)
        l_total = l_abs + cfg.train.m * l_nll + cfg.train.e * l_e
        return {
            "total_loss": l_total,
            "MAE_loss": l_abs,
            "log_loss": l_nll,
            "MAE_veg_b": l_abs_strata[0],
            "MAE_veg_moy": l_abs_strata[1],
            "MAE_veg_h": l_abs_strata[2],
        }, (p_all, pdf)

    return per_item


def make_eval_core(cfg: Config, kde: KdeMixture):
    """Un-jitted eval body returning only the per-plot outputs —
    (pred_pl (B, 4), comps dict of (B,)) — for embedding in larger compiled
    programs (data/device_dataset.make_device_eval)."""
    mcfg = cfg.model
    kde_grid = jnp.asarray(kde.grid)
    kde_pdfs = jnp.asarray(kde.pdfs)
    per_item = _eval_per_item(cfg, kde_grid, kde_pdfs)

    def core(model: PointNet2Params, cloud, xyz, gt):
        cloud = cloud.astype(jnp.float32)
        xyz = xyz.astype(jnp.float32)
        gt = gt.astype(jnp.float32)
        cov, proba, _ = pointnet2_forward(model, cloud[..., 2:], xyz, mcfg, train=False)
        pred_pl = plotwise_coverages(cov, cloud[..., :2], mcfg.diam_pix)
        z_m = cloud[..., 2] * mcfg.z_max
        comps, _aux = jax.vmap(per_item)(pred_pl, gt, proba, z_m)
        return pred_pl, comps

    return core


def make_eval_step(cfg: Config, kde: KdeMixture):
    """Batched eval step returning per-item losses/predictions so the host
    can aggregate over valid (non-padding) items — equivalent to the
    reference's batch_size=1 eval (learning/test.py:38-43)."""
    mcfg = cfg.model
    kde_grid = jnp.asarray(kde.grid)
    kde_pdfs = jnp.asarray(kde.pdfs)
    per_item = _eval_per_item(cfg, kde_grid, kde_pdfs)

    def step(model: PointNet2Params, cloud, xyz, gt):
        cloud = cloud.astype(jnp.float32)
        xyz = xyz.astype(jnp.float32)
        gt = gt.astype(jnp.float32)
        cov, proba, _, g = pointnet2_forward(
            model, cloud[..., 2:], xyz, mcfg, train=False, return_embeddings=True
        )
        pred_pl = plotwise_coverages(cov, cloud[..., :2], mcfg.diam_pix)
        z_m = cloud[..., 2] * mcfg.z_max
        comps, aux = jax.vmap(per_item)(pred_pl, gt, proba, z_m)
        return pred_pl, cov, proba, comps, aux, g

    return jax.jit(step)


def train_one_epoch(
    train_step,
    ts: TrainState,
    loader,
    rng_key: jax.Array,
    mesh=None,
) -> Tuple[TrainState, Dict[str, float]]:
    """One epoch over shuffled, drop_last batches (learning/train.py:29-79).

    With a mesh, batches are placed with batch-axis sharding and XLA runs the
    step data-parallel across devices (gradient psum over ICI)."""
    from stratanet2_tpu.parallel import batch_sharding

    def _put(x):
        a = jnp.asarray(x)
        if mesh is not None:
            return jax.device_put(a, batch_sharding(mesh, a.ndim))
        return a

    # Accumulate loss components ON DEVICE and fetch once per epoch: a
    # per-batch device_get blocks the dispatch pipeline on every step —
    # through the axon relay that serialized upload -> compute -> RPC
    # fetch per batch (~2.8 s/epoch at PROD where the device work is
    # ~0.1 s; same lesson as the predict path's batch pipelining).
    acc = None
    n = 0
    n_points = 0
    t0 = time.time()
    for batch in loader:
        rng_key, sub = jax.random.split(rng_key)
        ts, comps = train_step(
            ts,
            _put(batch["cloud"]),
            _put(batch["xyz"]),
            _put(batch["coverages"]),
            sub,
        )
        acc = comps if acc is None else jax.tree_util.tree_map(jnp.add, acc, comps)
        n += 1
        n_points += batch["cloud"].shape[0] * batch["cloud"].shape[1]
    if acc is None:
        # empty epoch (fewer train plots than batch_size): report zeroed
        # loss keys so downstream logging (print_epoch_losses, fold stats)
        # sees the same schema as a real epoch instead of KeyError'ing.
        # Must be the TRAIN schema (losses.total_loss comps), not eval's
        # LOSS_KEYS — mixing schemas across folds pollutes the cross-fold
        # DataFrame with spurious MAE_veg_* columns and drops entropy_loss
        sums = {k: 0.0 for k in
                ("total_loss", "MAE_loss", "log_loss", "entropy_loss")}
    else:
        sums = jax.device_get(acc)
    means = {k: float(v) / max(n, 1) for k, v in sums.items()}
    means["step"] = int(jax.device_get(ts.step))
    means["points_per_sec"] = round(n_points / max(time.time() - t0, 1e-9), 1)
    return ts, means


def train_one_epoch_device_resident(
    epoch_fn,
    ts: TrainState,
    dd,
    cfg: Config,
    seed: int,
    epoch: int,
    rng_key: jax.Array,
) -> Tuple[TrainState, Dict[str, float]]:
    """One epoch as ONE device program (data/device_dataset.make_device_epoch):
    only the shuffled index table and a key cross the relay; loss sums come
    back in a single fetch."""
    from stratanet2_tpu.data.device_dataset import epoch_index_table

    idx = epoch_index_table(
        len(dd.plot_ids), cfg.train.batch_size, seed, epoch
    )
    t0 = time.time()
    ts, sums = epoch_fn(
        ts, dd.feats, dd.xyz, dd.n, dd.coverages,
        jnp.asarray(idx), jax.random.fold_in(rng_key, epoch),
    )
    sums = jax.device_get(sums)
    nb = max(idx.shape[0], 1)
    means = {k: float(v) / nb for k, v in sums.items()}
    means["step"] = int(jax.device_get(ts.step))
    n_points = idx.size * cfg.model.subsample_size
    means["points_per_sec"] = round(n_points / max(time.time() - t0, 1e-9), 1)
    return ts, means


def print_epoch_losses(epoch: int, loss_dict: Dict[str, float], train: bool):
    task = "train" if train else "test"
    logger.info(
        "Epoch %3d -> %s Loss: %1.2f %s Loss Abs (MAE): %1.2f %s Loss Log: %1.2f",
        epoch, task, loss_dict["total_loss"], task, loss_dict["MAE_loss"],
        task, loss_dict["log_loss"],
    )


class EarlyStopper:
    """Best-metric tracking + patience (model/point_net2.py:165-184)."""

    def __init__(self, cfg: Config):
        self.best_metric_value = 1e6
        self.best_metric_epoch = 1
        self.patience = cfg.train.patience_in_epochs
        self.start_epoch = cfg.train.epoch_to_start_early_stop
        self.stopped_early = False

    def should_stop(self, val_metric: float, epoch: int) -> Tuple[bool, bool]:
        """Returns (stop, improved)."""
        if val_metric < self.best_metric_value:
            self.best_metric_value = val_metric
            self.best_metric_epoch = epoch
            return False, True
        if epoch < self.start_epoch:
            return False, False
        if epoch >= self.best_metric_epoch + self.patience:
            self.stopped_early = True
            return True, False
        return False, False

    def state_dict(self) -> Dict[str, float]:
        return {
            "best_metric_value": self.best_metric_value,
            "best_metric_epoch": self.best_metric_epoch,
            # persisted so resume=True on a fold that already early-stopped
            # does not retrain past the stop point (duplicate evals/metrics)
            "stopped_early": self.stopped_early,
        }

    def load_state_dict(self, state: Dict[str, float]) -> None:
        self.best_metric_value = float(
            state.get("best_metric_value", self.best_metric_value)
        )
        self.best_metric_epoch = int(
            state.get("best_metric_epoch", self.best_metric_epoch)
        )
        self.stopped_early = bool(state.get("stopped_early", self.stopped_early))


# Cross-fold program cache: cross-validation runs every fold in ONE
# process (learning/crossval.py) but train_full used to rebuild the
# jitted step/epoch closures per fold — jax caches compiled programs on
# the callable's identity, so each fold re-paid ~60-100 s of tracing +
# lowering on a 1-core host even with the persistent compile cache warm.
# Keyed on (frozen cfg, steps_per_epoch, kde identity, mesh identity,
# path kind); entries hold the kde/mesh refs so id() keys stay valid.
_PROGRAM_CACHE: dict = {}


def _cached_programs(cfg, steps_per_epoch, kde, mesh, kind):
    """kind: "device" (device-resident epoch), "host" (per-batch step) or
    "point_sharded" (context-parallel train step over a (1, D) mesh)."""
    key = (
        cfg, steps_per_epoch, id(kde),
        id(mesh) if mesh is not None else None, kind,
    )
    entry = _PROGRAM_CACHE.get(key)
    if entry is None:
        optimizer = make_optimizer(cfg, steps_per_epoch)
        entry = {
            "refs": (kde, mesh),
            "optimizer": optimizer,
            "eval_step": make_eval_step(cfg, kde),
        }
        if kind == "device":
            from stratanet2_tpu.data.device_dataset import (
                make_device_epoch,
                make_device_eval,
            )

            entry["epoch_fn"] = make_device_epoch(
                cfg, make_train_step(cfg, optimizer, kde, jit=False),
                mesh=mesh,
            )
            entry["device_eval"] = make_device_eval(cfg, make_eval_core(cfg, kde))
        elif kind == "point_sharded":
            from stratanet2_tpu.parallel.point_sharded import (
                make_point_sharded_train_step,
            )

            entry["train_step"] = make_point_sharded_train_step(
                cfg, optimizer, kde, mesh
            )
        else:
            entry["train_step"] = make_train_step(cfg, optimizer, kde)
        _PROGRAM_CACHE.clear()  # one active configuration at a time
        _PROGRAM_CACHE[key] = entry
    return entry


def point_sharded_eligible(cfg: Config):
    """Whether context-parallel (point-sharded) training can run in this
    process: returns (ok, reason-why-not). The step shards N/k1/C1 over
    all local devices (parallel/point_sharded.py), so each must divide."""
    n_dev = len(jax.devices())
    if n_dev <= 1:
        return False, "needs more than one device"
    mcfg = cfg.model
    if (
        mcfg.subsample_size % n_dev
        or mcfg.k1 % n_dev
        or mcfg.n_centroids1 % n_dev
    ):
        return False, (
            f"needs subsample_size={mcfg.subsample_size}, k1={mcfg.k1}, "
            f"n_centroids1={mcfg.n_centroids1} all divisible by "
            f"{n_dev} devices"
        )
    return True, ""


def train_full(
    dataset: Dict,
    train_ids,
    val_ids,
    cfg: Config,
    kde: KdeMixture,
    stats_path: str,
    sink,
    fold_id: int,
    pretrained_path: Optional[str] = None,
    seed: int = 0,
    resume: bool = False,
    mesh=None,
    point_sharded: bool = False,
):
    """Full training loop for one fold (reference learning/train.py:82-177).

    Extends the reference with crash recovery: a `resume` checkpoint
    (params + BN state + optimizer state + epoch cursor) is written every
    eval epoch; `resume=True` continues a killed run from it (the reference
    loses the fold on a crash, SURVEY.md §5).

    Returns (train_state, train_loss_dicts, test_loss_dicts, cloud_info_list).
    """
    from stratanet2_tpu.data.loader import PlotLoader
    from stratanet2_tpu.learning.evaluate import evaluate

    train_loader = PlotLoader(dataset, cfg, plot_ids=train_ids, train=True, seed=seed)
    steps_per_epoch = max(len(train_loader), 1)

    # Resolve point-sharding eligibility FIRST so an ineligible request
    # falls back to the FULL standard path (device-resident auto + any DP
    # mesh the caller passed) instead of a degraded single-device run.
    if point_sharded:
        ok, why = point_sharded_eligible(cfg)
        if not ok:
            logger.warning(
                "point-sharded training unavailable (%s); using the "
                "standard path%s", why,
                f" (data-parallel over {mesh.devices.size} devices)"
                if mesh is not None else "",
            )
            point_sharded = False

    # Device-resident data path: dataset uploaded once, augmentation +
    # subsampling + the whole epoch's steps run as one compiled scan.
    # Composes with a DP mesh (dataset/model replicated, batch column of
    # the index table sharded, GSPMD inserts the gradient psum) when the
    # batch divides over the devices. "auto" engages when the estimated
    # fold footprint fits device_resident_max_bytes (~60 MB at reference
    # scale for a 9x epoch speedup, RESULTS.md).
    dr = cfg.data.device_resident
    if isinstance(dr, str):
        if dr == "auto":
            import math

            # fake ground points: one per 1m-pixel center inside the plot
            # disk -> ~pi/4 * diam_METERS^2 (add_fake_empty_ground_points
            # meshes over diam_meters, not diam_pix)
            fake_max = int(math.pi / 4 * cfg.model.diam_meters**2) + 16
            all_ids = list(train_ids) + list(val_ids)
            m_est = max(
                cfg.model.subsample_size,
                max(
                    (
                        int(
                            dataset[i].get(
                                "N_points_in_cloud", dataset[i]["cloud"].shape[1]
                            )
                        )
                        for i in all_ids
                    ),
                    default=0,
                ) + fake_max,
            )
            # both the train fold AND the val fold are uploaded (dd_val
            # powers the device-resident eval fast path)
            est_bytes = len(all_ids) * m_est * 16 * 4
            dr = est_bytes < cfg.data.device_resident_max_bytes
        else:
            dr = dr == "true"
    device_data = bool(dr) and not point_sharded and (
        mesh is None or cfg.train.batch_size % mesh.devices.size == 0
    )
    kind = "host"
    train_mesh = mesh
    if device_data:
        kind = "device"
    elif point_sharded:
        # context-parallel training: POINT axis sharded over all devices
        # (parallel/point_sharded.make_point_sharded_train_step);
        # eligibility was resolved above. make_mesh_2d is memoized so the
        # cross-fold _PROGRAM_CACHE key (id(mesh)) stays stable.
        from stratanet2_tpu.parallel.point_sharded import make_mesh_2d

        n_dev = len(jax.devices())
        train_mesh = make_mesh_2d(1, n_dev)
        kind = "point_sharded"
        # the point-sharded step owns its (1, n_dev) mesh; a DP mesh the
        # caller passed must not also place the train state
        mesh = None
        logger.info("Point-sharded training over %d devices", n_dev)
    programs = _cached_programs(cfg, steps_per_epoch, kde, train_mesh, kind)
    optimizer = programs["optimizer"]
    eval_step = programs["eval_step"]
    ts = init_train_state(cfg, optimizer, seed=seed, pretrained_path=pretrained_path)
    device_eval = None
    if device_data:
        from stratanet2_tpu.data.device_dataset import build_device_dataset

        dd = build_device_dataset(dataset, list(train_ids), cfg.model)
        if mesh is not None:
            from stratanet2_tpu.data.device_dataset import replicate_device_dataset

            dd = replicate_device_dataset(mesh, dd)
        epoch_fn = programs["epoch_fn"]
        logger.info(
            "Device-resident dataset: %d plots x %d rows (%.1f MB HBM)%s",
            dd.feats.shape[0], dd.feats.shape[1],
            (dd.feats.size + dd.xyz.size) * 4 / 1e6,
            f", data-parallel over {mesh.devices.size} devices"
            if mesh is not None else "",
        )
        if len(val_ids):
            # val set HBM-resident too: periodic evals run as one device
            # program (evaluate()'s fast path; the last-epoch eval still
            # takes the figure-capable host path)
            dd_val = build_device_dataset(dataset, list(val_ids), cfg.model)
            if mesh is not None:
                from stratanet2_tpu.data.device_dataset import (
                    replicate_device_dataset,
                )

                dd_val = replicate_device_dataset(mesh, dd_val)
            device_eval = (programs["device_eval"], dd_val)
    else:
        train_step = programs["train_step"]

    stopper = EarlyStopper(cfg)
    ckpt_path = os.path.join(stats_path, ckpt.checkpoint_name(fold_id))
    resume_path = ckpt_path + ".resume"
    rng_key = jax.random.PRNGKey(seed + 1)

    start_epoch = 1
    if resume and os.path.exists(resume_path):
        payload = ckpt.load_checkpoint(resume_path)
        ts = TrainState(
            jax.tree_util.tree_map(jnp.asarray, payload["params"]),
            jax.tree_util.tree_map(jnp.asarray, payload["model_state"]),
            jax.tree_util.tree_map(jnp.asarray, payload["opt_state"]),
            jnp.asarray(payload["metadata"].get("step", 0), jnp.int32),
        )
        start_epoch = payload["metadata"].get("epoch", 0) + 1
        train_loader.epoch = start_epoch - 1  # keep shuffle schedule aligned
        # Restore early-stopping state: without it a resumed run resets
        # best_metric_value to 1e6 and the first post-resume eval overwrites
        # the (possibly better) pre-crash best checkpoint; patience would
        # also restart from the resume point.
        stopper.load_state_dict(payload["metadata"].get("stopper", {}))
        if cfg.train.use_early_stopping and stopper.stopped_early:
            # the fold already early-stopped before the crash: don't retrain
            # past the stop point (duplicate evals + a worse "final" entry)
            logger.info(
                "Fold %d already early-stopped at epoch %d; skipping training",
                fold_id, start_epoch - 1,
            )
            start_epoch = cfg.train.n_epoch + 1
        logger.info("Resuming fold %d from epoch %d", fold_id, start_epoch)

    if mesh is not None:
        from stratanet2_tpu.parallel import replicate

        ts = replicate(mesh, ts)
        logger.info(
            "Data-parallel training over %d devices", mesh.devices.size
        )

    all_train_losses: List[Dict] = []
    all_test_losses: List[Dict] = []
    current_epoch = start_epoch - 1
    for current_epoch in range(start_epoch, cfg.train.n_epoch + 1):
        sink.set_epoch(current_epoch)
        t0 = time.time()
        with sink.context(f"fold_{fold_id}_train"):
            if device_data:
                ts, train_losses = train_one_epoch_device_resident(
                    epoch_fn, ts, dd, cfg, seed, current_epoch, rng_key
                )
            else:
                ts, train_losses = train_one_epoch(
                    train_step, ts, train_loader,
                    # independent key stream per epoch (splitting the same
                    # key forward would make epoch e+1 reuse epoch e's
                    # dropout keys shifted by one batch)
                    jax.random.fold_in(rng_key, current_epoch),
                    # point-sharded steps place their own shardings via
                    # jit in_specs; DP placement applies otherwise
                    mesh=mesh if kind == "host" else None,
                )
            train_losses["epoch"] = current_epoch
            train_losses["epoch_seconds"] = time.time() - t0
            print_epoch_losses(current_epoch, train_losses, train=True)
            sink.log_metrics(train_losses, epoch=current_epoch, step=train_losses["step"])
            all_train_losses.append(train_losses)

        if (current_epoch % cfg.train.n_epoch_test == 0) or (
            current_epoch > cfg.train.epoch_to_start_early_stop
        ):
            with sink.context(f"fold_{fold_id}_val"):
                test_losses, _ = evaluate(
                    PointNet2Params(ts.params, ts.model_state),
                    dataset, val_ids, cfg, kde, eval_step, stats_path, sink,
                    fold_id=fold_id, epoch=current_epoch,
                    device_eval=device_eval,
                )
                test_losses["epoch"] = current_epoch
                test_losses["step"] = int(jax.device_get(ts.step))
                print_epoch_losses(current_epoch, test_losses, train=False)
                sink.log_metrics(test_losses, epoch=current_epoch, step=test_losses["step"])
                all_test_losses.append(test_losses)

                stop = False
                if cfg.train.use_early_stopping:
                    stop, improved = stopper.should_stop(
                        test_losses["total_loss"], current_epoch
                    )
                    if improved:
                        ckpt.save_checkpoint(
                            ckpt_path, ts.params, ts.model_state, ts.opt_state,
                            metadata={
                                "best_metric_epoch": stopper.best_metric_epoch,
                                "best_metric_value": stopper.best_metric_value,
                                "fold_id": fold_id,
                            },
                        )
                # Saved AFTER this epoch's eval + should_stop so the
                # persisted early-stopping state is never one eval stale: a
                # crash after an improved eval must not let a resumed run
                # restore the pre-improvement best_metric_value and later
                # overwrite the (already improved) best checkpoint with
                # worse weights. eval does not mutate ts, so the weights
                # saved here are identical either way; a crash *during*
                # eval resumes from the previous eval epoch's snapshot and
                # retrains one epoch.
                ckpt.save_checkpoint(
                    resume_path, ts.params, ts.model_state, ts.opt_state,
                    metadata={
                        "epoch": current_epoch,
                        "step": int(jax.device_get(ts.step)),
                        "fold_id": fold_id,
                        "stopper": stopper.state_dict(),
                    },
                )
                if stop:
                    logger.info("Early stopping at epoch %d", current_epoch)
                    break

    # Final eval with best/last weights (learning/train.py:154-176).
    if cfg.train.use_early_stopping and os.path.exists(ckpt_path):
        payload = ckpt.load_checkpoint(ckpt_path)
        ts = TrainState(
            jax.tree_util.tree_map(jnp.asarray, payload["params"]),
            jax.tree_util.tree_map(jnp.asarray, payload["model_state"]),
            ts.opt_state, ts.step,
        )
        logger.info(
            "Loaded best model of epoch %d for final inference",
            payload["metadata"].get("best_metric_epoch", -1),
        )
    else:
        ckpt.save_checkpoint(
            ckpt_path, ts.params, ts.model_state, ts.opt_state,
            metadata={"fold_id": fold_id, "epoch": current_epoch},
        )

    with sink.context(f"fold_{fold_id}_val"):
        test_losses, cloud_info_list = evaluate(
            PointNet2Params(ts.params, ts.model_state),
            dataset, val_ids, cfg, kde, eval_step, stats_path, sink,
            fold_id=fold_id, epoch=current_epoch, last_epoch=True,
        )
        test_losses["epoch"] = current_epoch
        test_losses["step"] = int(jax.device_get(ts.step))
        all_test_losses.append(dict(test_losses))
        print_epoch_losses(current_epoch, test_losses, train=False)

    return ts, all_train_losses, all_test_losses, cloud_info_list
