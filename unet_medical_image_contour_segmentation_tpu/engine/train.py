"""Training engine: one jitted step + the reference's full training loop.

Reference: ``/root/reference/train.py:29-220``.  The torch eager loop
(autocast + GradScaler + per-step .item() syncs) becomes a single compiled
XLA program per step: forward (bf16 MXU compute), compound loss, backward,
global-norm clip, torch-parity RMSprop — all fused by XLA, no loss scaling
needed on TPU.  Loop behavior preserved:

* NaN-loss hard abort (train.py:149-151) — checked with one step of delay so
  the guard never stalls the device pipeline;
* validation once per epoch (division_step == steps/epoch, train.py:175-177)
  followed by the scheduler-quirk LR update (``scheduler.step(val_score)``,
  train.py:187);
* checkpoints every 5th epoch past the halfway point, carrying
  ``mask_values`` (train.py:208-216), plus the final save (train.py:220);
* OOM fallback -> rematerialized blocks (the reference's use_checkpointing
  retry, train.py:294-309) via ``remat=True``.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig
from ..losses.compound import LossConfig, compute_loss
from .checkpoint import save_checkpoint
from .evaluate import evaluate, make_eval_step
from .optim import RMSpropConfig, clip_by_global_norm, init_rmsprop, rmsprop_update, warm_restarts_lr

log = logging.getLogger(__name__)

__all__ = ["TrainState", "make_train_step", "train_model", "init_train_state"]


class TrainState(NamedTuple):
    params: dict
    bn_state: dict
    opt_state: dict
    step: jnp.ndarray


def init_train_state(model, key, opt_cfg: Optional[RMSpropConfig] = None) -> TrainState:
    params, bn_state = model.init(key)
    return TrainState(
        params=params,
        bn_state=bn_state,
        opt_state=init_rmsprop(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    model,
    loss_cfg: LossConfig,
    opt_cfg: RMSpropConfig,
    clipping: float = 1.0,
    axis_name: Optional[str] = None,
):
    """Pure (state, batch, lr) -> (state', metrics).  jit/shard_map it yourself
    or use the jitted wrapper from train_model / parallel.data_parallel."""

    def _use_fused_s2d(image_shape) -> bool:
        if loss_cfg.n_classes <= 1 or loss_cfg.multiclass_boundary:
            return False
        return hasattr(model, "supports_fused") and model.supports_fused(image_shape)

    def step_fn(state: TrainState, batch, lr):
        def loss_fn(params):
            if _use_fused_s2d(batch["image"].shape):
                # class-major packed logits + fused loss: no padded NHWC tensors
                from ..losses.s2d_fused import compute_loss_s2d_multiclass
                from ..ops.wide import pack_mask

                logits_cm, new_bn, blk = model.apply_fused(
                    params, state.bn_state, batch["image"],
                    train=True, axis_name=axis_name,
                )
                loss, metrics = compute_loss_s2d_multiclass(
                    logits_cm, pack_mask(blk, batch["mask"]), loss_cfg, axis_name
                )
                return loss, (new_bn, metrics)
            logits, new_bn = model.apply(
                params, state.bn_state, batch["image"], train=True, axis_name=axis_name
            )
            loss, metrics = compute_loss(logits, batch["mask"], loss_cfg, axis_name=axis_name)
            return loss, (new_bn, metrics)

        grads, (new_bn, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        grads, gnorm = clip_by_global_norm(grads, clipping)
        new_params, new_opt = rmsprop_update(state.params, grads, state.opt_state, opt_cfg, lr)
        metrics = dict(metrics, grad_norm=gnorm, lr=jnp.asarray(lr, jnp.float32))
        return TrainState(new_params, new_bn, new_opt, state.step + 1), metrics

    return step_fn


def train_model(
    cfg: TrainConfig,
    model=None,
    train_set=None,
    val_set=None,
    state: Optional[TrainState] = None,
    mask_values=None,
):
    """Full training loop.  Returns the final TrainState.

    ``train_set``/``val_set`` follow the BasicDataset protocol; when omitted
    they are built from ``cfg.data_root`` with the reference's directory
    layout (imgs/train, masks/train, imgs/val, masks/val — train.py:22-27).
    """
    from ..data.dataset import BasicDataset
    from ..data.loader import DataLoader, prefetch_to_device
    from ..models.unet import get_model

    # validate the parallelism config before any dataset/model work
    if cfg.spatial_shards > 1:
        from ..parallel import distributed as _dist

        if _dist.is_multi_host():
            # raise the clear message here too, not the local-device count one
            raise NotImplementedError(
                "spatial_shards > 1 is single-host only; use data "
                "parallelism across hosts"
            )
        avail = cfg.num_devices or jax.local_device_count()
        if cfg.spatial_shards > avail:
            raise ValueError(
                f"spatial_shards {cfg.spatial_shards} exceeds the "
                f"{avail} available devices"
            )
    if cfg.cc_loss:
        if cfg.classes != 1:
            # the penalty exists only in the binary loss path (the reference
            # ships it commented out inside the n_classes==1 branch,
            # train.py:124-132) — don't let it silently no-op
            log.warning(
                "--cc-loss has no effect with classes=%d: the "
                "connected-component penalty is part of the binary "
                "(classes=1) loss only", cfg.classes,
            )
        else:
            from ..parallel import distributed as _dist

            if _dist.is_multi_host():
                # the sharded cc_probs map spans non-addressable devices, so
                # the host-side penalty cannot fetch it on a pod
                raise NotImplementedError(
                    "--cc-loss is single-host only (host-side penalty "
                    "needs the full probability map)"
                )

    if model is None:
        model = get_model(
            cfg.model,
            n_channels=cfg.n_channels,
            n_classes=cfg.classes,
            bilinear=cfg.bilinear,
            remat=cfg.remat,
            compute_dtype=jnp.bfloat16 if cfg.amp else None,
        )
    if train_set is None:
        root = Path(cfg.data_root)
        train_set = BasicDataset(root / "imgs/train", root / "masks/train", cfg.scale,
                                 augment=cfg.augment,
                                 cache_bytes=cfg.sample_cache_bytes)
        val_set = BasicDataset(root / "imgs/val", root / "masks/val", cfg.scale,
                               augment=cfg.augment,
                               cache_bytes=cfg.sample_cache_bytes)
    if mask_values is None:
        mask_values = list(getattr(train_set, "mask_values", [])) + list(
            getattr(val_set, "mask_values", [])
        )

    from ..parallel import distributed

    multi_host = distributed.is_multi_host()
    if multi_host:
        if cfg.spatial_shards > 1:
            # per-host batch slicing assumes a 1-D process-major data mesh;
            # a 2-D (dp, sp) grid breaks that contract (dp < process_count
            # would need cross-host image slicing the loader doesn't do)
            raise NotImplementedError(
                "spatial_shards > 1 is single-host only; use data "
                "parallelism across hosts"
            )
        # mesh over ALL processes' devices; cfg.batch_size is the GLOBAL batch
        n_dev = cfg.num_devices or jax.device_count()
        if cfg.batch_size % jax.process_count():
            raise ValueError(
                f"global batch_size {cfg.batch_size} must be divisible by "
                f"process_count {jax.process_count()}"
            )
        process_slice = distributed.local_batch_slice(cfg.batch_size)
    else:
        # spatial sharding needs a real multi-device mesh even when the user
        # didn't pass num_devices — default to every local device then
        n_dev = cfg.num_devices or (
            jax.local_device_count() if cfg.spatial_shards > 1 else 1
        )
        if cfg.spatial_shards > n_dev:
            raise ValueError(
                f"spatial_shards {cfg.spatial_shards} exceeds the "
                f"{n_dev} available devices"
            )
        process_slice = None
    train_loader = DataLoader(
        train_set, cfg.batch_size, shuffle=True, num_workers=cfg.num_workers,
        seed=cfg.seed,
        # shard_map needs every batch full when data-parallel
        drop_last=(n_dev > 1),
        process_slice=process_slice,
    )
    # validation stays host-local: every host evaluates the full val set with
    # its local parameter replica, so all hosts agree on the scheduler input
    # without an extra collective
    val_loader = DataLoader(
        val_set, cfg.batch_size, shuffle=False, drop_last=True, num_workers=cfg.num_workers
    )
    n_train = len(train_set)

    log.info(
        "Starting training: epochs=%d batch=%d lr=%g scale=%g amp(bf16)=%s model=%s",
        cfg.epochs, cfg.batch_size, cfg.learning_rate, cfg.scale, cfg.amp, model.name,
    )

    loss_cfg = LossConfig(
        n_classes=model.n_classes,
        boundary_weight=cfg.boundary_weight,
        boundary_edge_width=cfg.boundary_edge_width,
        boundary_edge_weight=cfg.boundary_edge_weight,
        connected_component=cfg.cc_loss,
        cc_emit_probs=True,  # host-side penalty (axon PJRT has no callbacks)
    )
    opt_cfg = RMSpropConfig(
        learning_rate=cfg.learning_rate,
        weight_decay=cfg.weight_decay,
        momentum=cfg.momentum,
    )

    if state is None:
        state = init_train_state(model, jax.random.PRNGKey(cfg.seed), opt_cfg)

    batch_sharding_ = None
    eval_batch_pad = 1  # batch-dim shard count of batch_sharding_
    if n_dev > 1 and cfg.spatial_shards > 1:
        # 2-D (data, spatial) GSPMD mesh: batch over dp, image rows over sp
        # with XLA-inserted conv halo exchanges — for scans whose activation
        # footprint exceeds one chip.  Numerically the global-batch step
        # (parallel/spatial.py:make_spatial_train_step).
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import make_dp_spatial_mesh, make_spatial_train_step
        from ..parallel.spatial import DATA_AXIS, SPATIAL_AXIS

        sp = cfg.spatial_shards
        if n_dev % sp:
            raise ValueError(
                f"num_devices {n_dev} must be divisible by "
                f"spatial_shards {sp}"
            )
        dp = n_dev // sp
        if dp > 1 and cfg.batch_size % dp:
            raise ValueError(
                f"batch_size {cfg.batch_size} must be divisible by the "
                f"data-parallel degree {dp} (= num_devices/spatial_shards)"
            )
        mesh = make_dp_spatial_mesh(dp, sp)
        step_fn = make_spatial_train_step(
            model, loss_cfg, opt_cfg, mesh, cfg.gradient_clipping
        )
        batch_sharding_ = NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))
        eval_batch_pad = dp
    elif n_dev > 1:
        # data-parallel: batch sharded over a 1-D mesh, cross-replica BN,
        # global-batch loss reductions (numerically == single device)
        from ..parallel import (
            batch_sharding, make_data_mesh, make_parallel_train_step, replicate,
        )

        if cfg.batch_size % n_dev:
            raise ValueError(
                f"batch_size {cfg.batch_size} must be divisible by "
                f"num_devices {n_dev}"
            )
        mesh = make_data_mesh(n_dev)
        state = replicate(state, mesh)
        step_fn = make_parallel_train_step(
            model, loss_cfg, opt_cfg, mesh, cfg.gradient_clipping
        )
        batch_sharding_ = batch_sharding(mesh)
        eval_batch_pad = n_dev
    else:
        step_fn = jax.jit(
            make_train_step(model, loss_cfg, opt_cfg, cfg.gradient_clipping),
            donate_argnums=(0,),
        )
    eval_step = make_eval_step(model, model.n_classes)

    from ..utils.metrics import MetricLogger

    mlog = MetricLogger(cfg.metrics_path)
    lr = cfg.learning_rate  # scheduler sets base lr at construction
    global_step = 0
    # (step_idx, device metrics) queue — the NaN check/metric fetch trails the
    # dispatched steps by up to nan_check_every (default 1: the reference-like
    # per-step cadence).  Each fetch SYNCHRONIZES with remote execution, so a
    # depth-1 queue caps pipelining at one step; raising the cadence lets the
    # device run nan_check_every steps ahead and drains them in one
    # device_get.  On the tunneled dev TPU (~0.4 s/fetch) this is the
    # difference between a fetch-bound and a step-bound CLI loop; a NaN still
    # aborts within nan_check_every+1 steps.
    pending = []

    def check_nan(step_idx, fetched):
        loss_val = float(fetched["loss"])
        metrics = fetched
        if "cc_probs" in metrics:
            # value-only connected-component penalty (reference train.py:124-132,
            # commented out there): computed host-side on the delayed fetch so
            # the in-flight step is never stalled; zero gradient by design
            from ..losses.connected_component import connected_component_loss

            metrics = dict(metrics)
            cc = connected_component_loss(
                np.asarray(metrics.pop("cc_probs")),
                edge_distance=loss_cfg.cc_edge_distance,
                min_area=loss_cfg.cc_min_area,
                penalty_weight=loss_cfg.cc_penalty_weight,
            )
            metrics["cc"] = cc
            loss_val += cc
            metrics["loss"] = loss_val
        if not np.isfinite(loss_val):
            raise RuntimeError("Fatal: NaN loss detected!")
        mlog.log("train_step", step=step_idx,
                 **{k: v for k, v in metrics.items()})
        return loss_val

    def drain_pending():
        """Fetch+check every queued step in one device_get; -> (sum, last)."""
        if not pending:
            return 0.0, None
        fetched = jax.device_get([m for _, m in pending])
        total = last = 0.0
        for (step_idx, _), host_metrics in zip(pending, fetched):
            last = check_nan(step_idx, host_metrics)
            total += last
        pending.clear()
        return total, last

    from tqdm import tqdm

    for epoch in range(1, cfg.epochs + 1):
        epoch_loss = 0.0
        epoch_pred_dir = None
        # on a pod only process 0 dumps PNGs (hosts would clobber each other)
        if cfg.save_val_predictions and jax.process_index() == 0:
            epoch_pred_dir = Path(cfg.predictions_dir) / f"epoch_{epoch}"
            epoch_pred_dir.mkdir(parents=True, exist_ok=True)

        t0 = time.perf_counter()
        n_seen = 0
        # running-loss progress bar, as the reference shows (train.py:104,171);
        # disable=None auto-hides it on non-TTY stderr so logs stay clean
        pbar = tqdm(total=n_train, desc=f"Epoch {epoch}/{cfg.epochs}", unit="img",
                    disable=None if cfg.progress else True)
        for batch in prefetch_to_device(iter(train_loader), sharding=batch_sharding_):
            n_ch = 1 if batch["image"].ndim == 3 else batch["image"].shape[-1]
            if n_ch != model.n_channels:
                raise AssertionError(
                    f"Network has been defined with {model.n_channels} input channels, "
                    f"but loaded images have {n_ch} channels."
                )
            state, metrics = step_fn(state, batch, lr)
            global_step += 1
            n_seen += batch["image"].shape[0]
            pbar.update(batch["image"].shape[0])
            # drain BEFORE queueing the step just dispatched, so the fetch
            # only ever waits on already-retired steps (>= 1-step delay)
            if len(pending) >= max(1, cfg.nan_check_every):
                window_loss, last_loss = drain_pending()
                epoch_loss += window_loss
                pbar.set_postfix(**{"loss (batch)": f"{last_loss:.4f}"})
            pending.append((global_step, metrics))
            if cfg.log_every and global_step % cfg.log_every == 0:
                log.info("epoch %d step %d loss(total)=%.5f", epoch, global_step, epoch_loss)
        epoch_loss += drain_pending()[0]
        pbar.close()
        dt = time.perf_counter() - t0
        log.info(
            "epoch %d done: loss(total)=%.5f %.2f slices/s",
            epoch, epoch_loss, n_seen / max(dt, 1e-9),
        )

        # validation once per epoch (the reference's division_step cadence);
        # on a pod each host evaluates its local replica of the parameters
        if multi_host:
            val_params = distributed.local_replica(state.params)
            val_bn = distributed.local_replica(state.bn_state)
        else:
            val_params, val_bn = state.params, state.bn_state
        val_score, val_post, min_val = evaluate(
            model, val_params, val_bn, val_loader,
            epoch_pred_dir=str(epoch_pred_dir) if epoch_pred_dir else None,
            postprocess=cfg.val_postprocess,
            eval_step=eval_step,
            # shard validation over the training mesh too (single-host only:
            # local replicas evaluate locally on a pod)
            batch_sharding=None if multi_host else batch_sharding_,
            batch_pad=1 if multi_host else eval_batch_pad,
        )
        log.info("Validation Dice score: %s", val_score)
        log.info("Validation Postprocessed Dice score: %s", val_post)
        log.info("Validation Min Dice score: %s", min_val)
        mlog.log("validation", epoch=epoch, dice=val_score,
                 dice_postprocessed=val_post, min_dice=min_val, lr=lr,
                 epoch_loss=epoch_loss, slices_per_sec=n_seen / max(dt, 1e-9))

        # scheduler step — faithful quirk passes the Dice score as the epoch
        sched_t = val_score if cfg.scheduler_quirk else float(epoch)
        lr = float(warm_restarts_lr(
            sched_t, cfg.learning_rate,
            T_0=cfg.sched_t0, T_mult=cfg.sched_t_mult, eta_min=cfg.sched_eta_min,
        ))

        if (
            cfg.save_checkpoint
            and epoch > cfg.epochs * cfg.checkpoint_after_frac
            and jax.process_index() == 0
        ):
            if epoch % cfg.checkpoint_every == 0:
                from .checkpoint import save_checkpoint_async

                Path(cfg.dir_checkpoint).mkdir(parents=True, exist_ok=True)
                path = str(Path(cfg.dir_checkpoint) / f"checkpoint_epoch{epoch}.npz")
                # mid-training saves never stall the loop on disk IO
                save_checkpoint_async(
                    path, distributed.local_replica(state.params),
                    distributed.local_replica(state.bn_state),
                    distributed.local_replica(state.opt_state),
                    step=int(state.step), mask_values=mask_values,
                )
                log.info("Checkpoint %d saved!", epoch)

    if jax.process_index() == 0:
        save_checkpoint(
            f"model_epoch{cfg.epochs}.npz", distributed.local_replica(state.params),
            distributed.local_replica(state.bn_state),
            distributed.local_replica(state.opt_state),
            step=int(state.step), mask_values=mask_values,
        )
    mlog.close()
    return state
