#!/usr/bin/env python
"""Train a UNet-family model for contour segmentation (TPU-native).

CLI mirror of ``/root/reference/train.py:223-309``: same defaults
(epochs=5, batch=1, lr=1e-5, scale=0.5, classes=3, bilinear off), ``--load``
accepts reference .pth checkpoints (mask_values stripped), and the OOM
fallback re-runs with rematerialized blocks — but the model variant is a
``--model`` flag rather than comment-toggled code.
"""

import argparse
import logging
import sys


def get_args():
    parser = argparse.ArgumentParser(description="Train the UNet on images and target masks")
    parser.add_argument("--epochs", "-e", metavar="E", type=int, default=5)
    parser.add_argument("--batch-size", "-b", dest="batch_size", metavar="B", type=int, default=1)
    parser.add_argument("--learning-rate", "-l", metavar="LR", type=float, default=1e-5, dest="lr")
    parser.add_argument("--load", "-f", type=str, default=False, help="Load model from a .pth/.npz file")
    parser.add_argument("--scale", "-s", type=float, default=0.5, help="Downscaling factor of the images")
    parser.add_argument("--validation", "-v", dest="val", type=float, default=10.0,
                        help="Accepted for reference CLI compatibility and ignored "
                             "(like the reference's train.py:232): the split is "
                             "directory-based (imgs/train vs imgs/val)")
    parser.add_argument("--amp", action="store_true", default=True, help="Use bf16 mixed precision")
    parser.add_argument("--no-amp", dest="amp", action="store_false",
                        help="Full f32 compute (the reference's --amp cannot be disabled; ours can)")
    parser.add_argument("--no-save-val-predictions", dest="save_val_predictions",
                        action="store_false", default=True,
                        help="Skip the per-epoch prediction PNG dumps")
    parser.add_argument("--no-val-postprocess", dest="val_postprocess",
                        action="store_false", default=True,
                        help="Skip the cv2 post-processed Dice during validation")
    parser.add_argument("--bilinear", action="store_true", default=False, help="Use bilinear upsampling")
    parser.add_argument("--classes", "-c", type=int, default=3, help="Number of classes")
    parser.add_argument("--model", "-m", default="unet_s",
                        choices=["unet", "unet_t", "unet_s", "unet_sa",
                                 "unet_pp", "unet_pp_s", "yolov8_seg_s"],
                        help="Model variant (reference default: unet_s)")
    parser.add_argument("--data-root", default="data/data-without-black-shadow")
    parser.add_argument("--num-devices", type=int, default=None,
                        help="Data-parallel device count (default: single device)")
    parser.add_argument("--spatial-shards", type=int, default=1,
                        help="Shard image rows over this many devices (2-D "
                             "data x spatial GSPMD mesh) for very large scans")
    parser.add_argument("--remat", action="store_true", default=False,
                        help="Rematerialize blocks (activation checkpointing)")
    parser.add_argument("--sample-cache-gb", type=float, default=2.0,
                        help="RAM budget for caching decoded+preprocessed "
                             "samples (epochs >= 2 skip PNG decode, exact "
                             "same pixels; 0 disables)")
    parser.add_argument("--disk-cache-dir", default=None,
                        help="Persistent decoded-sample cache directory "
                             "(.npz per id/rotation/scale, mtime-validated; "
                             "exact same pixels) — unlike the RAM cache it "
                             "also speeds epoch 1 and cross-run starts")
    parser.add_argument("--nan-check-every", type=int, default=1,
                        help="Steps between NaN-guard/metric fetches; >1 lets "
                             "the device run ahead and amortizes host round "
                             "trips (a NaN still aborts within K+1 steps)")
    parser.add_argument("--no-scheduler-quirk", dest="scheduler_quirk", action="store_false",
                        default=True, help="Step the LR schedule by epoch instead of by Dice")
    parser.add_argument("--cc-loss", action="store_true", default=False,
                        help="Add the connected-component penalty to the binary "
                             "loss (the reference ships this commented out, "
                             "train.py:124-132; non-differentiable host term)")
    # multi-host bootstrap (jax.distributed); on Cloud TPU pods pass
    # --distributed alone and the coordinator is auto-discovered
    parser.add_argument("--distributed", action="store_true", default=False,
                        help="Initialize jax.distributed (multi-host training)")
    parser.add_argument("--coordinator-address", default=None,
                        help="host:port of process 0 (non-TPU-pod fabrics)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    return parser.parse_args()


def main():
    args = get_args()
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")

    if args.distributed or args.coordinator_address:
        # must run before the first jax.devices() call on every host
        from unet_medical_image_contour_segmentation_tpu.parallel import distributed

        distributed.initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    import jax

    from unet_medical_image_contour_segmentation_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from unet_medical_image_contour_segmentation_tpu.config import TrainConfig
    from unet_medical_image_contour_segmentation_tpu.engine.checkpoint import load_weights
    from unet_medical_image_contour_segmentation_tpu.engine.train import train_model

    logging.info(
        "Using %d devices across %d process(es): %s",
        jax.device_count(), jax.process_count(), jax.local_devices(),
    )

    cfg = TrainConfig(
        model=args.model,
        classes=args.classes,
        bilinear=args.bilinear,
        remat=args.remat,
        data_root=args.data_root,
        scale=args.scale,
        epochs=args.epochs,
        batch_size=args.batch_size,
        learning_rate=args.lr,
        amp=args.amp,
        scheduler_quirk=args.scheduler_quirk,
        cc_loss=args.cc_loss,
        num_devices=args.num_devices,
        spatial_shards=args.spatial_shards,
        load=args.load or None,
        save_val_predictions=args.save_val_predictions,
        val_postprocess=args.val_postprocess,
        nan_check_every=args.nan_check_every,
        sample_cache_bytes=int(args.sample_cache_gb * 1e9),
        disk_cache_dir=args.disk_cache_dir,
    )

    state = None
    if cfg.load == "latest":
        from unet_medical_image_contour_segmentation_tpu.engine.checkpoint import (
            latest_checkpoint,
        )

        cfg.load = latest_checkpoint(cfg.dir_checkpoint)
        if cfg.load is None:
            logging.info("No checkpoint found in %s; starting fresh", cfg.dir_checkpoint)
    if cfg.load:
        from unet_medical_image_contour_segmentation_tpu.engine.checkpoint import (
            load_checkpoint,
        )
        from unet_medical_image_contour_segmentation_tpu.engine.optim import init_rmsprop
        from unet_medical_image_contour_segmentation_tpu.engine.train import TrainState
        import jax.numpy as jnp

        if str(cfg.load).endswith(".npz"):
            # full resume: params + BN stats + optimizer state + step
            ck = load_checkpoint(cfg.load)
            params = jax.tree.map(jnp.asarray, ck["params"])
            opt_state = (
                jax.tree.map(jnp.asarray, ck["opt_state"])
                if ck["opt_state"] is not None else init_rmsprop(params)
            )
            state = TrainState(params, jax.tree.map(jnp.asarray, ck["bn_state"]),
                               opt_state, jnp.asarray(ck["step"], jnp.int32))
        else:
            # reference-compat .pth: weights + BN stats only (train.py:275-280)
            params, bn_state, _ = load_weights(cfg.load, bilinear=cfg.bilinear)
            params = jax.tree.map(jnp.asarray, params)
            state = TrainState(params, jax.tree.map(jnp.asarray, bn_state),
                               init_rmsprop(params), jnp.zeros((), jnp.int32))
        logging.info("Model loaded from %s", cfg.load)

    try:
        train_model(cfg, state=state)
    except (RuntimeError, jax.errors.JaxRuntimeError) as e:
        if "RESOURCE_EXHAUSTED" not in str(e) and "Out of memory" not in str(e):
            raise
        logging.error(
            "Detected OutOfMemoryError! Enabling rematerialization to reduce "
            "memory usage, but this slows down training."
        )
        cfg.remat = True
        train_model(cfg, state=state)


if __name__ == "__main__":
    sys.exit(main())
