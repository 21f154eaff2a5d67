#!/usr/bin/env python
"""Predict multiclass contour masks for a file or directory (TPU-native).

CLI mirror of ``/root/reference/predict.py:32-150``: ``.pth`` checkpoints load
into UNet(1, 3, bilinear=False) with mask_values stripped, input may be a file
or a recursively-walked directory, post-processing defaults on, masks are
saved with the {0,128,255} value map, ``-o`` omitted overwrites next to the
input.  Unlike the reference, all images are batched through one jitted
program grouped by size.
"""

import argparse
import logging
import sys


def get_args():
    parser = argparse.ArgumentParser(description="Predict multiclass masks (.pth/.npz checkpoints)")
    parser.add_argument("--model", "-m", required=True,
                        help="Checkpoint path (.pth/.pt state_dict, pickled module or "
                             "TorchScript; .npz; .stablehlo)")
    parser.add_argument("--input", "-i", required=True, help="Input image file or directory")
    parser.add_argument("--output", "-o", help="Output directory (default: overwrite next to input)")
    parser.add_argument("--viz", "-v", action="store_true", default=False, help="Visualize results")
    parser.add_argument("--no-save", "-n", action="store_true", default=False)
    parser.add_argument("--postprocess", "-p", action="store_true", default=True)
    parser.add_argument("--no-postprocess", dest="postprocess", action="store_false",
                        help="Skip cv2 mask cleanup (the reference's -p cannot be disabled; ours can)")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--tile", type=int, default=None,
                        help="Tile size for huge scans (overlapping-window "
                             "inference; the reference would resize or OOM). "
                             "Default: auto — 512, or 1024 on grids of >= 8 "
                             "tiles (measured optimal on v5e, r5 sweep)")
    parser.add_argument("--tile-halo", type=int, default=96,
                        help="Tile overlap margin; >= the receptive-field "
                             "radius keeps tiling exact (96 covers UNet_S)")
    parser.add_argument("--tile-threshold", type=int, default=None,
                        help="Pixel count above which tiling kicks in "
                             "(default 1536^2; 0 disables)")
    parser.add_argument("--arch", default="unet",
                        choices=["unet", "unet_t", "unet_s", "unet_sa",
                                 "unet_pp", "unet_pp_s", "yolov8_seg_s"],
                        help="Architecture for weight files (reference predict.py hardcodes unet)")
    parser.add_argument("--classes", type=int, default=3)
    parser.add_argument("--bilinear", action="store_true", default=False)
    parser.add_argument("--num-devices", type=int, default=None,
                        help="Serve data-parallel over this many devices "
                             "(batch sharded, params replicated)")
    parser.add_argument("--int8", action="store_true", default=False,
                        help="int8 serving: per-channel weight quantization "
                             "+ first-batch activation calibration "
                             "(UNet family; near-exact — see PARITY.md)")
    parser.add_argument("--fast-transfer", action="store_true", default=False,
                        help="Upload raw uint8 pixels and normalize on "
                             "device (4x less host->device traffic; argmax "
                             "parity with host preprocessing)")
    parser.add_argument("--int8-scales", default=None, metavar="JSON",
                        help="With --int8: load the activation-scale "
                             "calibration from this JSON if it exists, else "
                             "calibrate on the first batch and save it there "
                             "(restart-stable quantized serving)")
    return parser.parse_args()


def main():
    args = get_args()
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")

    import os

    import jax
    import jax.numpy as jnp

    from unet_medical_image_contour_segmentation_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from unet_medical_image_contour_segmentation_tpu.engine.checkpoint import load_weights
    from unet_medical_image_contour_segmentation_tpu.engine.predict import (
        Predictor, collect_image_files,
    )
    from unet_medical_image_contour_segmentation_tpu.models.unet import get_model

    if os.path.isdir(args.input):
        in_files = collect_image_files(args.input)
        logging.info("Found %d image files in directory", len(in_files))
        if not in_files:
            logging.error("No image files found in %s", args.input)
            return 1
    else:
        if not os.path.isfile(args.input):
            logging.error("Input file does not exist: %s", args.input)
            return 1
        in_files = [args.input]

    logging.info("Using devices: %s", jax.devices())
    try:
        if args.model.endswith(".stablehlo"):
            # compiled-artifact path (the reference's TorchScript .pt analogue)
            from unet_medical_image_contour_segmentation_tpu.engine.predict import (
                StableHLOPredictor,
            )

            if args.num_devices and args.num_devices > 1:
                logging.warning(
                    "--num-devices is ignored for .stablehlo models: the "
                    "exported module has a fixed single-device program; "
                    "export per-device or use live weights for DP serving")
            if args.int8:
                logging.warning(
                    "--int8 is ignored for .stablehlo models (the exported "
                    "program's precision is baked in at export time). For a "
                    "quantized artifact, export with `umics-export --int8` — "
                    "it loads here with no flags and serves int8 directly.")
            predictor = StableHLOPredictor.from_file(
                args.model, batch_size=args.batch_size)
            # exported programs have a fixed window size: keep the class
            # default (512) unless the user asks; auto-tile is live-only
            if args.tile is not None:
                predictor.tile = args.tile
            predictor.tile_halo = args.tile_halo
            if args.tile_threshold is not None:
                predictor.tile_threshold = args.tile_threshold
        else:
            params, bn_state, _ = load_weights(args.model, bilinear=args.bilinear,
                                               use_attention=(args.arch == "unet_sa"))
            model = get_model(args.arch, n_channels=1, n_classes=args.classes,
                              bilinear=args.bilinear, compute_dtype=jnp.bfloat16)
            params = jax.tree.map(jnp.asarray, params)
            bn_state = jax.tree.map(jnp.asarray, bn_state)
            predictor = Predictor(
                model, params, bn_state, batch_size=args.batch_size,
                tile=args.tile, tile_halo=args.tile_halo,
                tile_threshold=args.tile_threshold,
                num_devices=args.num_devices, quantize=args.int8)
    except Exception:
        logging.exception("Model load failed")
        return 1
    logging.info("Model loaded!")
    if args.int8 and args.int8_scales and os.path.exists(args.int8_scales):
        predictor.load_calibration(args.int8_scales)
        logging.info("Loaded int8 calibration from %s", args.int8_scales)
    results = predictor.predict_paths(
        in_files,
        output_dir=args.output,
        postprocess=args.postprocess,
        save=not args.no_save,
        fast_transfer=args.fast_transfer,
    )
    logging.info("Predicted %d/%d images", len(results), len(in_files))
    if (args.int8 and args.int8_scales
            and not os.path.exists(args.int8_scales)
            and getattr(predictor, "_amax", None) is not None):
        predictor.save_calibration(args.int8_scales)
        logging.info("Saved int8 calibration to %s", args.int8_scales)

    if args.viz:
        from PIL import Image

        from unet_medical_image_contour_segmentation_tpu.utils.viz import plot_img_and_mask

        for path, mask in results.items():
            plot_img_and_mask(Image.open(path).convert("L"), mask)
    return 0


if __name__ == "__main__":
    sys.exit(main())
