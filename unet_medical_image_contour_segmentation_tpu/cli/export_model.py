#!/usr/bin/env python
"""Export a trained checkpoint as StableHLO and/or ONNX (with sanity forwards).

Mirror of ``/root/reference/export_model.py``: loads UNet_S(1, 3,
bilinear=False) weights (mask_values stripped), exports with a dynamic batch
axis and dynamic H/W (multiples of 16), then sanity-checks a forward pass.
``--format onnx`` emits the reference's exact deployment contract (opset 11,
dynamic batch/height/width axes, NCHW); ``--format stablehlo`` (default)
emits the TPU-native artifact runnable by any XLA-backed runtime; ``both``
writes both next to each other.
"""

import argparse
import logging
import sys


def main():
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")
    parser = argparse.ArgumentParser(description="Export a checkpoint to StableHLO")
    parser.add_argument("--model", "-m", default="checkpoints/model_S_boundary_512x512.pth",
                        help="Checkpoint (.pth or .npz)")
    parser.add_argument("--arch", default="unet_s",
                        choices=["unet", "unet_t", "unet_s", "unet_sa",
                                 "unet_pp", "unet_pp_s", "yolov8_seg_s"])
    parser.add_argument("--classes", type=int, default=3)
    parser.add_argument("--bilinear", action="store_true", default=False)
    parser.add_argument("--output", "-o", default=None,
                        help="Output path (default: <model>.stablehlo)")
    parser.add_argument("--static", action="store_true", default=False,
                        help="Export with fully static 1x512x512 shapes")
    parser.add_argument("--format", default=None,
                        choices=["stablehlo", "onnx", "both"],
                        help="Artifact format (default: inferred from -o "
                             "extension, else stablehlo)")
    args = parser.parse_args()
    if args.format is None:
        args.format = "onnx" if (args.output or "").endswith(".onnx") else "stablehlo"

    import os

    import jax

    from unet_medical_image_contour_segmentation_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from unet_medical_image_contour_segmentation_tpu.engine.checkpoint import load_weights
    from unet_medical_image_contour_segmentation_tpu.engine.export import (
        export_stablehlo, sanity_check,
    )
    from unet_medical_image_contour_segmentation_tpu.models.unet import get_model

    params, bn_state, _ = load_weights(args.model, bilinear=args.bilinear,
                                       use_attention=(args.arch == "unet_sa"))
    model = get_model(args.arch, n_channels=1, n_classes=args.classes,
                      bilinear=args.bilinear)
    params = jax.tree.map(jax.numpy.asarray, params)
    bn_state = jax.tree.map(jax.numpy.asarray, bn_state)

    base = os.path.splitext(args.output or args.model)[0]
    ok = True

    if args.format in ("stablehlo", "both"):
        data = export_stablehlo(
            model, params, bn_state,
            dynamic_batch=not args.static,
            dynamic_hw=not args.static,
        )
        out = args.output if (args.output and args.format == "stablehlo") \
            else base + ".stablehlo"
        with open(out, "wb") as f:
            f.write(data)
        logging.info("Exported %d bytes of StableHLO to %s", len(data), out)
        if sanity_check(data, model, params, bn_state, hw=(128, 128)):
            logging.info("StableHLO sanity forward passed.")
        else:
            logging.error("StableHLO sanity forward FAILED.")
            ok = False

    if args.format in ("onnx", "both"):
        import numpy as np

        from unet_medical_image_contour_segmentation_tpu.engine.onnx_export import (
            export_onnx, run_with_torch,
        )

        out = args.output if (args.output and args.format == "onnx") \
            else base + ".onnx"
        data = export_onnx(model, params, bn_state, out)
        logging.info("Exported %d bytes of ONNX (opset 11, dynamic axes) to %s",
                     len(data), out)
        # sanity: execute the serialized graph (torch-backed interpreter)
        # against the live JAX forward
        x = np.random.default_rng(0).random((1, 1, 128, 128), np.float32)
        got = run_with_torch(data, x)
        # the torch executor is true f32; TPUs route f32 matmuls through the
        # bf16 MXU by default, so force full precision for a like-for-like
        # reference forward (otherwise class-tie pixels flip on bf16 noise)
        with jax.default_matmul_precision("highest"):
            want, _ = model.apply(params, bn_state,
                                  jax.numpy.asarray(x.transpose(0, 2, 3, 1)),
                                  train=False)
        want = np.asarray(want).transpose(0, 3, 1, 2)
        from unet_medical_image_contour_segmentation_tpu.engine.export import (
            logits_close,
        )

        if logits_close(got, want, "ONNX sanity forward", class_axis=1):
            logging.info("ONNX sanity forward passed.")
        else:
            ok = False

    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
