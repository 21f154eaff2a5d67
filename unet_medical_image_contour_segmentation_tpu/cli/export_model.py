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
    parser.add_argument("--int8", action="store_true", default=False,
                        help="Export the int8-quantized program instead "
                             "(weights + requant scales baked in; loads "
                             "with the same StableHLO predictor). Static "
                             "H/W (--int8-hw), dynamic batch. Needs "
                             "--int8-scales or --calib.")
    parser.add_argument("--int8-scales", default=None, metavar="JSON",
                        help="Activation-scale calibration JSON (saved by "
                             "predict.py --int8-scales / "
                             "Predictor.save_calibration)")
    parser.add_argument("--calib", default=None, metavar="PATH",
                        help="Image file/directory to calibrate the int8 "
                             "activation scales from (alternative to "
                             "--int8-scales)")
    parser.add_argument("--int8-hw", type=int, nargs=2, default=(512, 512),
                        metavar=("H", "W"),
                        help="Static spatial shape baked into the int8 "
                             "program (one artifact per serving size)")
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

    if args.int8:
        import json

        import numpy as np

        from unet_medical_image_contour_segmentation_tpu.engine.export import (
            export_stablehlo_int8,
        )
        from unet_medical_image_contour_segmentation_tpu.models.quantize import (
            apply_wide_int8, build_qparams, build_qparams_pp,
            build_qparams_yolo, calibrate_amax, fold_for_quantize,
        )

        if args.format != "stablehlo":
            logging.error("--int8 exports StableHLO only (no int8 ONNX path)")
            return 1
        folded = fold_for_quantize(model, params, bn_state)
        if args.int8_scales and os.path.exists(args.int8_scales):
            with open(args.int8_scales) as f:
                amax = json.load(f)
            logging.info("Loaded int8 calibration from %s", args.int8_scales)
        elif args.calib:
            from PIL import Image

            from unet_medical_image_contour_segmentation_tpu.data.dataset import (
                BasicDataset,
            )
            from unet_medical_image_contour_segmentation_tpu.engine.predict import (
                collect_image_files,
            )

            files = (collect_image_files(args.calib)
                     if os.path.isdir(args.calib) else [args.calib])[:4]
            if not files:
                logging.error("No calibration images under %s", args.calib)
                return 1
            div = getattr(model, "hw_divisor", 16)
            imgs = []
            for fp in files:
                a = BasicDataset.preprocess(
                    None, Image.open(fp).convert("L"), scale=1, is_mask=False)
                h, w = a.shape[0] // div * div, a.shape[1] // div * div
                imgs.append(a[:h, :w])
            hw_min = (min(a.shape[0] for a in imgs),
                      min(a.shape[1] for a in imgs))
            batch = np.stack([a[:hw_min[0], :hw_min[1]] for a in imgs])
            amax = calibrate_amax(model, folded, jax.numpy.asarray(batch))
            if args.int8_scales:  # save for reuse, as predict.py does
                with open(args.int8_scales, "w") as f:
                    json.dump(amax, f, indent=1, sort_keys=True)
        else:
            logging.error("--int8 needs --int8-scales JSON or --calib images")
            return 1
        builder = (build_qparams_pp if "x0_0" in folded
                   else build_qparams_yolo if "stem" in folded
                   else build_qparams)
        qparams = builder(model, folded, amax)
        data = export_stablehlo_int8(model, qparams,
                                     example_hw=tuple(args.int8_hw))
        out = args.output or base + ".int8.stablehlo"
        with open(out, "wb") as f:
            f.write(data)
        logging.info("Exported %d bytes of int8 StableHLO (static %dx%d, "
                     "dynamic batch) to %s", len(data), *args.int8_hw, out)
        # sanity: the deserialized program must match the live int8 forward
        from unet_medical_image_contour_segmentation_tpu.engine.export import (
            load_exported,
        )

        x = np.random.default_rng(0).random(
            (1, *args.int8_hw, model.n_channels), np.float32)
        got = np.asarray(load_exported(data).call(jax.numpy.asarray(x)))
        want, _ = apply_wide_int8(model, qparams, jax.numpy.asarray(x))
        agree = float((got.argmax(-1) == np.asarray(want).argmax(-1)).mean())
        if agree == 1.0:
            logging.info("int8 StableHLO sanity forward passed "
                         "(argmax identical to live int8).")
        else:
            logging.error("int8 sanity forward FAILED: argmax agreement %.5f",
                          agree)
            ok = False
        return 0 if ok else 1

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
