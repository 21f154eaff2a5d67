#!/usr/bin/env python
"""Export a trained checkpoint as portable StableHLO (with a sanity forward).

Mirror of ``/root/reference/export_model.py``: loads UNet_S(1, 3,
bilinear=False) weights (mask_values stripped), exports with a dynamic batch
axis and dynamic H/W (multiples of 16), then sanity-checks a forward pass —
but emitting StableHLO instead of ONNX, runnable by any XLA-backed runtime.
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
                        choices=["unet", "unet_t", "unet_s", "unet_sa"])
    parser.add_argument("--classes", type=int, default=3)
    parser.add_argument("--bilinear", action="store_true", default=False)
    parser.add_argument("--output", "-o", default=None,
                        help="Output path (default: <model>.stablehlo)")
    parser.add_argument("--static", action="store_true", default=False,
                        help="Export with fully static 1x512x512 shapes")
    args = parser.parse_args()

    import os

    import jax

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

    data = export_stablehlo(
        model, params, bn_state,
        dynamic_batch=not args.static,
        dynamic_hw=not args.static,
    )
    out = args.output or os.path.splitext(args.model)[0] + ".stablehlo"
    with open(out, "wb") as f:
        f.write(data)
    logging.info("Exported %d bytes of StableHLO to %s", len(data), out)

    if sanity_check(data, model, params, bn_state, hw=(128, 128)):
        logging.info("Sanity forward passed.")
        return 0
    logging.error("Sanity forward FAILED.")
    return 1


if __name__ == "__main__":
    sys.exit(main())
