#!/usr/bin/env python
"""End-to-end RAW image contour-extraction pipeline CLI.

Mirror of ``/root/reference/seg_main.py:144-205`` (same flags, same stage
directories, same ``seg_process.log``), but the stages run in-process via
``pipeline.seg_main.run_pipeline`` — one model load, batched TPU prediction —
instead of a subprocess per stage.
"""

import argparse
import logging
import sys


def setup_logging():
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(levelname)s - %(message)s",
        handlers=[logging.FileHandler("seg_process.log"), logging.StreamHandler()],
    )


def main():
    setup_logging()
    parser = argparse.ArgumentParser(description="End-to-end RAW image contour extraction")
    parser.add_argument("--input-raw", help="Input RAW file or directory")
    parser.add_argument("--output-root", "-o", default="seg_results")
    parser.add_argument("--width", type=int, required=True, help="RAW image width")
    parser.add_argument("--height", type=int, required=True, help="RAW image height")
    parser.add_argument("--window-width", "-ww", type=int, required=True)
    parser.add_argument("--window-length", "-wl", type=int, required=True)
    parser.add_argument("--model", "-m", required=True, help="Prediction checkpoint (.pth/.npz)")
    parser.add_argument("--target-size", type=int, default=512)
    parser.add_argument("--int8", action="store_true",
                        help="Serve stage 3 with the int8-quantized forward "
                             "(PTQ, first-batch calibration; argmax parity)")
    parser.add_argument("--int8-scales", default=None, metavar="JSON",
                        help="With --int8: load the activation-scale "
                             "calibration from this JSON if it exists, else "
                             "calibrate on the first batch and save it there "
                             "(stable across per-scan-batch reruns)")
    args = parser.parse_args()

    from unet_medical_image_contour_segmentation_tpu.config import PipelineConfig
    from unet_medical_image_contour_segmentation_tpu.pipeline.seg_main import run_pipeline
    from unet_medical_image_contour_segmentation_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    cfg = PipelineConfig(
        input_raw=args.input_raw,
        output_root=args.output_root,
        width=args.width,
        height=args.height,
        window_width=args.window_width,
        window_length=args.window_length,
        model=args.model,
        target_size=args.target_size,
        int8=args.int8,
        int8_scales=args.int8_scales,
    )
    try:
        result_dir = run_pipeline(cfg)
        logging.info("===== pipeline finished =====")
        logging.info("Final results: %s", result_dir)
        return 0
    except Exception as e:
        logging.error("Pipeline failed: %s", e, exc_info=True)
        return 1


if __name__ == "__main__":
    sys.exit(main())
