"""End-to-end RAW -> contour-JSON pipeline, in-process.

Reference: ``/root/reference/seg_main.py`` drives 5 stages by spawning a
Python subprocess per stage and hands data between them through the
filesystem.  Here the stages are library calls in one process — the model
loads once, the predict stage batches every normalized PNG through the TPU in
one go, and the on-disk contract is preserved exactly (stage dirs
``1_raw_png .. 5_json_results``, geometry threaded via
``original_sizes.json``) so downstream consumers see identical artifacts.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Dict

from ..config import PipelineConfig
from .letterbox import PngDenormalizer, PngNormalizer
from .mask2polygon import MaskProcessor
from .raw2png import RawToPngConverter

__all__ = ["create_work_dirs", "run_pipeline"]

log = logging.getLogger(__name__)

STAGES = {
    "raw_png": "1_raw_png",
    "normalized_png": "2_normalized_png",
    "pred_masks": "3_pred_masks",
    "denormalized_masks": "4_denormalized_masks",
    "json_results": "5_json_results",
}


def create_work_dirs(root_dir: str) -> Dict[str, str]:
    dirs = {k: os.path.join(root_dir, v) for k, v in STAGES.items()}
    for d in dirs.values():
        Path(d).mkdir(parents=True, exist_ok=True)
    return dirs


def _check_nonempty(stage: str, directory: str):
    if not os.listdir(directory):
        raise RuntimeError(f"{stage} produced no output files, aborting pipeline")


def run_pipeline(cfg: PipelineConfig, predictor=None) -> str:
    """Run all five stages; returns the json_results directory.

    ``predictor``: an engine.predict.Predictor; when omitted one is built from
    ``cfg.model`` (a ``.pth``/``.npz`` checkpoint for UNet(1, 3)).
    """
    dirs = create_work_dirs(cfg.output_root)
    sizes_json = os.path.join(dirs["normalized_png"], "original_sizes.json")

    # stage 1: RAW -> PNG
    log.info("===== stage 1: RAW -> PNG =====")
    converted, failed = RawToPngConverter(
        input_path=cfg.input_raw,
        output_dir=dirs["raw_png"],
        width=cfg.width,
        height=cfg.height,
        window_width=cfg.window_width,
        window_length=cfg.window_length,
    ).convert()
    log.info("stage 1: %d converted, %d failed", converted, failed)
    _check_nonempty("stage 1 (raw2png)", dirs["raw_png"])

    # stage 2: letterbox normalize to 512x512
    log.info("===== stage 2: normalize PNG -> %dx%d =====", cfg.target_size, cfg.target_size)
    PngNormalizer(
        input_path=dirs["raw_png"],
        output_path=dirs["normalized_png"],
        target_size=cfg.target_size,
    ).normalize()
    _check_nonempty("stage 2 (png_normalize)", dirs["normalized_png"])

    # stage 3: contour prediction (batched on TPU)
    log.info("===== stage 3: contour prediction =====")
    if predictor is None:
        predictor = _build_predictor(cfg.model, int8=cfg.int8)
        if cfg.int8 and cfg.int8_scales and os.path.exists(cfg.int8_scales):
            predictor.load_calibration(cfg.int8_scales)
            log.info("loaded int8 calibration from %s", cfg.int8_scales)
    norm_pngs = [
        os.path.join(dirs["normalized_png"], f)
        for f in sorted(os.listdir(dirs["normalized_png"]))
        if f.endswith(".png")
    ]
    if not norm_pngs:
        raise RuntimeError("stage 3 found no normalized PNGs, aborting pipeline")
    predictor.predict_paths(norm_pngs, output_dir=dirs["pred_masks"], postprocess=True)
    _check_nonempty("stage 3 (predict)", dirs["pred_masks"])
    if (cfg.int8 and cfg.int8_scales and not os.path.exists(cfg.int8_scales)
            and getattr(predictor, "_amax", None) is not None):
        # first-batch auto-calibration just ran: persist it so reruns of the
        # subprocess-per-scan-batch workflow serve identical int8 weights
        predictor.save_calibration(cfg.int8_scales)
        log.info("saved int8 calibration to %s", cfg.int8_scales)

    # stage 4: inverse letterbox
    log.info("===== stage 4: denormalize masks =====")
    PngDenormalizer(
        input_path=dirs["pred_masks"],
        output_path=dirs["denormalized_masks"],
        original_sizes_json=sizes_json,
        target_size=cfg.target_size,
    ).denormalize()
    _check_nonempty("stage 4 (png_denormalize)", dirs["denormalized_masks"])

    # stage 5: mask -> polygon JSON + overlay
    log.info("===== stage 5: mask -> polygon =====")
    MaskProcessor(
        input_path=dirs["denormalized_masks"],
        output_path=dirs["json_results"],
        sizes_json_path=sizes_json,
    ).process()
    _check_nonempty("stage 5 (mask2polygon)", dirs["json_results"])

    log.info("===== pipeline complete: %s =====", dirs["json_results"])
    return dirs["json_results"]


def _build_predictor(model_path: str, int8: bool = False):
    import jax.numpy as jnp

    from ..engine.checkpoint import load_weights
    from ..engine.predict import Predictor
    from ..models.unet import unet

    # The reference's predict CLI hardcodes UNet(1, 3, bilinear=False) for
    # .pth weights (predict.py:104); same default here.
    params, bn_state, _ = load_weights(model_path)
    model = unet(n_channels=1, n_classes=3, bilinear=False, compute_dtype=jnp.bfloat16)
    # defaults suffice here: stage 2 letterboxes every slice to 512x512, so
    # the tiled-inference path can never trigger, and one fixed-shape jitted
    # batch forward is the whole device workload (predict.py exposes
    # --tile*/--num-devices for free-form inputs)
    return Predictor(model, params, bn_state, quantize=int8)
