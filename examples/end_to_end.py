#!/usr/bin/env python
"""Reproducible end-to-end demo: synthetic data -> train -> RAW pipeline.

Reproduces the TPU validation documented in README.md on any backend:

  1. generates a synthetic 512x512 contour dataset (bright rectangles on
     noise; mask values {128: background, 255: target contour});
  2. trains UNet_T with the reference hyperparameter shape (compound loss,
     RMSprop, warm restarts) until validation Dice > 0.95;
  3. writes a 16-bit RAW scan and runs the full 5-stage seg_main pipeline
     with the trained checkpoint;
  4. checks the recovered contour bbox against the ground truth.

Run:  python examples/end_to_end.py [--workdir /tmp/umics_demo] [--epochs 40]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from PIL import Image


def make_dataset(base: Path, rng, n_per_split=4):
    for split in ("train", "val"):
        (base / "imgs" / split).mkdir(parents=True, exist_ok=True)
        (base / "masks" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n_per_split):
            img = rng.normal(60, 20, (512, 512)).clip(0, 255).astype(np.uint8)
            mask = np.full((512, 512), 128, np.uint8)
            y, x = rng.integers(50, 300, 2)
            img[y : y + 150, x : x + 150] += 60
            mask[y : y + 150, x : x + 150] = 255
            Image.fromarray(img).save(base / "imgs" / split / f"case{i}.png")
            Image.fromarray(mask).save(base / "masks" / split / f"case{i}_mask.png")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default="/tmp/umics_demo")
    parser.add_argument("--epochs", type=int, default=40)
    args = parser.parse_args()

    import os

    base = Path(args.workdir)
    base.mkdir(parents=True, exist_ok=True)
    os.chdir(base)
    rng = np.random.default_rng(0)
    make_dataset(base, rng)
    print(f"[1/4] dataset at {base}")

    from unet_medical_image_contour_segmentation_tpu.config import (
        PipelineConfig, TrainConfig,
    )
    from unet_medical_image_contour_segmentation_tpu.engine.train import train_model
    from unet_medical_image_contour_segmentation_tpu.pipeline.seg_main import run_pipeline

    cfg = TrainConfig(
        model="unet_t",
        data_root=str(base),
        scale=1.0,
        epochs=args.epochs,
        batch_size=4,
        learning_rate=5e-4,
        dir_checkpoint=str(base / "checkpoints"),
        predictions_dir=str(base / "predictions"),
        metrics_path=str(base / "metrics.jsonl"),
    )
    train_model(cfg)
    ckpt = base / f"model_epoch{args.epochs}.npz"
    print(f"[2/4] trained -> {ckpt}")

    raw_dir = base / "raws"
    raw_dir.mkdir(exist_ok=True)
    frame = rng.integers(20000, 30000, (900, 1100)).astype("<u2")
    truth = (400, 300, 800, 600)  # x0, y0, x1, y1
    frame[truth[1] : truth[3], truth[0] : truth[2]] = 60000
    (raw_dir / "scan1.raw").write_bytes(frame.tobytes())
    print("[3/4] synthetic 16-bit RAW written")

    out = run_pipeline(PipelineConfig(
        input_raw=str(raw_dir),
        output_root=str(base / "seg_results"),
        width=1100, height=900,
        window_width=30000, window_length=35000,
        model=str(ckpt),
    ))
    data = json.load(open(Path(out) / "scan1.json"))
    pts = np.array(data["shapes"][0]["points"])
    bbox = (*pts.min(0).tolist(), *pts.max(0).tolist())
    print(f"[4/4] recovered contour bbox {bbox} vs ground truth {truth}")
    err = max(abs(bbox[i] - truth[i]) for i in range(4))
    print("PASS" if err <= 8 else f"WARN: bbox off by {err}px")


if __name__ == "__main__":
    main()
