#!/usr/bin/env python
"""Interactive tiled predict at 4096²: f32 upload vs raw-uint8 upload.

The device-grid tiled program made large-scan inference compute-efficient
(BENCHMARKS.md), leaving the interactive wall-clock upload-bound: a 4096²
float32 slice is 67 MB on a ~10 MB/s tunnel.  The uint8 transfer path
(`Predictor.predict_array` with a uint8 array / `predict.py
--fast-transfer`) uploads 16.8 MB and normalizes on device.  This probe
times the full interactive call (what a serving host sees per request);
device time is unchanged, so the delta is pure transfer.
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax
import jax.numpy as jnp

from unet_medical_image_contour_segmentation_tpu.engine.predict import Predictor
from unet_medical_image_contour_segmentation_tpu.engine.train import init_train_state
from unet_medical_image_contour_segmentation_tpu.models.unet import unet_s

HW = 4096
REPS = 5


def main():
    model = unet_s(1, 3, compute_dtype=jnp.bfloat16)
    state = init_train_state(model, jax.random.PRNGKey(0))
    _ = float(jnp.sum(jnp.zeros(8)))  # readback warmup

    pred = Predictor(model, state.params, state.bn_state)
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (1, HW, HW, 1), dtype=np.uint8)
    f32 = raw.astype(np.float32) / np.float32(255.0)

    # exactness cross-check at 1024² (fast compile) before timing
    small_raw = rng.integers(0, 256, (1, 1024, 1024, 1), dtype=np.uint8)
    small_f32 = small_raw.astype(np.float32) / np.float32(255.0)
    p_small = Predictor(model, state.params, state.bn_state, tile_threshold=1)
    a = p_small.predict_array(small_raw)
    b = p_small.predict_array(small_f32)
    agree = float((a == b).mean())
    print(f"tiled 1024^2 uint8 vs f32 argmax agreement: {agree:.6f}",
          flush=True)

    for name, img in (("f32", f32), ("uint8", raw)):
        _ = pred.predict_array(img)  # compile + first transfer
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            _ = pred.predict_array(img)
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"interactive tiled {HW}^2 [{name}]: {med * 1e3:7.0f} ms "
              f"(min {min(ts) * 1e3:.0f}, upload "
              f"{img.nbytes / 1e6:.1f} MB)", flush=True)


if __name__ == "__main__":
    main()
