#!/usr/bin/env python
"""Tiled-inference throughput at 2048^2 (VERDICT r2 item 3's bench row).

Unlike the chained-scan benches, tiling is inherently host-interactive
(dispatch all tiles, stitch on the host), so the honest number INCLUDES the
per-dispatch tunnel overhead: wall-clock over full predict_array calls with
the result materialized, median of ``reps``.  The dense 1024^2 forward is
measured the same way for scale (its chained-scan number in BENCHMARKS.md
is the production figure; here it shares the interactive methodology).
"""
import sys
import time
from pathlib import Path

import numpy as np

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax.numpy as jnp

from unet_medical_image_contour_segmentation_tpu.engine.predict import Predictor
from unet_medical_image_contour_segmentation_tpu.engine.train import init_train_state
from unet_medical_image_contour_segmentation_tpu.models.unet import unet_s


def main(reps: int = 5):
    model = unet_s(1, 3, compute_dtype=jnp.bfloat16)
    state = init_train_state(model, jax.random.PRNGKey(0))
    _ = float(jnp.sum(jnp.zeros(8)))  # readback warmup

    rng = np.random.default_rng(0)
    for tag, hw, tiled in (("dense 1024^2", 1024, False),
                           ("tiled 2048^2", 2048, True),
                           ("tiled 4096^2", 4096, True)):
        pred = Predictor(model, state.params, state.bn_state,
                         tile_threshold=1 if tiled else 0)
        img = rng.random((1, hw, hw), np.float32)
        out = pred.predict_array(img)  # compile + cache
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = pred.predict_array(img)
            assert out.shape == (1, hw, hw)
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        print(f"{tag}: {med * 1e3:8.1f} ms/slice = {1 / med:6.2f} slices/s "
              f"(min {min(times) * 1e3:.1f})", flush=True)


if __name__ == "__main__":
    main()
