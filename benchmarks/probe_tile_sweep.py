#!/usr/bin/env python
"""Tile-size sweep for the device-grid tiled predict path (r5, VERDICT #2).

The r4 default (tile=512, halo=96) pays 64 × 704² windows at 4096² — 1.89x
dense MACs.  Bigger tiles cut the halo share (1024 → 1.41x, 2048 → 1.20x);
since the grid program runs at full dense-per-pixel efficiency, throughput
should scale nearly proportionally.  This probe measures tile ∈ {512, 1024,
2048} × {bf16, int8} cores at 4096² (and 2048²) with the chained-grid
methodology, all in ONE process, and cross-checks that predictions are
bit-identical across tile sizes (halo 96 covers the receptive field, so the
stitched map must not depend on the tiling).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_tile_sweep.py
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

STEPS = 16
REPS = 3
HALO = 96


def build_chain(pred: Predictor, hw: int):
    grid = pred._build_tile_grid_step(1, 1, hw, hw, pred.tile, pred.tile_halo,
                                      min(pred.tile_batch,
                                          (hw // pred.tile) ** 2),
                                      rank3=True)
    params, bn = pred.params, pred.bn_state

    @jax.jit
    def chain(x):
        def body(carry, _):
            out = grid(params, bn, carry)
            return carry + 1e-12 * jnp.sum(out).astype(carry.dtype), ()
        y, _ = jax.lax.scan(body, x, None, length=STEPS)
        return jnp.sum(y[0, 0])

    return chain


def main():
    model = unet_s(1, 3, compute_dtype=jnp.bfloat16)
    state = init_train_state(model, jax.random.PRNGKey(0))
    _ = float(jnp.sum(jnp.zeros(8)))  # readback warmup

    rng = np.random.default_rng(0)
    calib = rng.random((2, 512, 512), np.float32)

    def make(tile, quant):
        p = Predictor(model, state.params, state.bn_state, tile=tile,
                      tile_halo=HALO, tile_threshold=1, quantize=quant)
        if quant:
            p.calibrate(calib)
        return p

    # exactness: the stitched map must be tile-size independent (2048² is
    # cheap to compile at every size and exercises grids 4x4 / 2x2 / 1x1)
    small = np.asarray(rng.random((1, 2048, 2048), np.float32))
    outs = {t: make(t, False).predict_array(small) for t in (512, 1024, 2048)}
    np.testing.assert_array_equal(outs[512], outs[1024])
    np.testing.assert_array_equal(outs[512], outs[2048])
    print("2048² stitched maps identical across tile ∈ {512,1024,2048}",
          flush=True)

    for hw, tiles in ((4096, (512, 1024, 2048)), (2048, (512, 1024))):
        img = jnp.asarray(rng.random((1, hw, hw), np.float32))
        variants = {}
        for t in tiles:
            for q in (False, True):
                variants[f"t{t}-{'int8' if q else 'bf16'}"] = \
                    build_chain(make(t, q), hw)
        for name, chain in variants.items():
            _ = float(chain(img))  # compile + run
        times = {k: [] for k in variants}
        for _ in range(REPS):
            for name, chain in variants.items():
                t0 = time.perf_counter()
                _ = float(chain(img))
                times[name].append((time.perf_counter() - t0) / STEPS)
        for name, ts in times.items():
            med = sorted(ts)[len(ts) // 2]
            print(f"tiled {hw}² [{name:10s}] chained: {med * 1e3:8.1f} "
                  f"ms/slice = {1 / med:6.2f} slices/s "
                  f"(min {min(ts) * 1e3:.1f})", flush=True)


if __name__ == "__main__":
    main()
