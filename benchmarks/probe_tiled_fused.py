#!/usr/bin/env python
"""Tile-core variants at 4096²: plain argmax vs fused class-major, bf16 vs int8.

The dense predict path argmaxes in the packed class-major lane layout and
unpacks ONE int map (``losses/s2d_fused.argmax_class_major`` +
``ops/wide.unpack_pred``) — the tile core (engine/predict.py:
``_tile_core_forward``) still unpacked full logits and argmaxed in pixel
space.  This probe measures all four combinations with the chained
device-grid methodology (CLAUDE.md: >=64-step chains, one final fetch,
interleaved within one process) to decide whether the fused core ships.

int8 rows reuse the production quantize path (``Predictor.calibrate``), so
they also serve as the tiled-int8 throughput measurement for BENCHMARKS.md.
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

HW = 4096
STEPS = 24  # one grid pass = 64 tile-group forwards: already a long chain
REPS = 3


class PlainCorePredictor(Predictor):
    """r3 tile core: unpack full logits, argmax in pixel space (the control)."""

    def _tile_core_forward(self, win, core, halo):
        model, folded = self.model, self.folded_params

        def fwd(params, bn_state, tile_img):
            if folded is not None:
                logits, _ = model.apply(folded, None, tile_img, train=False)
            else:
                logits, _ = model.apply(params, bn_state, tile_img, train=False)
            pred = jnp.argmax(logits.astype(jnp.float32), axis=-1)
            return pred[:, halo: halo + core, halo: halo + core].astype(jnp.int32)

        return fwd


def build_chain(pred: Predictor, hw: int):
    grid = pred._build_tile_grid_step(1, 1, hw, hw, pred.tile, pred.tile_halo,
                                      pred.tile_batch, rank3=True)
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
    img = jnp.asarray(rng.random((1, HW, HW), np.float32))
    calib = rng.random((2, 512, 512), np.float32)

    def make(cls, quant):
        p = cls(model, state.params, state.bn_state, tile_threshold=1,
                quantize=quant)
        if quant:
            p.calibrate(calib)
        return p

    preds = {"bf16-plain": make(PlainCorePredictor, False),
             "bf16-fused": make(Predictor, False),
             "int8-fused": make(Predictor, True)}
    variants = {k: build_chain(p, HW) for k, p in preds.items()}

    # exactness cross-check at a small size first (fast compile):
    small = np.asarray(rng.random((1, 1024, 1024), np.float32))
    outs = {k: make(type(p), k.startswith("int8")).predict_array(small)
            for k, p in preds.items()}
    np.testing.assert_array_equal(outs["bf16-plain"], outs["bf16-fused"])
    agree = float((outs["bf16-fused"] == outs["int8-fused"]).mean())
    print(f"tiled 1024^2: fused==plain exact; int8 agreement {agree:.5f}",
          flush=True)

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
        print(f"tiled {HW}^2 [{name}] chained: {med * 1e3:8.1f} ms/slice = "
              f"{1 / med:6.2f} slices/s (min {min(ts) * 1e3:.1f})", flush=True)


if __name__ == "__main__":
    main()
