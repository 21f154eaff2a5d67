#!/usr/bin/env python
"""Tiled-inference throughput: host-stitched vs device-grid (VERDICT r3 #1).

The r2/r3 tiled path dispatched one jitted call per tile and stitched on the
host — 64 round trips at 4096² on this tunneled platform (~33 ms each).  The
r4 default runs the WHOLE grid as one jitted ``lax.scan`` with device
stitching.  Both paths are measured the honest interactive way (full
predict_array wall-clock with the result materialized, median of ``reps``),
interleaved A/B within one process per CLAUDE.md's drift rule.  The dense
1024² forward is included for scale.
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


def time_predict(pred, img, reps):
    out = pred.predict_array(img)  # compile + cache
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = pred.predict_array(img)
        times.append(time.perf_counter() - t0)
    assert out.shape == (img.shape[0], *img.shape[1:3])
    return out, times


def chained_device_grid(model, state, hw: int, n_steps: int = 16, reps: int = 3):
    """True device throughput of the one-program tile grid: chain n_steps
    grid passes through a data dependency inside one jit and fetch once
    (CLAUDE.md chained-scan methodology — excludes tunnel transfer/dispatch,
    which production hosts don't pay per slice)."""
    from jax import lax

    pred = Predictor(model, state.params, state.bn_state, tile_threshold=1)
    grid = pred._build_tile_grid_step(1, 1, hw, hw, pred.tile, pred.tile_halo,
                                      pred.tile_batch, rank3=True)
    params, bn = pred.params, pred.bn_state

    @jax.jit
    def chain(x):
        def body(carry, _):
            out = grid(params, bn, carry)
            # sum over every tile's core forces the full grid each step
            return carry + 1e-12 * jnp.sum(out).astype(carry.dtype), ()
        y, _ = lax.scan(body, x, None, length=n_steps)
        return jnp.sum(y[0, 0])

    img = jnp.asarray(np.random.default_rng(1).random((1, hw, hw), np.float32))
    _ = float(chain(img))  # compile + run
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(chain(img))
        times.append((time.perf_counter() - t0) / n_steps)
    med = sorted(times)[len(times) // 2]
    print(f"tiled {hw}^2 [device-grid CHAINED]: {med * 1e3:8.1f} ms/slice = "
          f"{1 / med:6.2f} slices/s (min {min(times) * 1e3:.1f})", flush=True)


def main(reps: int = 5):
    model = unet_s(1, 3, compute_dtype=jnp.bfloat16)
    state = init_train_state(model, jax.random.PRNGKey(0))
    _ = float(jnp.sum(jnp.zeros(8)))  # readback warmup

    rng = np.random.default_rng(0)
    for tag, hw, tiled in (("dense 1024^2", 1024, False),
                           ("tiled 2048^2", 2048, True),
                           ("tiled 4096^2", 4096, True)):
        img = rng.random((1, hw, hw), np.float32)
        variants = {}
        if tiled:
            host = Predictor(model, state.params, state.bn_state,
                             tile_threshold=1)
            host.tile_on_device = False
            dev = Predictor(model, state.params, state.bn_state,
                            tile_threshold=1)
            variants = {"host-stitched": host, "device-grid": dev}
        else:
            variants = {"dense": Predictor(model, state.params, state.bn_state,
                                           tile_threshold=0)}
        # interleaved A/B: collect per-rep times alternating variants
        outs, times = {}, {k: [] for k in variants}
        for k, p in variants.items():
            outs[k], _ = time_predict(p, img, 0)  # compile only
        for _ in range(reps):
            for k, p in variants.items():
                t0 = time.perf_counter()
                outs[k] = p.predict_array(img)
                times[k].append(time.perf_counter() - t0)
        if len(variants) == 2:
            np.testing.assert_array_equal(outs["host-stitched"],
                                          outs["device-grid"])
        for k, ts in times.items():
            med = sorted(ts)[len(ts) // 2]
            print(f"{tag} [{k}]: {med * 1e3:8.1f} ms/slice = "
                  f"{1 / med:6.2f} slices/s (min {min(ts) * 1e3:.1f})",
                  flush=True)

    for hw in (2048, 4096):
        chained_device_grid(model, state, hw)


if __name__ == "__main__":
    main()

