#!/usr/bin/env python
"""Interleaved A/B: single-einsum vs per-row-parity conv_transpose2_wide.

The r4 yolo profile attributed the largest predict-step copies to the
ConvT einsum's bhrwxso transpose (+ the unfused bias add and convert it
drags along).  The rewrite splits the dot per output-row parity so the
dot's natural output order is already the wide lane order.  This probe
monkeypatches ops.wide.conv_transpose2_wide with the OLD formulation and
interleaves old/new chains in ONE process (the tunnel drifts 5-15%
between processes), 128-step chains.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_convt.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from unet_medical_image_contour_segmentation_tpu.ops import wide as W

STEPS = 128


def convt_old(x, w, bw, bias=None, compute_dtype=None):
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    B, H, Wb, L = x.shape
    cin, cout = w.shape[2], w.shape[3]
    xg = x.reshape(B, H, Wb, bw, cin)
    y = jnp.einsum("bhwxc,rsco->bhrwxso", xg, w)
    y = y.reshape(B, 2 * H, Wb, 2 * bw * cout)
    if bias is not None:
        y = y + jnp.tile(bias, 2 * bw).astype(y.dtype)
    return y


convt_new = W.conv_transpose2_wide


def build_chains(model_name, batch, hw, mode):
    from unet_medical_image_contour_segmentation_tpu.engine.optim import (
        RMSpropConfig,
    )
    from unet_medical_image_contour_segmentation_tpu.engine.train import (
        init_train_state, make_train_step,
    )
    from unet_medical_image_contour_segmentation_tpu.losses.compound import (
        LossConfig,
    )
    from unet_medical_image_contour_segmentation_tpu.losses.s2d_fused import (
        argmax_class_major,
    )
    from unet_medical_image_contour_segmentation_tpu.models.unet import get_model
    from unet_medical_image_contour_segmentation_tpu.ops.wide import unpack_pred

    model = get_model(model_name, n_channels=1, n_classes=3,
                      compute_dtype=jnp.bfloat16)
    state = init_train_state(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((batch, hw, hw), np.float32))

    # The monkeypatch only reaches call sites that use ATTRIBUTE access
    # (W.conv_transpose2_wide); a `from ops.wide import conv_transpose2_wide`
    # caller would bind the original and make this probe measure new-vs-new.
    import unet_medical_image_contour_segmentation_tpu.models.wide_exec as _we
    assert not hasattr(_we, "conv_transpose2_wide"), (
        "wide_exec imported conv_transpose2_wide by name; the monkeypatch "
        "below would not reach it — switch the call site back to W.<attr>"
    )
    chains = {}
    try:
      for tag, impl in (("old", convt_old), ("new", convt_new)):
        W.conv_transpose2_wide = impl
        if mode == "predict":
            @jax.jit
            def chain(x, _m=model, _s=state):
                def body(c, _):
                    cm, _, blk = _m.apply_fused(_s.params, _s.bn_state, c,
                                                train=False)
                    pred = unpack_pred(blk, argmax_class_major(cm, 3))
                    return c + 1e-12 * pred.astype(c.dtype), ()
                y, _ = lax.scan(body, x, None, length=STEPS)
                return jnp.sum(y[0, 0])

            _ = float(chain(image))  # compile (+ readback warmup first call)
            chains[tag] = (chain, (image,))
        else:
            step = make_train_step(model, LossConfig(n_classes=3),
                                   RMSpropConfig(), 1.0)
            mask = jnp.asarray(rng.integers(0, 3, (batch, hw, hw)))

            @jax.jit
            def chain(x, m, _step=step, _s=state):
                def body(c, _):
                    s2, met = _step(c, {"image": x, "mask": m}, 1e-4)
                    return s2, met["loss"]
                s_out, losses = lax.scan(body, _s, None, length=STEPS)
                return losses[-1]

            _ = float(chain(image, mask))
            chains[tag] = (chain, (image, mask))
    finally:
        W.conv_transpose2_wide = convt_new
    return chains


def run(name, model_name, mode, batch=8, hw=512):
    chains = build_chains(model_name, batch, hw, mode)
    res = {t: [] for t in chains}
    for _ in range(3):
        for t, (f, a) in chains.items():
            t0 = time.perf_counter()
            _ = float(f(*a))
            res[t].append((time.perf_counter() - t0) / STEPS * 1e3)
    meds = {t: sorted(v)[1] for t, v in res.items()}
    print(f"{name:24s} old {meds['old']:7.3f} ms  new {meds['new']:7.3f} ms  "
          f"speedup {meds['old'] / meds['new']:5.3f}x  "
          f"({batch / meds['new'] * 1e3:.0f} slices/s new)")


def main():
    _ = float(jnp.sum(jnp.ones((8, 128))))  # readback warmup
    print(f"platform={jax.devices()[0].platform} STEPS={STEPS}")
    run("yolov8_seg_s predict", "yolov8_seg_s", "predict")
    run("unet_s predict", "unet_s", "predict")
    run("unet_s train", "unet_s", "train")


if __name__ == "__main__":
    main()
