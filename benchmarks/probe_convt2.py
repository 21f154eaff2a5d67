#!/usr/bin/env python
"""Interleaved A/B: per-row-parity einsum vs dilated-conv conv_transpose2_wide,
and the yolo proto-head pre-reblock.

r5 HLO audit of the yolov8_seg predict step: the einsum ConvT's assembly
(2 dot-output layout copies + pad/maximum stack + H-merge reshape) plus the
post-ConvT reblock account for ~1.5 ms of a 4.68 ms step.  Variants:

* ``dil``: ops/wide.py:conv_transpose2_wide_dilated — ONE lhs-dilated conv
  with a lane-scatter kernel (R = 1 in W), bit-exact vs the dense NHWC
  ConvT.
* ``prerb``: models/yolov8_seg.py PRE_REBLOCK — reblock the ConvT INPUT
  when the optimal output block is half the native 2*bw (p_up3), moving
  half the bytes and making the H-merge an outer-dim bitcast.
  NOTE: since the r5 decision landed, PRE_REBLOCK is train-only in the
  model (measured: train wants it, the dilated-conv eval forward doesn't),
  so the predict-mode prerb variants now measure the base path twice.

r5 measured (this probe, one session): yolo predict base 4.927 / prerb
4.532 / dil 3.588 / dil+prerb 3.842 ms; unet_s predict 5.190 -> 4.778;
unet_s train 18.875 -> 17.628; unet_pp_s predict 15.062 -> 13.653; yolo
train base 18.612 / dil+prerb 17.421.  Shipped: dil default +
train-only prerb.

All in ONE process (the tunnel drifts 5-15% between processes), 128-step
chains.  Also checks prediction equality across variants.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_convt2.py
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
from unet_medical_image_contour_segmentation_tpu.models import yolov8_seg as Y

STEPS = 128

convt_einsum = W.conv_transpose2_wide
convt_dil = W.conv_transpose2_wide_dilated


def build(model_name, batch, hw, mode, variants):
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
    mask = jnp.asarray(rng.integers(0, 3, (batch, hw, hw)))

    chains, preds = {}, {}
    try:
        for tag, (impl, prerb) in variants.items():
            W.conv_transpose2_wide = impl
            Y.PRE_REBLOCK[0] = prerb
            if mode == "predict":
                @jax.jit
                def single(x, _m=model, _s=state):
                    cm, _, blk = _m.apply_fused(_s.params, _s.bn_state, x,
                                                train=False)
                    return unpack_pred(blk, argmax_class_major(cm, 3))

                preds[tag] = np.asarray(single(image))

                @jax.jit
                def chain(x, _m=model, _s=state):
                    def body(c, _):
                        cm, _, blk = _m.apply_fused(_s.params, _s.bn_state,
                                                    c, train=False)
                        pred = unpack_pred(blk, argmax_class_major(cm, 3))
                        return c + 1e-12 * pred.astype(c.dtype), ()
                    y, _ = lax.scan(body, x, None, length=STEPS)
                    return jnp.sum(y[0, 0])

                _ = float(chain(image))
                chains[tag] = (chain, (image,))
            else:
                step = make_train_step(model, LossConfig(n_classes=3),
                                       RMSpropConfig(), 1.0)

                @jax.jit
                def chain(x, m, _step=step, _s=state):
                    def body(c, _):
                        s2, met = _step(c, {"image": x, "mask": m}, 1e-4)
                        return s2, met["loss"]
                    s_out, losses = lax.scan(body, _s, None, length=STEPS)
                    return losses[-1]

                preds[tag] = float(chain(image, mask))
                chains[tag] = (chain, (image, mask))
    finally:
        W.conv_transpose2_wide = convt_einsum
        Y.PRE_REBLOCK[0] = True
    return chains, preds


def run(name, model_name, mode, variants, batch=8, hw=512):
    chains, preds = build(model_name, batch, hw, mode, variants)
    tags = list(chains)
    base = preds[tags[0]]
    for t in tags[1:]:
        if mode == "predict":
            agree = float((preds[t] == base).mean())
            assert agree > 0.9999, (name, t, agree)
        else:
            print(f"  [{t}] 128-step loss {preds[t]:.6f} vs {base:.6f}")
    res = {t: [] for t in tags}
    for _ in range(3):
        for t, (f, a) in chains.items():
            t0 = time.perf_counter()
            _ = float(f(*a))
            res[t].append((time.perf_counter() - t0) / STEPS * 1e3)
    meds = {t: sorted(v)[1] for t, v in res.items()}
    cols = "  ".join(f"{t} {meds[t]:7.3f}" for t in tags)
    best = min(meds, key=meds.get)
    print(f"{name:22s} {cols} ms  best={best} "
          f"({batch / meds[best] * 1e3:.0f} slices/s, "
          f"{meds[tags[0]] / meds[best]:.3f}x vs {tags[0]})")


def main():
    _ = float(jnp.sum(jnp.ones((8, 128))))  # readback warmup
    print(f"platform={jax.devices()[0].platform} STEPS={STEPS}")
    yolo_variants = {
        "base": (convt_einsum, False),
        "prerb": (convt_einsum, True),
        "dil": (convt_dil, False),
        "dil+prerb": (convt_dil, True),
    }
    run("yolov8_seg_s predict", "yolov8_seg_s", "predict", yolo_variants)
    two = {"einsum": (convt_einsum, True), "dil": (convt_dil, True)}
    run("unet_s predict", "unet_s", "predict", two)
    run("unet_s train", "unet_s", "train", two)
    run("unet_pp_s predict", "unet_pp_s", "predict", two)
    run("yolov8_seg_s train", "yolov8_seg_s", "train", yolo_variants)


if __name__ == "__main__":
    main()
