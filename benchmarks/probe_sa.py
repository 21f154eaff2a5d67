#!/usr/bin/env python
"""Decompose the UNet_SA throughput tax (VERDICT r2 item 1).

unet_sa ran at 297 combined slices/s vs unet_s 480 at equal logical FLOPs.
Hypothesis: the attention conv7 runs in the skip's wide layout (bw=8 at the
512-level), where its 2-channel-per-block input is lane-padded 8x and its
1-channel-per-block output 16x, so the conv's PHYSICAL MACs (~18 GMAC/slice
summed over the four levels) rival the whole rest of the model.

Measures, single-process interleaved (CLAUDE.md drift rule), chained scans:
  - unet_s vs unet_sa train step and eval forward
  - unet_sa with the conv7 at ATT_CONV_BW=64 dense lanes (the r3 fix) vs
    the pre-r3 behavior (conv at the skip's own bw, lane-padded 8-64x)
  - unet_sa with all attention stripped (param surgery; switches every Up
    to the split-conv path = the residual non-conv7 attention cost)

Usage:  python benchmarks/probe_sa.py [--steps 64] [--batch 8] [--reps 3]
"""

import argparse
import copy
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--train-only", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from unet_medical_image_contour_segmentation_tpu.engine.optim import RMSpropConfig
    from unet_medical_image_contour_segmentation_tpu.engine.train import (
        init_train_state, make_train_step,
    )
    from unet_medical_image_contour_segmentation_tpu.losses.compound import LossConfig
    from unet_medical_image_contour_segmentation_tpu.models.unet import get_model
    from unet_medical_image_contour_segmentation_tpu.models.fold_bn import fold_params

    hw = (args.hw, args.hw)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((args.batch, *hw), np.float32))
    mask = jnp.asarray(rng.integers(0, 3, (args.batch, *hw)).astype(np.int32))
    batch_data = {"image": image, "mask": mask}
    _ = float(jnp.sum(image))  # readback warmup

    model_s = get_model("unet_s", n_channels=1, n_classes=3, compute_dtype=jnp.bfloat16)
    model_sa = get_model("unet_sa", n_channels=1, n_classes=3, compute_dtype=jnp.bfloat16)
    state_sa = init_train_state(model_sa, jax.random.PRNGKey(0))

    def strip_att(params, levels):
        p = copy.deepcopy(jax.device_get(params))
        for k in levels:
            p[f"up{k}"].pop("att")
        return jax.device_put(p)

    from unet_medical_image_contour_segmentation_tpu.engine.optim import init_rmsprop
    from unet_medical_image_contour_segmentation_tpu.models import wide_exec

    def stripped_state(levels):
        p = strip_att(state_sa.params, levels)
        return state_sa._replace(params=p, opt_state=init_rmsprop(p))

    # name -> (model, state, ATT_CONV_BW to trace under; None = n/a)
    state_s = init_train_state(model_s, jax.random.PRNGKey(0))
    variants = {
        "unet_s": (model_s, state_s, None),
        "unet_sa_att64": (model_sa, state_sa, 64),
        "unet_sa_attold": (model_sa, state_sa, 1),
        "sa_minus_all": (model_sa, stripped_state([1, 2, 3, 4]), None),
    }

    from unet_medical_image_contour_segmentation_tpu.engine.evaluate import eval_forward

    chains = {}
    for name, (model, st, att_bw) in variants.items():
        if att_bw is not None:
            wide_exec.ATT_CONV_BW = att_bw
        step_fn = make_train_step(model, LossConfig(n_classes=3),
                                  RMSpropConfig(), 1.0)

        @jax.jit
        def train_chain(state, _step=step_fn):
            def body(s, _):
                s, m = _step(s, batch_data, 1e-5)
                return s, m["loss"]
            s, losses = lax.scan(body, state, None, length=args.steps)
            return losses[-1]

        # compile NOW (first call), while the patched ATT_CONV_BW is active
        t0 = time.perf_counter()
        _ = float(jnp.asarray(train_chain(st)).ravel()[0])
        print(f"compiled train/{name} in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        chains[f"train/{name}"] = (train_chain, st)

        if not args.train_only:
            folded = fold_params(st.params, st.bn_state)

            @jax.jit
            def pred_chain(img, _m=model, _p=folded):
                def body(x, _):
                    pred = eval_forward(_m, 3, _p, None, x)
                    return x + 1e-6 * pred.astype(x.dtype), pred[0, 0, 0]
                x, outs = lax.scan(body, img, None, length=args.steps)
                return outs[-1]

            t0 = time.perf_counter()
            _ = float(jnp.asarray(pred_chain(image)).ravel()[0])
            print(f"compiled pred/{name} in {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr, flush=True)
            chains[f"pred/{name}"] = (pred_chain, image)
        wide_exec.ATT_CONV_BW = 64

    results = {k: [] for k in chains}
    for rep in range(args.reps):
        for name, (fn, arg) in chains.items():
            t0 = time.perf_counter()
            _ = float(jnp.asarray(fn(arg)).ravel()[0])
            dt = (time.perf_counter() - t0) / args.steps * 1e3
            results[name].append(dt)

    print(f"\n== per-step ms (batch {args.batch}, {args.hw}^2, "
          f"{args.steps}-step chains, {args.reps} interleaved reps) ==")
    for name, ts in results.items():
        med = sorted(ts)[len(ts) // 2]
        spread = (max(ts) - min(ts)) / med * 100
        print(f"{name:24s} {med:8.2f} ms  (±{spread:.0f}%)  {[f'{t:.2f}' for t in ts]}")


if __name__ == "__main__":
    main()
