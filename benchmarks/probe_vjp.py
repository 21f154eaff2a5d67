#!/usr/bin/env python
"""Bounded probe (VERDICT r3 #2): custom_vjp on conv_wide_split vs autodiff.

The r3 hardware profile attributed 24% of the unet_s train step to
XLA-inserted layout copies, partly feeding `add_any` of dx contributions.
This A/Bs the full train step with the split conv's backward restructured
(UMICS_SPLIT_CVJP path: dx as explicit flipped-kernel conv_wide calls)
against the default autodiff, interleaved in one process (CLAUDE.md drift
rule), 64-step chains, plus an optimized-HLO copy/add_any audit of both.
"""
import math
import re
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

from unet_medical_image_contour_segmentation_tpu.engine.optim import RMSpropConfig
from unet_medical_image_contour_segmentation_tpu.engine.train import (
    init_train_state, make_train_step,
)
from unet_medical_image_contour_segmentation_tpu.losses.compound import LossConfig
from unet_medical_image_contour_segmentation_tpu.models.unet import unet_s
from unet_medical_image_contour_segmentation_tpu.ops import wide as W

STEPS = 64
REPS = 5


def hlo_audit(compiled_text, tag):
    nbytes = {"bf16": 2, "f32": 4, "s32": 4, "u32": 4, "s8": 1, "pred": 1}
    copies = re.findall(r"= (\S+?)\{[^}]*\} copy\(", compiled_text)
    tb = 0
    for shape in copies:
        mt = re.match(r"(bf16|f32|s32|u32|s8|pred)\[([\d,]*)\]", shape)
        if mt:
            n = math.prod(int(x) for x in mt[2].split(",")) if mt[2] else 1
            tb += n * nbytes[mt[1]]
    n_addany = len(re.findall(r" add-any\(|add_any\(", compiled_text))
    print(f"{tag}: {len(copies)} copies = {tb / 1e6:.0f} MB/step, "
          f"{n_addany} add_any", flush=True)


def build_chain(cvjp: bool, model, batch_data):
    W.SPLIT_CUSTOM_VJP[0] = cvjp  # read at trace time
    step_fn = make_train_step(model, LossConfig(n_classes=3), RMSpropConfig(), 1.0)

    @jax.jit
    def chain(state):
        def body(st, _):
            st, metrics = step_fn(st, batch_data, 1e-5)
            return st, metrics["loss"]
        st, losses = lax.scan(body, state, None, length=STEPS)
        return st, losses[-1]

    return chain


def main():
    model = unet_s(1, 3, compute_dtype=jnp.bfloat16)
    state = init_train_state(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch_data = {
        "image": jnp.asarray(rng.random((8, 512, 512), np.float32)),
        "mask": jnp.asarray(rng.integers(0, 3, (8, 512, 512)).astype(np.int32)),
    }
    _ = float(jnp.sum(batch_data["image"]))  # readback warmup

    chains = {"autodiff": build_chain(False, model, batch_data),
              "custom_vjp": build_chain(True, model, batch_data)}
    # compile both (trace happens here; flag is read inside build via jit
    # laziness — force with a first call while the flag is set correctly)
    losses = {}
    for name, cvjp in (("autodiff", False), ("custom_vjp", True)):
        W.SPLIT_CUSTOM_VJP[0] = cvjp
        _, l = chains[name](state)
        losses[name] = float(l)
    print("losses after 64 steps:", losses, flush=True)

    times = {k: [] for k in chains}
    for _ in range(REPS):
        for name, cvjp in (("autodiff", False), ("custom_vjp", True)):
            W.SPLIT_CUSTOM_VJP[0] = cvjp
            t0 = time.perf_counter()
            _, l = chains[name](state)
            _ = float(l)
            times[name].append((time.perf_counter() - t0) / STEPS)
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: {med * 1e3:.2f} ms/step = {8 / med:.1f} slices/s "
              f"(min {min(ts) * 1e3:.2f}, max {max(ts) * 1e3:.2f})", flush=True)

    # HLO audit of the single (unchained) step
    for name, cvjp in (("autodiff", False), ("custom_vjp", True)):
        W.SPLIT_CUSTOM_VJP[0] = cvjp
        step = jax.jit(make_train_step(
            model, LossConfig(n_classes=3), RMSpropConfig(), 1.0))
        txt = step.lower(state, batch_data, 1e-5).compile().as_text()
        hlo_audit(txt, name)


if __name__ == "__main__":
    main()
