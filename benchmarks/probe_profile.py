#!/usr/bin/env python
"""Hardware profile of a train step: per-category device-time decomposition.

Captures a jax.profiler trace (works on the tunneled axon platform), parses
the perfetto trace.json.gz with plain json, and prints ms/step by HLO op
category plus the copy-traffic audit from the optimized HLO text
(``step.lower(...).compile().as_text()``).  r3 findings recorded in
CLAUDE.md: unet_s 512²b8 = 43% conv/elementwise fusions, 23% reduce
fusions, 24% XLA layout-transpose copies (1.82 GB/step).

Usage: python benchmarks/probe_profile.py [model] [hw] [batch]
"""
import collections
import gzip
import json
import math
import re
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

STEPS = 3


def main(model_name="unet_s", hw=512, batch=8):
    import jax
    import jax.numpy as jnp

    from unet_medical_image_contour_segmentation_tpu.engine.optim import RMSpropConfig
    from unet_medical_image_contour_segmentation_tpu.engine.train import (
        init_train_state, make_train_step,
    )
    from unet_medical_image_contour_segmentation_tpu.losses.compound import LossConfig
    from unet_medical_image_contour_segmentation_tpu.models.unet import get_model
    from unet_medical_image_contour_segmentation_tpu.utils.profiling import trace

    model = get_model(model_name, n_channels=1, n_classes=3,
                      compute_dtype=jnp.bfloat16)
    state = init_train_state(model, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(
        model, LossConfig(n_classes=3), RMSpropConfig(), 1.0))
    rng = np.random.default_rng(0)
    batch_d = {"image": jnp.asarray(rng.random((batch, hw, hw), np.float32)),
               "mask": jnp.asarray(rng.integers(0, 3, (batch, hw, hw)))}
    state, m = step(state, batch_d, 1e-4)
    _ = float(m["loss"])  # compile + readback warmup

    tmp = tempfile.mkdtemp(prefix="jax-trace-")
    with trace(tmp):
        for _ in range(STEPS):
            state, m = step(state, batch_d, 1e-4)
        _ = float(m["loss"])

    (gz,) = Path(tmp).rglob("*.trace.json.gz")
    events = json.loads(gzip.open(gz).read()).get("traceEvents", [])
    dev_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e["args"].get("name", "")}
    cat = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e["name"]
        if name.startswith("jit_") or re.fullmatch(r"\d+", name):
            continue  # enclosing step spans
        key = re.sub(r"[.\d]+$", "", name)
        key = re.sub(r"^(convert_|loop_|input_|output_)", "", key)
        cat[key] += e.get("dur", 0)
    total = sum(cat.values())
    print(f"{model_name} {hw}²b{batch}: {total / STEPS / 1e3:.2f} ms/step "
          f"device time; by category:")
    for k, us in cat.most_common(10):
        print(f"  {us / STEPS / 1e3:7.3f} ms  {100 * us / total:5.1f}%  {k}")

    # copy-traffic audit from the optimized HLO
    txt = step.lower(state, batch_d, 1e-4).compile().as_text()
    nbytes = {"bf16": 2, "f32": 4, "s32": 4, "u32": 4, "s8": 1, "pred": 1}
    copies = re.findall(r"= (\S+?)\{[^}]*\} copy\(", txt)
    tb = 0
    for shape in copies:
        mt = re.match(r"(bf16|f32|s32|u32|s8|pred)\[([\d,]*)\]", shape)
        if mt:
            n = math.prod(int(x) for x in mt[2].split(",")) if mt[2] else 1
            tb += n * nbytes[mt[1]]
    print(f"HLO copies: {len(copies)} totalling {tb / 1e6:.0f} MB/step "
          f"(~{2 * tb / 600e9 * 1e3:.1f} ms at 600 GB/s effective)")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "unet_s",
         int(a[1]) if len(a) > 1 else 512,
         int(a[2]) if len(a) > 2 else 8)
