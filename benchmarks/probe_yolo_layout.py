#!/usr/bin/env python
"""Where does a model's PREDICT step spend its device time — with attribution.

r4's int8 probe found ~56% of yolov8_seg's float predict step is lane-shuffle
copies/reshapes (which is why full-int8 placement is net-negative there).
This probe captures a jax.profiler trace of the fused eval forward
(dispatched directly, NOT wrapped in lax.scan — a scan buries every op
inside one opaque `while`), joins the per-op durations against the optimized
HLO's metadata (op_name = the JAX-level path, source line), and prints
(a) the category split and (b) the top ops attributed to model constructs
(C2f concat, FPN nearest-up repeat, proto reblocks, SPPF, attention, ...).

Works for any registry model: unet_sa / unet_pp_s audits use it too (r5).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python benchmarks/probe_yolo_layout.py [model] [hw] [batch]
"""
import collections
import gzip
import json
import re
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

STEPS = 8


def parse_hlo_metadata(txt):
    """instruction name -> (shape str, jax op_name path) from optimized HLO."""
    meta = {}
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.-]+) = (\S+?) [a-z-]+\(", line)
        if not m:
            continue
        name, shape = m.group(1), m.group(2)
        op = re.search(r'op_name="([^"]*)"', line)
        meta[name] = (shape, op.group(1) if op else "")
    return meta


def shorten(op_name: str, width: int = 90) -> str:
    """Strip the jit(...)/jit(main)/ prefix; keep the informative tail."""
    s = re.sub(r"^jit\([^)]*\)/", "", op_name)
    s = re.sub(r"^jit\(main\)/", "", s)
    return s[-width:] if len(s) > width else s


def main(model_name="yolov8_seg_s", hw=512, batch=8):
    import jax
    import jax.numpy as jnp

    from unet_medical_image_contour_segmentation_tpu.engine.train import (
        init_train_state,
    )
    from unet_medical_image_contour_segmentation_tpu.losses.s2d_fused import (
        argmax_class_major,
    )
    from unet_medical_image_contour_segmentation_tpu.models.unet import get_model
    from unet_medical_image_contour_segmentation_tpu.ops.wide import unpack_pred
    from unet_medical_image_contour_segmentation_tpu.utils.profiling import trace

    model = get_model(model_name, n_channels=1, n_classes=3,
                      compute_dtype=jnp.bfloat16)
    state = init_train_state(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((batch, hw, hw), np.float32))

    @jax.jit
    def predict(x):
        cm, _, blk = model.apply_fused(state.params, state.bn_state,
                                       x, train=False)
        return unpack_pred(blk, argmax_class_major(cm, 3))

    _ = np.asarray(predict(image))  # compile + readback warmup
    lowered = predict.lower(image)
    hlo_meta = parse_hlo_metadata(lowered.compile().as_text())

    tmp = tempfile.mkdtemp(prefix="jax-trace-")
    with trace(tmp):
        for _ in range(STEPS):
            out = predict(image)
        _ = np.asarray(out)

    # the profiler may emit one trace per host/process; take the largest
    gz = max(Path(tmp).rglob("*.trace.json.gz"), key=lambda p: p.stat().st_size)
    events = json.loads(gzip.open(gz).read()).get("traceEvents", [])
    dev_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e["args"].get("name", "")}
    cat = collections.Counter()
    per_op = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e["name"]
        if name.startswith("jit_") or re.fullmatch(r"\d+", name):
            continue
        per_op[name] += e.get("dur", 0)
        key = re.sub(r"[.\d]+$", "", name)
        key = re.sub(r"^(convert_|loop_|input_|output_)", "", key)
        cat[key] += e.get("dur", 0)
    total = sum(cat.values())
    print(f"{model_name} {hw}²b{batch} predict: {total / STEPS / 1e3:.2f} "
          f"ms/step device time; by category:")
    for k, us in cat.most_common(12):
        print(f"  {us / STEPS / 1e3:7.3f} ms  {100 * us / total:5.1f}%  {k}")
    print("\ntop 30 individual ops (with HLO metadata attribution):")
    for k, us in per_op.most_common(30):
        shape, op = hlo_meta.get(k, ("?", ""))
        print(f"  {us / STEPS / 1e3:7.3f} ms  {100 * us / total:5.1f}%  "
              f"{k:32s} {shape}")
        if op:
            print(f"           {'':14s}{shorten(op)}")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "yolov8_seg_s",
         int(a[1]) if len(a) > 1 else 512,
         int(a[2]) if len(a) > 2 else 8)
