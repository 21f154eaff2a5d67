#!/usr/bin/env python
"""Where does yolo int8 win/lose?  Per-op bf16-vs-int8 A/B at the real shapes.

First full-model measurement (bench.py --model yolov8_seg_s, r4) showed int8
~parity (932 vs 938 slices/s) — unlike unet_s (1.29x), unet (1.45x).  This
probe times each CBS conv family in isolation, interleaved in ONE process
(the tunnel drifts 5-15% between processes), chained >= 128 steps.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_int8_yolo.py
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


def timeit(fn, x):
    f = jax.jit(fn)
    _ = jax.tree_util.tree_map(lambda t: float(jnp.sum(t.astype(jnp.float32))),
                               f(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(f(x).astype(jnp.float32)))
        ts.append((time.perf_counter() - t0) / STEPS * 1e3)
    ts.sort()
    return ts[1]


def chain_f(body):
    def fn(x):
        def step(c, _):
            return body(c), ()
        y, _ = lax.scan(step, x, None, length=STEPS)
        return y
    return fn


def probe_pair(name, shape_bhwl, bw, cin, cout, k=3, stride=1):
    """bf16 conv+silu vs int8 conv+silu-requant epilogue at one shape."""
    rng = np.random.RandomState(0)
    B, H, Wb, L = shape_bhwl
    xf = jnp.asarray(rng.rand(B, H, Wb, L).astype(np.float32) - 0.5,
                     jnp.bfloat16)
    wf = jnp.asarray(rng.rand(k, k, cin, cout).astype(np.float32) * 0.1,
                     jnp.bfloat16)
    bwo = max(bw // stride, 1)

    def body_f(c):
        if k == 1 and bw > 1:
            y = W.conv1x1_wide(c, wf, bw, compute_dtype=jnp.bfloat16)
        else:
            y = W.conv_wide(c, wf, bw, compute_dtype=jnp.bfloat16,
                            stride=stride, h_fold=False)
        y32 = y.astype(jnp.float32)
        y = (y32 * jax.nn.sigmoid(y32)).astype(jnp.bfloat16)
        # shape-preserving feedback: slice/pad back to the input shape
        return c + 1e-6 * jnp.mean(y)

    xq = jnp.asarray(rng.randint(-127, 128, (B, H, Wb, L)), jnp.int8)
    wq = jnp.asarray(rng.randint(-127, 128, (k, k, cin, cout)), jnp.int8)
    mul = jnp.full((cout,), 1e-3, jnp.float32)
    badd = jnp.zeros((cout,), jnp.float32)

    # feedback must depend on the conv output (no hoisting/DCE) while
    # preserving the carry's shape/dtype: add a data-dependent int8 that is
    # 0 unless the requant ever hits -128 (it cannot, but XLA cannot fold a
    # value-dependent comparison)
    def body_q(c):
        if k == 1:
            y = W.conv1x1_wide_int8(c, wq, bw)
        else:
            y = W.conv_wide_int8(c, wq, bw, stride=stride)
        yf = y.astype(jnp.float32) * jnp.tile(mul, bwo) + jnp.tile(badd, bwo)
        yf = yf * jax.nn.sigmoid(yf)
        q = jnp.clip(jnp.round(yf * 127.0), -127, 127).astype(jnp.int8)
        dep = jnp.where(jnp.max(q) == jnp.int8(-128),
                        jnp.int8(1), jnp.int8(0))
        return c + dep

    tf = timeit(chain_f(body_f), xf)
    tq = timeit(chain_f(body_q), xq)
    gmac = B * H * Wb * bwo // max(bw // stride, 1)  # positions (logical)
    print(f"{name:28s} bf16 {tf:7.3f} ms  int8 {tq:7.3f} ms  "
          f"ratio {tf / tq:5.2f}x")
    return tf, tq


def full_model_ab():
    """Interleaved float vs full-int8 vs proto-int8 full-model predict.

    r4 result (512^2 b8, 128-step chains, median of 3 interleaved rounds):
    float 7.887 ms (1014 slices/s), full-int8 7.969 (1004), proto-int8
    7.641 (1047 = 1.03x) -> scope="proto" ships as the default.  The
    profiler shows why full-int8 loses its per-op wins: ~56% of the float
    step is already lane-shuffle copies/reshapes that do NOT shrink with
    dtype, SPPF's reduce_window unfuses in int8 (+0.3 ms), and the deep
    1x1 int8 matmuls run 0.8x.

    r5 re-A/B after the dilated-ConvT fix removed most of those copies:
    float 3.586 ms (2231 slices/s), full-int8 3.696 (0.97x — still
    negative; the SPPF unfuse and 0.8x deep 1x1 matmuls remain), proto-int8
    3.254 (2458 slices/s = 1.10x).  Proto stays the measured optimum.
    """
    from unet_medical_image_contour_segmentation_tpu.engine.train import (
        init_train_state,
    )
    from unet_medical_image_contour_segmentation_tpu.losses.s2d_fused import (
        argmax_class_major,
    )
    from unet_medical_image_contour_segmentation_tpu.models.fold_bn import (
        fold_yolo_params,
    )
    from unet_medical_image_contour_segmentation_tpu.models.quantize import (
        apply_wide_int8, build_qparams_yolo, calibrate_amax,
    )
    from unet_medical_image_contour_segmentation_tpu.models.unet import get_model
    from unet_medical_image_contour_segmentation_tpu.ops.wide import unpack_pred

    model = get_model("yolov8_seg_s", n_channels=1, n_classes=3,
                      compute_dtype=jnp.bfloat16)
    state = init_train_state(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((8, 512, 512), np.float32))
    folded = fold_yolo_params(state.params, state.bn_state)
    amax = calibrate_amax(model, folded, image[:2])

    def mk(qp):
        @jax.jit
        def fn(x):
            def body(c, _):
                if qp is None:
                    cm, _, blk = model.apply_fused(state.params, state.bn_state,
                                                   c, train=False)
                else:
                    cm, blk = apply_wide_int8(model, qp, c,
                                              unpack_output=False,
                                              class_major=True)
                pred = unpack_pred(blk, argmax_class_major(cm, 3))
                return c + 1e-12 * pred.astype(c.dtype), ()
            y, _ = lax.scan(body, x, None, length=STEPS)
            return jnp.sum(y[0, 0])
        return fn

    chains = {
        "float": mk(None),
        "q_full": mk(build_qparams_yolo(model, folded, amax, scope="full")),
        "q_proto": mk(build_qparams_yolo(model, folded, amax, scope="proto")),
    }
    for f in chains.values():
        _ = float(f(image))  # compile
    res = {n: [] for n in chains}
    for _round in range(3):  # interleave: the tunnel drifts between passes
        for n, f in chains.items():
            t0 = time.perf_counter()
            _ = float(f(image))
            res[n].append((time.perf_counter() - t0) / STEPS * 1e3)
    for n, ts in res.items():
        med = sorted(ts)[1]
        print(f"{n:8s} {med:6.3f} ms/step  {8 / med * 1e3:7.1f} slices/s")


def main():
    _ = float(jnp.sum(jnp.ones((8, 128))))  # readback warmup
    print(f"platform={jax.devices()[0].platform} STEPS={STEPS} b=8 @512^2")
    if "--full-model" in sys.argv:
        full_model_ab()
        return
    B = 8
    # backbone stride-2 downsample CBS convs (3x3 s2)
    probe_pair("stem 3x3s2 1->32 bw8", (B, 512, 64, 8 * 1), 8, 1, 32, stride=2)
    probe_pair("down0 3x3s2 32->64 bw4", (B, 256, 64, 4 * 32), 4, 32, 64, stride=2)
    probe_pair("down1 3x3s2 64->128 bw2", (B, 128, 64, 2 * 64), 2, 64, 128, stride=2)
    probe_pair("down2 3x3s2 128->256", (B, 64, 64, 128), 1, 128, 256, stride=2)
    # C2f 1x1s + bottleneck 3x3s at the wide level
    probe_pair("c2f0.cv1 1x1 64->64 bw2", (B, 128, 64, 2 * 64), 2, 64, 64, k=1)
    probe_pair("c2f0 bneck 3x3 32 bw4", (B, 128, 32, 4 * 32), 4, 32, 32)
    probe_pair("c2f2.cv1 1x1 256->256", (B, 32, 32, 256), 1, 256, 256, k=1)
    # neck
    probe_pair("n3.cv1 1x1 384->128", (B, 64, 64, 384), 1, 384, 128, k=1)
    # proto head full-res CBS convs
    probe_pair("p_c1 3x3 64 bw2 @128", (B, 128, 64, 2 * 64), 2, 64, 64)
    probe_pair("p_c2 3x3 32 bw4 @256", (B, 256, 64, 4 * 32), 4, 32, 32)
    probe_pair("p_c3 3x3 32 bw4 @512", (B, 512, 128, 4 * 32), 4, 32, 32)


if __name__ == "__main__":
    main()
