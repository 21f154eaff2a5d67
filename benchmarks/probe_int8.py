"""Probe: int8 quantized conv vs bf16 in the wide layout (serving path).

Question: v5e's MXU has 2x int8 peak (394 TOPS vs 197 TF/s bf16) and the
512^2 UNet_S predict path is HBM-bound (CLAUDE.md perf facts) -- does an
int8 conv (int8 x int8 -> int32, then rescale+ReLU+requantize) beat the
bf16 block conv at the model's real shapes?

Method (CLAUDE.md timing rules): interleaved A/B within ONE process,
>=64-step lax.scan chains, one device fetch at the end, throwaway fetch
up front.  Shapes = wide-layout level-0 and level-2 blocks of unet_s
(C=16 bw=8 and C=64 bw=2), the predict hot spots.

Run:  python benchmarks/probe_int8.py            (real TPU)
"""
from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")

from unet_medical_image_contour_segmentation_tpu.ops import wide  # noqa: E402

STEPS = 128


def scattered_kernel(key, k, cin, cout, bw, dtype):
    w = jax.random.normal(key, (k, k, cin, cout), jnp.float32) * 0.1
    ws, cen, R = wide._scatter_kernel_wide(w, bw)
    if dtype == jnp.int8:
        # symmetric per-tensor quant of the scattered kernel
        scale = jnp.max(jnp.abs(ws)) / 127.0
        wq = jnp.clip(jnp.round(ws / scale), -127, 127).astype(jnp.int8)
        return wq, cen, R
    return ws.astype(dtype), cen, R


def bench_chain(step, x0, steps=STEPS, reps=3):
    @jax.jit
    def chain(x):
        def body(c, _):
            return step(c), None
        y, _ = lax.scan(body, x, None, length=steps)
        return jnp.sum(jnp.abs(y).astype(jnp.float32))

    _ = float(chain(x0))  # compile + warm
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(chain(x0))
        best.append((time.perf_counter() - t0) / steps * 1e3)
    return min(best)


def conv_shape_probe(B, H, Wb, cin, cout, bw, k=3):
    """One wide-layout conv level: bf16 vs int8 pipelines, interleaved."""
    key = jax.random.PRNGKey(0)
    ws_bf, cen, R = scattered_kernel(key, k, cin, cout, bw, jnp.bfloat16)
    ws_i8, _, _ = scattered_kernel(key, k, cin, cout, bw, jnp.int8)
    pad = ((k // 2, k // 2), (cen, R - 1 - cen))
    dn_bf = lax.conv_dimension_numbers(
        (B, H, Wb, cin * bw), ws_bf.shape, ("NHWC", "HWIO", "NHWC"))
    dn_i8 = lax.conv_dimension_numbers(
        (B, H, Wb, cin * bw), ws_i8.shape, ("NHWC", "HWIO", "NHWC"))

    def step_bf16(x):
        y = lax.conv_general_dilated(x, ws_bf, (1, 1), pad,
                                     dimension_numbers=dn_bf)
        return (jnp.maximum(y, 0) * jnp.bfloat16(0.1)).astype(jnp.bfloat16)

    act_scale = jnp.float32(0.05)

    def step_int8(x):
        y = lax.conv_general_dilated(x, ws_i8, (1, 1), pad,
                                     dimension_numbers=dn_i8,
                                     preferred_element_type=jnp.int32)
        # dequant * requant folded into one scalar multiply + clip/round
        yf = y.astype(jnp.float32) * act_scale
        return jnp.clip(jnp.round(jnp.maximum(yf, 0)), 0, 127).astype(jnp.int8)

    x_bf = (jax.random.normal(key, (B, H, Wb, cin * bw), jnp.float32) * 0.5
            ).astype(jnp.bfloat16)
    x_i8 = jnp.clip(jnp.round(
        jax.random.normal(key, (B, H, Wb, cin * bw), jnp.float32) * 20),
        -127, 127).astype(jnp.int8)

    # interleave A/B/A/B to cancel tunnel drift
    t_bf1 = bench_chain(step_bf16, x_bf)
    t_i81 = bench_chain(step_int8, x_i8)
    t_bf2 = bench_chain(step_bf16, x_bf)
    t_i82 = bench_chain(step_int8, x_i8)
    t_bf, t_i8 = min(t_bf1, t_bf2), min(t_i81, t_i82)
    macs = B * H * Wb * (cin * bw) * (cout * bw) * k * k
    print(f"  shape B{B} H{H} Wb{Wb} C{cin}x{bw}: "
          f"bf16 {t_bf:.3f} ms ({2*macs/t_bf/1e9:.1f} TF/s)  "
          f"int8 {t_i8:.3f} ms ({2*macs/t_i8/1e9:.1f} TOP/s)  "
          f"speedup {t_bf/t_i8:.2f}x", flush=True)
    return t_bf, t_i8


def main():
    dev = jax.devices()[0]
    print(f"platform={dev.platform}", flush=True)
    _ = float(jnp.sum(jnp.ones((8, 128))))  # tunnel warmup fetch
    print("warmed", flush=True)

    print("level-0 (C=16, bw=8, 512^2 b8):", flush=True)
    conv_shape_probe(8, 512, 64, 16, 16, 8)
    print("level-2 (C=64, bw=2, 128^2 b8):", flush=True)
    conv_shape_probe(8, 128, 64, 64, 64, 2)
    print("level-4 bottleneck (C=256, bw=1, 32^2 b8):", flush=True)
    conv_shape_probe(8, 32, 32, 256, 256, 1)


if __name__ == "__main__":
    main()
