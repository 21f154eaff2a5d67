#!/usr/bin/env python
"""Bounded probe (r5, VERDICT #7 stretch): MXU-permutation-matmul patch
assembly vs the XLA block conv at the below-L/C-floor level-0 shape.

The round-1 landscape left ONE unexplored idea: "assembly-free patch
generation (MXU-based permutation matmuls)".  Analysis first: in the wide
layout a W-direction tap shift is a LANE-space linear map, so it folds into
the kernel for free — and `_scatter_kernel_wide` already produces exactly
those shift-folded matrices ws[u, Rj] (k x R dense (bw*C, bw*C) mats).  The
conv is then 9 plain dots

    Y[b,h,wp] = sum_u sum_Rj  Xpad[b, h+u-1, wp+Rj-cen] @ ws[u, Rj]

with H shifts as sublane slices and block-column shifts as W' slices (both
cheap).  The MAC count is IDENTICAL to the XLA block conv (the L/C law: any
lane-dense formulation pays L/C inflation; permutation folding cannot go
below the 128-lane dot granularity).  So the only question is whether
hand-issued dot_generals schedule better than XLA's conv engine — r1/r2
measured hand-issued per-tile dots at 29-45 TF/s vs the conv engine's
90-150 TF/s (CLAUDE.md conv landscape), predicting a clear negative.

Variants (level-0 unet_s shape: B=8, 512², C=16, bw=8, 128 lanes):
  A  conv_wide (XLA block conv, the shipped formulation)
  B  9 dots (per h-tap x block-column, shift-folded kernels)
  C  3 dots (lhs = 3 block-columns concatenated into 384 lanes per h-tap)

Exactness is asserted (same sums, f32) before timing; fwd and fwd+grad
chains, interleaved A/B/C in one process, 128-step chains.

RESULT (r5, v5e): clean NEGATIVE, as the r1/r2 scheduling evidence
predicted —
    fwd       conv 0.699 ms   nine 2.006 (0.35x)   three 2.126 (0.33x)
    fwd+grad  conv 1.366 ms   nine 4.301 (0.32x)   three 6.040 (0.23x)
Hand-issued dots re-read the input once per tap (9x HBM traffic) where
XLA's conv engine reuses rows across taps in VMEM.  The idea is CLOSED:
there is no JAX-level conv formulation left below the L/C floor.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_permmm.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax
import jax.numpy as jnp
from jax import lax

from unet_medical_image_contour_segmentation_tpu.ops import wide as W

STEPS = 128
REPS = 5
B, HW, C, BW = 8, 512, 16, 8


def perm_conv(x, ws, cen, R, k, n_dots):
    """Shift-folded dot formulation of the k x k SAME wide conv."""
    b, h, wp, lanes = x.shape
    ph = k // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (cen, R - 1 - cen), (0, 0)))
    y = None
    if n_dots == "nine":
        for u in range(k):
            for rj in range(R):
                xs = lax.slice(xp, (0, u, rj, 0), (b, u + h, rj + wp, lanes))
                t = jnp.einsum("bhwl,lm->bhwm", xs, ws[u, rj])
                y = t if y is None else y + t
    else:  # three: concat block columns into 3*lanes, one dot per h-tap
        wcat = ws.reshape(k, R * lanes, lanes)
        for u in range(k):
            xs = [lax.slice(xp, (0, u, rj, 0), (b, u + h, rj + wp, lanes))
                  for rj in range(R)]
            xc = jnp.concatenate(xs, axis=-1)
            t = jnp.einsum("bhwl,lm->bhwm", xc, wcat[u])
            y = t if y is None else y + t
    return y


def main():
    _ = float(jnp.sum(jnp.zeros(8)))  # readback warmup
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, HW, HW // BW, BW * C)),
                    jnp.bfloat16)
    w = jnp.asarray(0.1 * rng.standard_normal((3, 3, C, C)), jnp.bfloat16)
    ws, cen, R = W._scatter_kernel_wide(w, BW)
    k = 3

    def f_conv(x, w):
        return W.conv_wide(x, w, BW, h_fold=False)

    def f_nine(x, w):
        ws, cen, R = W._scatter_kernel_wide(w, BW)
        return perm_conv(x, ws, cen, R, k, "nine")

    def f_three(x, w):
        ws, cen, R = W._scatter_kernel_wide(w, BW)
        return perm_conv(x, ws, cen, R, k, "three")

    # exactness (bf16 inputs, f32 compare): same sums as the block conv
    ya = np.asarray(f_conv(x, w), np.float32)
    for name, f in (("nine", f_nine), ("three", f_three)):
        yb = np.asarray(jax.jit(f)(x, w), np.float32)
        err = np.max(np.abs(ya - yb))
        print(f"{name}: max |delta| vs conv_wide = {err:.3e}", flush=True)
        assert err < 0.25, (name, err)  # bf16 sum-order tolerance

    def chain(f, grad):
        if grad:
            def loss(xx, w):
                return jnp.sum(f(xx, w).astype(jnp.float32) ** 2)
            g = jax.grad(loss, argnums=(0, 1))

            @jax.jit
            def run(x0):
                def body(carry, _):
                    gx, gw = g(carry, w)
                    return carry + (1e-12 * gx).astype(carry.dtype), ()
                y, _ = lax.scan(body, x0, None, length=STEPS)
                return jnp.sum(y[0, 0, 0])
        else:
            @jax.jit
            def run(x0):
                def body(carry, _):
                    y = f(carry, w)
                    return (carry + 1e-12 * y).astype(carry.dtype), ()
                y, _ = lax.scan(body, x0, None, length=STEPS)
                return jnp.sum(y[0, 0, 0])
        return run

    for grad in (False, True):
        tag = "fwd+grad" if grad else "fwd     "
        runs = {n: chain(f, grad) for n, f in
                (("conv", f_conv), ("nine", f_nine), ("three", f_three))}
        for r in runs.values():
            _ = float(r(x))  # compile
        times = {n: [] for n in runs}
        for _ in range(REPS):
            for n, r in runs.items():
                t0 = time.perf_counter()
                _ = float(r(x))
                times[n].append((time.perf_counter() - t0) / STEPS)
        for n, ts in times.items():
            med = sorted(ts)[len(ts) // 2]
            print(f"{tag} {n:6s}: {med * 1e3:7.3f} ms/step "
                  f"(min {min(ts) * 1e3:.3f})", flush=True)


if __name__ == "__main__":
    main()
