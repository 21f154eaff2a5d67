#!/usr/bin/env python
"""1024^2 predict-side conv-regime probe (VERDICT r2 item 7).

Train-side H->batch folding landed in r2 (+18%); the eval forward stayed
unfolded because the folded FORWARD is ~11% slower at 512^2 (overlap
copies).  At 1024^2 the level-0/1 planes (H*W' = 131072 / 65536) are 4x/2x
past the slow-regime edge (H_FOLD_PLANE = 32768), so folding *some* levels
may still win on the forward.  Variants, interleaved in one process:

  nofold      — current production path (h_fold=False everywhere)
  fold-all    — fold every conv whose plane exceeds 32768 (levels 0-2ish)
  fold-l0     — threshold 100k: folds only the 1024-res level-0 convs
  fold-l01    — threshold 50k: folds levels 0 and 1

Patching: the eval path pins h_fold=False at its call sites, so the probe
monkeypatches ops.wide.conv_wide/conv_wide_split to force h_fold=True and
varies ops.wide.H_FOLD_PLANE (read at trace time) per variant.

Usage:  python benchmarks/probe_1024.py [--steps 64] [--batch 2] [--reps 3]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--hw", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    import unet_medical_image_contour_segmentation_tpu.ops.wide as Wmod
    from unet_medical_image_contour_segmentation_tpu.engine.evaluate import eval_forward
    from unet_medical_image_contour_segmentation_tpu.engine.train import init_train_state
    from unet_medical_image_contour_segmentation_tpu.models.fold_bn import fold_params
    from unet_medical_image_contour_segmentation_tpu.models.unet import get_model

    hw = (args.hw, args.hw)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((args.batch, *hw), np.float32))
    _ = float(jnp.sum(image))  # readback warmup

    model = get_model("unet_s", n_channels=1, n_classes=3,
                      compute_dtype=jnp.bfloat16)
    state = init_train_state(model, jax.random.PRNGKey(0))
    folded = fold_params(state.params, state.bn_state)

    orig_conv = Wmod.conv_wide
    orig_split = Wmod.conv_wide_split

    def force_conv(x, w, bw, bias=None, compute_dtype=None, stride=1,
                   h_fold=True):
        return orig_conv(x, w, bw, bias, compute_dtype, stride, True)

    def force_split(xs, channels, w, bw, bias=None, compute_dtype=None,
                    h_fold=True):
        return orig_split(xs, channels, w, bw, bias, compute_dtype, True)

    def build_chain():
        @jax.jit
        def chain(x):
            def body(carry, _):
                pred = eval_forward(model, 3, folded, None, carry)
                return carry + 1e-12 * pred.astype(carry.dtype), ()
            y, _ = lax.scan(body, x, None, length=args.steps)
            return jnp.sum(y[0, 0])
        return chain

    variants = {}
    variants["nofold"] = (False, None)
    variants["fold-all"] = (True, 32768)
    variants["fold-l01"] = (True, 50000)
    variants["fold-l0"] = (True, 100000)

    chains = {}
    ref_pred = None
    for name, (force, plane) in variants.items():
        if force:
            Wmod.conv_wide, Wmod.conv_wide_split = force_conv, force_split
            Wmod.H_FOLD_PLANE = plane
        try:
            fn = build_chain()
            t0 = time.perf_counter()
            val = float(fn(image))  # compile (trace happens under the patch)
            print(f"compiled {name} in {time.perf_counter() - t0:.1f}s "
                  f"(chain fingerprint {val:.6f})", file=sys.stderr)
            if ref_pred is None:
                ref_pred = val
            elif abs(val - ref_pred) > 1e-3 * max(1.0, abs(ref_pred)):
                print(f"  WARNING: {name} fingerprint differs from nofold: "
                      f"{val} vs {ref_pred}", file=sys.stderr)
            chains[name] = fn
        finally:
            Wmod.conv_wide, Wmod.conv_wide_split = orig_conv, orig_split
            Wmod.H_FOLD_PLANE = 32768

    results = {k: [] for k in chains}
    for rep in range(args.reps):
        for name, fn in chains.items():
            t0 = time.perf_counter()
            _ = float(fn(image))
            results[name].append((time.perf_counter() - t0) / args.steps * 1e3)

    print(f"\n== eval fwd per-step ms (batch {args.batch}, {args.hw}^2, "
          f"{args.steps}-step chains, {args.reps} interleaved reps) ==")
    for name, ts in results.items():
        med = sorted(ts)[len(ts) // 2]
        sps = args.batch / (med / 1e3)
        print(f"{name:10s} {med:8.2f} ms  = {sps:6.1f} slices/s   "
              f"{[f'{t:.2f}' for t in ts]}")


if __name__ == "__main__":
    main()
