"""Probe: END-TO-END int8 predict forward vs the bf16 fused path (unet_s).

The op-level probe (probe_int8.py) showed int8 block convs beat bf16 at
every unet_s level (1.36x/1.09x/1.12x with the requant epilogue).  This
measures the whole production predict program — quantized forward incl.
requant round trips, float upsample/head, fused class-major argmax — against
the bench.py predict chain (BN-folded bf16 fused path), interleaved A/B in
one process, 128-step chains, one device fetch per chain (CLAUDE.md rules).

Run:  python benchmarks/probe_int8_e2e.py [--hw 512] [--batch 8] [--steps 128]
"""
from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")

from unet_medical_image_contour_segmentation_tpu.engine.evaluate import (  # noqa: E402
    eval_forward,
)
from unet_medical_image_contour_segmentation_tpu.losses.s2d_fused import (  # noqa: E402
    argmax_class_major,
)
from unet_medical_image_contour_segmentation_tpu.models import quantize as Q  # noqa: E402
from unet_medical_image_contour_segmentation_tpu.models.fold_bn import (  # noqa: E402
    fold_params,
)
from unet_medical_image_contour_segmentation_tpu.models.unet import get_model  # noqa: E402
from unet_medical_image_contour_segmentation_tpu.ops.wide import unpack_pred  # noqa: E402


def time_chain(chain, x0, steps, reps=3):
    _ = float(chain(x0))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(chain(x0))
        ts.append((time.perf_counter() - t0) / steps * 1e3)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--batches", default=None,
                    help="comma list, e.g. 1,2,4,8: sweep batch sizes in ONE "
                         "process (each pays no fresh readback warmup); "
                         "overrides --batch")
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--model", default="unet_s")
    args = ap.parse_args()

    print(f"platform={jax.devices()[0].platform}", flush=True)
    _ = float(jnp.sum(jnp.ones((8, 128))))  # tunnel warmup fetch
    print("warmed", flush=True)

    batches = ([int(b) for b in args.batches.split(",")] if args.batches
               else [args.batch])
    for b in batches:
        run_one(args.model, args.hw, b, args.steps)


def run_one(model_name, hw, batch, steps):
    model = get_model(model_name, n_channels=1, n_classes=3,
                      compute_dtype=jnp.bfloat16)
    params, state = model.init(jax.random.PRNGKey(0))
    folded = fold_params(params, state)
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(batch, hw, hw), jnp.float32)
    calib = image[:2] if batch >= 2 else jnp.asarray(
        rng.rand(2, hw, hw), jnp.float32)
    qparams = Q.quantize_unet(model, folded, calib)
    n_steps = steps
    print(f"--- {model_name} {hw}² b={batch} ---", flush=True)

    @jax.jit
    def chain_f(x):
        def body(carry, _):
            pred = eval_forward(model, 3, folded, None, carry)
            return carry + 1e-12 * pred.astype(carry.dtype), ()
        out, _ = lax.scan(body, x, None, length=n_steps)
        return jnp.sum(out[0, 0, 0])

    @jax.jit
    def chain_q(x):
        def body(carry, _):
            cm, blk = Q.apply_wide_int8(model, qparams, carry,
                                        unpack_output=False, class_major=True)
            pred = unpack_pred(blk, argmax_class_major(cm, 3))
            return carry + 1e-12 * pred.astype(carry.dtype), ()
        out, _ = lax.scan(body, x, None, length=n_steps)
        return jnp.sum(out[0, 0, 0])

    # interleave A/B/A/B to cancel tunnel drift
    t_f1 = time_chain(chain_f, image, n_steps)
    t_q1 = time_chain(chain_q, image, n_steps)
    t_f2 = time_chain(chain_f, image, n_steps)
    t_q2 = time_chain(chain_q, image, n_steps)
    t_f, t_q = min(t_f1, t_f2), min(t_q1, t_q2)
    b = batch
    print(f"bf16 fused : {t_f:.3f} ms/step  ({b / t_f * 1e3:.0f} slices/s)  "
          f"[{t_f1:.3f}, {t_f2:.3f}]")
    print(f"int8       : {t_q:.3f} ms/step  ({b / t_q * 1e3:.0f} slices/s)  "
          f"[{t_q1:.3f}, {t_q2:.3f}]")
    print(f"speedup    : {t_f / t_q:.3f}x")


if __name__ == "__main__":
    main()
