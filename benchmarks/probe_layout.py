#!/usr/bin/env python
"""Does storing wide activations (H, W', B, C) kill the layout-transpose copies?

The r3 profile (probe_profile.py, CLAUDE.md) showed 24% of the unet_s train
step is XLA copies — layout assignment transposes activations from the
default (B, H, W', 128){3,2,1,0} to {3,0,2,1}, i.e. physical order
(H, W', B, lanes): conv weight-grads want BATCH in the sublane dim.  If the
tensor were stored (H, W', B, C) to begin with, row-major already IS that
order, and the forward conv's im2col (positions x features) is
order-indifferent.  This probes one level-0-shaped conv fwd+wgrad in both
storage orders, interleaved A/B per CLAUDE.md's drift rule, and counts HLO
copies in each compiled step.
"""
import re
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

B, H, WP, C = 8, 512, 64, 128
STEPS = 64
DN_BHWC = ("NHWC", "HWIO", "NHWC")
DN_HWBC = ("HWNC", "HWIO", "HWNC")


def make_step(dn, x_shape):
    """Two stacked convs: the INTERMEDIATE activation is produced inside the
    step, so its layout matters every iteration (matching the real model,
    where the copies sit between producer and consumer convs)."""
    def loss(ws, x):
        w1, w2 = ws
        h = lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w1.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=dn)
        h = jax.nn.relu(h)
        y = lax.conv_general_dilated(
            h, w2.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=dn)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    @jax.jit
    def chain(ws, x):
        def body(carry, _):
            g = jax.grad(loss)(carry, x)
            return jax.tree.map(lambda c, gg: c - 1e-12 * gg, carry, g), ()
        w2, _ = lax.scan(body, ws, None, length=STEPS)
        return jnp.sum(jax.tree.leaves(w2)[0].astype(jnp.float32))

    return chain


def main():
    rng = np.random.default_rng(0)
    w = (jnp.asarray(rng.random((3, 3, C, C), np.float32)),
         jnp.asarray(rng.random((3, 3, C, C), np.float32)))
    x_b = jnp.asarray(rng.random((B, H, WP, C), np.float32))
    x_h = jnp.transpose(x_b, (1, 2, 0, 3))
    _ = float(jnp.sum(x_b))  # readback warmup

    variants = {
        "BHWC (current)": (make_step(DN_BHWC, x_b.shape), x_b),
        "HWBC (batch-sublane)": (make_step(DN_HWBC, x_h.shape), x_h),
    }
    for name, (chain, x) in variants.items():
        txt = chain.lower(w, x).compile().as_text()
        n_copies = len(re.findall(r"\} copy\(", txt))
        print(f"{name}: {n_copies} HLO copies in the compiled chain")
        _ = float(chain(w, x))  # compile+run

    for rep in range(3):  # interleaved A/B
        out = []
        for name, (chain, x) in variants.items():
            t0 = time.perf_counter()
            _ = float(chain(w, x))
            out.append(f"{name} {(time.perf_counter() - t0) / STEPS * 1e3:6.3f} ms")
        print(f"rep{rep}: " + " | ".join(out), flush=True)


if __name__ == "__main__":
    main()
