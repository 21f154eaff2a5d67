"""Fused multiclass loss on class-major s2d logits — no padded NHWC tensors.

The standard loss path d2s's the logits to (B, H, W, n_classes); with
n_classes=3 that tensor is padded 3 -> 128 lanes in HBM (~42x its logical
bytes), and softmax/one_hot/CE each pay the traffic.  Here the loss consumes
the logits directly in class-major s2d layout (``models/s2d_exec.apply_s2d``
with ``class_major=True``): per-class tensors are contiguous dense lane
slices, so CE + Dice reduce to elementwise ops and global sums — numerically
identical to losses/compound.compute_loss (tested).

Only the multiclass criterion is fused (the reference's default, classes=3);
the binary path's boundary loss needs pixel-order strips and keeps the NHWC
route.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .compound import LossConfig
from .dice import _dice

__all__ = ["compute_loss_s2d_multiclass", "argmax_class_major"]


def _class_slices(logits_cm: jnp.ndarray, n_classes: int):
    """Split class-major lanes (C*g) into C contiguous (..., g) slices."""
    g = logits_cm.shape[-1] // n_classes
    return [logits_cm[..., c * g : (c + 1) * g] for c in range(n_classes)], g


def argmax_class_major(logits_cm: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    """argmax over classes -> (..., g) int32 s2d map (first max wins, like jnp)."""
    slices, _ = _class_slices(logits_cm, n_classes)
    best = slices[0]
    idx = jnp.zeros(best.shape, jnp.int32)
    for c in range(1, n_classes):
        take = slices[c] > best
        best = jnp.where(take, slices[c], best)
        idx = jnp.where(take, jnp.int32(c), idx)
    return idx


def compute_loss_s2d_multiclass(
    logits_cm: jnp.ndarray,
    targets_s2d: jnp.ndarray,
    cfg: LossConfig,
    axis_name=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """CE + global Dice on class-major s2d logits and s2d integer targets.

    logits_cm: (B, H/b, W/b, n_classes*g) f32; targets_s2d: (B, H/b, W/b, g).
    Exactly equals compound.compute_loss on the d2s'd tensors.
    """
    n = cfg.n_classes
    slices, g = _class_slices(logits_cm.astype(jnp.float32), n)

    # stable log-softmax over the class slices
    mx = slices[0]
    for c in range(1, n):
        mx = jnp.maximum(mx, slices[c])
    exps = [jnp.exp(s - mx) for s in slices]
    denom = sum(exps)
    log_denom = jnp.log(denom) + mx

    # local sums (shard-local when axis_name is set)
    t = targets_s2d.astype(jnp.int32)
    picked = sum(jnp.where(t == c, slices[c], 0.0) for c in range(n))
    ce_sum = jnp.sum(log_denom - picked)
    count = jnp.float32(t.size)

    inter = jnp.float32(0.0)
    prob_sum = jnp.float32(0.0)
    for c in range(n):
        prob_c = exps[c] / denom
        hot_c = (t == c).astype(jnp.float32)
        inter = inter + jnp.sum(prob_c * hot_c)
        prob_sum = prob_sum + jnp.sum(prob_c)

    if axis_name is not None:
        ce_sum, count, inter, prob_sum = jax.lax.psum(
            (ce_sum, count, inter, prob_sum), axis_name
        )

    ce = ce_sum / count
    # one-hot sums to exactly one per pixel, so its global sum is `count`
    dl = 1.0 - _dice(2.0 * inter, prob_sum + count, 1e-6)

    loss = ce + dl
    return loss, {"ce": ce, "dice": dl, "loss": loss}
