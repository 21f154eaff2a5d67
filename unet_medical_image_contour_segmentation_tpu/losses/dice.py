"""Dice coefficient / loss with exact reference semantics.

Reference: ``/root/reference/utils/dice_score.py:5-36``.

* ``dice_coeff(input, target, reduce_batch_first)``: with
  ``reduce_batch_first=False`` computes per-sample dice over the trailing two
  dims and averages; with ``True`` (and 3-D input) computes ONE global dice
  over all dims.  The reference substitutes ``sets_sum = inter`` wherever
  ``sets_sum == 0`` (dice_score.py:16) — an empty/empty pair scores 1.0.
* ``dice_loss = 1 - dice_coeff(..., reduce_batch_first=True)``; the multiclass
  variant flattens (B, C) first, which combined with global reduction is one
  global dice over batch x class x pixels.

Shapes here follow the framework's channel-last convention: binary tensors are
``[B, H, W]``; multiclass are ``[B, H, W, C]`` (the global reductions make the
channel position irrelevant for the loss value).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["dice_coeff", "multiclass_dice_coeff", "dice_loss"]


def _dice(inter_sum, sets_sum, epsilon):
    sets_sum = jnp.where(sets_sum == 0, inter_sum, sets_sum)
    return (inter_sum + epsilon) / (sets_sum + epsilon)


def dice_coeff(
    input: jnp.ndarray,
    target: jnp.ndarray,
    reduce_batch_first: bool = False,
    epsilon: float = 1e-6,
) -> jnp.ndarray:
    """Mean dice over batch, or one global dice if ``reduce_batch_first``."""
    assert input.shape == target.shape
    assert input.ndim == 3 or not reduce_batch_first
    if input.ndim == 2 or not reduce_batch_first:
        sum_axes = (-1, -2)
    else:
        sum_axes = (-1, -2, -3)
    inter = 2 * jnp.sum(input * target, axis=sum_axes)
    sets_sum = jnp.sum(input, axis=sum_axes) + jnp.sum(target, axis=sum_axes)
    return jnp.mean(_dice(inter, sets_sum, epsilon))


def multiclass_dice_coeff(
    input: jnp.ndarray,
    target: jnp.ndarray,
    reduce_batch_first: bool = False,
    epsilon: float = 1e-6,
) -> jnp.ndarray:
    """Dice over a [B, H, W, C] (or [B, C, H, W]) pair, classes flattened into batch."""
    b = input.shape[0]
    return dice_coeff(
        input.reshape(b * _num_classes(input), *_spatial(input)),
        target.reshape(b * _num_classes(target), *_spatial(target)),
        reduce_batch_first,
        epsilon,
    )


def _num_classes(x):
    return x.shape[1] if x.ndim == 4 else 1


def _spatial(x):
    return x.shape[2:] if x.ndim == 4 else x.shape[1:]


def dice_loss(
    input: jnp.ndarray,
    target: jnp.ndarray,
    multiclass: bool = False,
    axis_name=None,
    epsilon: float = 1e-6,
) -> jnp.ndarray:
    """1 - global dice.  For multiclass pass channel-last [B, H, W, C] — the
    global reduction makes it equal to the reference's [B, C, H, W] call.

    ``axis_name``: inside shard_map over a data mesh axis, the global sums are
    psum'd across shards *before* the ratio, so data-parallel training gets
    bitwise-equivalent loss/gradients to a single device seeing the full batch.
    """
    inter = 2 * jnp.sum(input * target)
    sets_sum = jnp.sum(input) + jnp.sum(target)
    if axis_name is not None:
        inter = lax.psum(inter, axis_name)
        sets_sum = lax.psum(sets_sum, axis_name)
    return 1.0 - _dice(inter, sets_sum, epsilon)
