"""Optimizer + LR schedule with exact torch semantics.

The reference trains with ``optim.RMSprop(lr=1e-5, weight_decay=1e-8,
momentum=0.999, foreach=True)`` (``train.py:80-81``) and
``CosineAnnealingWarmRestarts(T_0=4, T_mult=2, eta_min=1e-7)``
(``train.py:83``).  Torch's RMSprop-with-momentum differs from optax's
(``sqrt(avg) + eps`` vs ``sqrt(avg + eps)``, and the momentum buffer
accumulates the *preconditioned* grad), so the update rule is ported exactly
for convergence parity (SURVEY.md §7 "hard parts").

Gradient clipping matches ``torch.nn.utils.clip_grad_norm_(max_norm)``:
``coef = max_norm / (total_norm + 1e-6)`` clamped to 1.

Scheduler quirk: the reference calls ``scheduler.step(val_score)`` — passing
the **Dice score** as the "epoch" argument (``train.py:187``, a leftover from
a commented ReduceLROnPlateau).  ``warm_restarts_lr(t)`` reproduces torch's
closed form for arbitrary float ``t``, so both the faithful quirk mode and a
sane epoch-stepped mode are available (engine/train.py chooses via config).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "RMSpropConfig",
    "init_rmsprop",
    "rmsprop_update",
    "clip_by_global_norm",
    "warm_restarts_lr",
    "global_norm",
]


@dataclasses.dataclass(frozen=True)
class RMSpropConfig:
    learning_rate: float = 1e-5
    alpha: float = 0.99         # torch default smoothing constant
    eps: float = 1e-8
    weight_decay: float = 1e-8
    momentum: float = 0.999


def init_rmsprop(params) -> dict:
    zeros = lambda: jax.tree.map(jnp.zeros_like, params)
    return {"square_avg": zeros(), "momentum_buf": zeros()}


def rmsprop_update(
    params,
    grads,
    opt_state: dict,
    cfg: RMSpropConfig,
    lr,
) -> Tuple[Any, dict]:
    """One torch-RMSprop step.  ``lr`` may be a traced scalar (schedule)."""

    def upd(p, g, sq, buf):
        g = g + cfg.weight_decay * p
        sq = cfg.alpha * sq + (1.0 - cfg.alpha) * jnp.square(g)
        avg = jnp.sqrt(sq) + cfg.eps  # torch: eps OUTSIDE the sqrt
        if cfg.momentum > 0:
            buf = cfg.momentum * buf + g / avg
            p = p - lr * buf
        else:
            p = p - lr * g / avg
        return p, sq, buf

    flat = jax.tree.map(
        upd, params, grads, opt_state["square_avg"], opt_state["momentum_buf"],
        is_leaf=lambda x: isinstance(x, jnp.ndarray),
    )
    new_params = jax.tree.map(lambda t: t[0], flat, is_leaf=lambda x: isinstance(x, tuple))
    new_sq = jax.tree.map(lambda t: t[1], flat, is_leaf=lambda x: isinstance(x, tuple))
    new_buf = jax.tree.map(lambda t: t[2], flat, is_leaf=lambda x: isinstance(x, tuple))
    return new_params, {"square_avg": new_sq, "momentum_buf": new_buf}


def global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves))


def clip_by_global_norm(grads, max_norm: float):
    """torch.nn.utils.clip_grad_norm_ semantics.  Returns (clipped, total_norm)."""
    total = global_norm(grads)
    coef = jnp.minimum(max_norm / (total + 1e-6), 1.0)
    return jax.tree.map(lambda g: g * coef, grads), total


def warm_restarts_lr(
    t: Any,
    base_lr: float,
    T_0: int = 4,
    T_mult: int = 2,
    eta_min: float = 1e-7,
):
    """lr at "epoch" ``t`` under CosineAnnealingWarmRestarts (torch closed form).

    Accepts python floats or traced scalars.  For ``t < T_0`` (always the case
    in the reference's quirk mode where t is a Dice score):
    ``T_cur = t, T_i = T_0``.
    """
    t = jnp.asarray(t, jnp.float32)
    if T_mult == 1:
        t_cur = jnp.mod(t, T_0)
        t_i = jnp.float32(T_0)
    else:
        ratio = t / T_0 * (T_mult - 1) + 1.0
        n = jnp.floor(jnp.log(jnp.maximum(ratio, 1.0)) / math.log(T_mult))
        geo = (jnp.power(jnp.float32(T_mult), n) - 1.0) / (T_mult - 1)
        t_cur = jnp.where(t >= T_0, t - T_0 * geo, t)
        t_i = jnp.where(t >= T_0, T_0 * jnp.power(jnp.float32(T_mult), n), jnp.float32(T_0))
    return eta_min + (base_lr - eta_min) * (1.0 + jnp.cos(jnp.pi * t_cur / t_i)) / 2.0
