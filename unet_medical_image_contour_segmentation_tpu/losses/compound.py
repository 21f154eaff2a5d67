"""The training criterion: CE/BCE + Dice (+ boundary), exactly as the reference.

Reference ``train.py:118-147``:

* binary (n_classes == 1): targets are first integer-divided by 2
  ({0,1,2} -> {0,1}, ``train.py:119``), then
  ``BCEWithLogits(pred, t) + dice_loss(sigmoid(pred), t)
    + 0.25 * boundary_loss(pred, t, edge_width=51, edge_weight=15)``.
* multiclass: ``CrossEntropy(pred, t) + dice_loss(softmax(pred),
  one_hot(t), multiclass=True)`` (the epoch-gated boundary term is commented
  out in the reference and is exposed here behind ``multiclass_boundary``).

Shapes are channel-last: logits [B, H, W, C], integer targets [B, H, W].
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .boundary import boundary_loss
from .dice import dice_loss

__all__ = ["LossConfig", "compute_loss", "cross_entropy", "bce_with_logits"]


@dataclasses.dataclass(frozen=True)
class LossConfig:
    n_classes: int = 3
    boundary_weight: float = 0.25   # train.py:134
    boundary_edge_width: int = 51
    boundary_edge_weight: float = 15.0
    multiclass_boundary: bool = False  # reference has this commented out
    # Opt-in connected-component penalty, mirroring the reference's
    # commented-out binary-path block (train.py:124-132).  Non-differentiable
    # (host cv2 round-trip there and pure_callback here): it adds to the loss
    # VALUE only, exactly like the reference's would have contributed no
    # usable gradient signal beyond autograd's zero through .cpu().numpy().
    connected_component: bool = False
    cc_edge_distance: int = 50      # train.py:127
    cc_min_area: int = 1000         # train.py:128
    cc_penalty_weight: float = 0.1  # train.py:129
    # How the (host-side) penalty reaches the loss.  False: a pure_callback
    # inside the traced step — exact reference semantics, but some PJRT
    # plugins (the tunneled 'axon' TPU) don't support host callbacks.
    # True: emit ``metrics["cc_probs"]`` (stop-gradient sigmoid) and let the
    # caller add the penalty host-side — engine/train.py folds it into the
    # logged loss on its existing 1-step-delayed metrics fetch.
    cc_emit_probs: bool = False


def _mean(x: jnp.ndarray, axis_name) -> jnp.ndarray:
    m = jnp.mean(x)
    if axis_name is not None:
        m = jax.lax.pmean(m, axis_name)  # equal shard sizes -> exact global mean
    return m


def cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray, axis_name=None) -> jnp.ndarray:
    """Mean CE over all pixels (torch nn.CrossEntropyLoss default)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32), axis=-1)
    return -_mean(picked, axis_name)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray, axis_name=None) -> jnp.ndarray:
    """Mean BCEWithLogits (stable formulation)."""
    x = logits.astype(jnp.float32)
    z = targets.astype(jnp.float32)
    return _mean(jnp.maximum(x, 0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x))), axis_name)


def metric_keys(cfg: "LossConfig") -> Tuple[str, ...]:
    """The exact metric-dict keys :func:`compute_loss` emits for ``cfg``.

    Single source of truth for callers that need the pytree structure before
    tracing (the shard_map out_specs in parallel/data_parallel.py); a test
    asserts it matches an actual compute_loss call for every branch.
    """
    if cfg.n_classes == 1:
        keys = ["ce", "dice", "boundary"]
        if cfg.connected_component:
            keys.append("cc_probs" if cfg.cc_emit_probs else "cc")
        return tuple(keys + ["loss"])
    keys = ["ce", "dice", "loss"]
    if cfg.multiclass_boundary:
        keys.append("boundary")
    return tuple(keys)


def compute_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    cfg: LossConfig,
    axis_name=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Compound loss + per-term metrics.  logits [B,H,W,C], targets int [B,H,W].

    With ``axis_name`` set (inside shard_map over a data mesh axis) every term
    reduces over the *global* batch, so the loss and its gradients match a
    single device seeing the unsharded batch.
    """
    if cfg.n_classes == 1:
        t = (targets // 2).astype(jnp.float32)  # {0,1,2} -> {0,1} (train.py:119)
        pred = logits[..., 0]
        ce = bce_with_logits(pred, t, axis_name)
        dl = dice_loss(
            jax.nn.sigmoid(pred.astype(jnp.float32)), t,
            multiclass=False, axis_name=axis_name,
        )
        bl = boundary_loss(
            pred, t,
            edge_width=cfg.boundary_edge_width,
            edge_weight=cfg.boundary_edge_weight,
            axis_name=axis_name,
        )
        loss = ce + dl + cfg.boundary_weight * bl
        metrics = {"ce": ce, "dice": dl, "boundary": bl}
        if cfg.connected_component:
            probs = jax.lax.stop_gradient(jax.nn.sigmoid(pred.astype(jnp.float32)))
            if cfg.cc_emit_probs:
                metrics["cc_probs"] = probs  # caller adds the penalty host-side
            else:
                from .connected_component import as_jax_callback

                # stop_gradient on the INPUT: pure_callback has no JVP rule, so
                # the tangent must be symbolically zero before it reaches it
                cc = as_jax_callback(
                    edge_distance=cfg.cc_edge_distance,
                    min_area=cfg.cc_min_area,
                    penalty_weight=cfg.cc_penalty_weight,
                )(probs)
                if axis_name is not None:
                    cc = jax.lax.pmean(cc, axis_name)
                loss = loss + cc
                metrics["cc"] = cc
        metrics["loss"] = loss
        return loss, metrics

    ce = cross_entropy(logits, targets, axis_name)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(targets, cfg.n_classes, dtype=jnp.float32)
    dl = dice_loss(probs, onehot, multiclass=True, axis_name=axis_name)
    loss = ce + dl
    metrics = {"ce": ce, "dice": dl, "loss": loss}
    if cfg.multiclass_boundary:
        bl = boundary_loss(
            logits, targets.astype(jnp.float32),
            edge_width=cfg.boundary_edge_width,
            edge_weight=7.0,  # the commented-out reference value (train.py:147)
            axis_name=axis_name,
        )
        loss = loss + cfg.boundary_weight * bl
        metrics.update({"boundary": bl, "loss": loss})
    return loss, metrics
