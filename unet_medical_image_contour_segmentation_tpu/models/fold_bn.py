"""Eval-time BatchNorm folding: conv weights absorb the BN affine.

For inference the BN is a fixed per-channel affine
``y = (x - mu) * gamma / sqrt(var + eps) + beta``; folding it into the
preceding conv (w' = w * s, b' = beta - mu * s) removes every BN pass over
the large activation tensors.  Exact for eval mode (tested); training always
uses live statistics and never folds.

Produces a *folded parameter pytree* consumed by the ``folded=True`` path of
the s2d DoubleConv (models/s2d_exec.py) and used automatically by
``engine.predict.Predictor`` when constructed with ``fold_bn=True``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.nn import BN_EPS

__all__ = ["fold_double_conv", "fold_params", "fold_unet_params"]


def _fold(conv_w, bn_params, bn_state, eps=BN_EPS):
    scale = bn_params["scale"] / jnp.sqrt(bn_state["var"] + eps)
    w = conv_w * scale  # broadcast over the HWIO output-channel axis
    b = bn_params["bias"] - bn_state["mean"] * scale
    return {"w": w, "b": b}


def fold_double_conv(params, state):
    """DoubleConv params+BN-state -> {'conv1': {w,b}, 'conv2': {w,b}}."""
    return {
        "conv1": _fold(params["conv1"]["w"], params["bn1"], state["bn1"]),
        "conv2": _fold(params["conv2"]["w"], params["bn2"], state["bn2"]),
    }


def fold_params(params, state):
    """Fold every DoubleConv's BN affine, any topology (UNet, UNet++, ...).

    Walks the param tree in parallel with the BN state tree: a subtree with
    ``bn1``/``bn2`` keys is a DoubleConv and folds; everything else (upconv,
    attention, heads) passes through untouched.  Raises KeyError when no
    DoubleConv is found (caller falls back to live BN).
    """
    n_folded, out = _fold_tree(params, state)
    if n_folded == 0:
        raise KeyError("no DoubleConv (conv+bn) subtrees to fold")
    return out


def _fold_tree(params, state):
    if not isinstance(params, dict):
        return 0, params
    if "bn1" in params:
        return 1, fold_double_conv(params, state)
    n_total, out = 0, {}
    for k, v in params.items():
        if isinstance(v, dict) and isinstance(state, dict) and k in state:
            n, out[k] = _fold_tree(v, state[k])
            n_total += n
        else:
            out[k] = v
    return n_total, out


def fold_unet_params(params, state):
    """UNet-family params -> folded pytree (same topology keys)."""
    return fold_params(params, state)


def fold_yolo_params(params, state):
    """YOLOv8Seg params -> folded pytree: every CBS (conv+BN+SiLU) block
    ``{"conv": {"w"}, "bn": {...}}`` becomes ``{"w", "b"}``; ConvTranspose
    ups and the head pass through.  Used by the int8 serving path
    (models/quantize.py) — the float eval keeps live BN (XLA folds it).
    """
    n, out = _fold_cbs_tree(params, state)
    if n == 0:
        raise KeyError("no CBS (conv+bn) subtrees to fold")
    return out


def _fold_cbs_tree(params, state):
    if not isinstance(params, dict):
        return 0, params
    if "conv" in params and "bn" in params and isinstance(params["conv"], dict):
        return 1, _fold(params["conv"]["w"], params["bn"], state["bn"])
    n_total, out = 0, {}
    for k, v in params.items():
        if isinstance(v, dict) and isinstance(state, dict) and k in state:
            n, out[k] = _fold_cbs_tree(v, state[k])
            n_total += n
        else:
            out[k] = v
    return n_total, out
