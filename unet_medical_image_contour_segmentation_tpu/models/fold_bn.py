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

__all__ = ["fold_double_conv", "fold_unet_params"]


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


def fold_unet_params(params, state):
    """UNet-family params -> folded pytree (same topology keys).

    Up blocks keep their upconv/attention entries; only Conv+BN pairs fold.
    """
    folded = {"inc": fold_double_conv(params["inc"], state["inc"])}
    for i in range(1, 5):
        folded[f"down{i}"] = fold_double_conv(params[f"down{i}"], state[f"down{i}"])
    for i in range(1, 5):
        p = dict(params[f"up{i}"])
        entry = {"conv": fold_double_conv(p["conv"], state[f"up{i}"]["conv"])}
        if "upconv" in p:
            entry["upconv"] = p["upconv"]
        if "att" in p:
            entry["att"] = p["att"]
        folded[f"up{i}"] = entry
    folded["outc"] = params["outc"]
    return folded
