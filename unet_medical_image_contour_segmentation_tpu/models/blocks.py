"""Functional UNet building blocks (NHWC), init/apply style.

Re-designs of the reference blocks in ``/root/reference/unet/unet_parts.py``:

* DoubleConv  — (Conv3x3 pad=1 bias=False -> BN -> ReLU) x 2, optional
  ``mid_channels`` (``unet_parts.py:7-24``).
* Down        — MaxPool2d(2) then DoubleConv (``unet_parts.py:26-37``).
* SpatialAttention — channel mean & max -> concat -> Conv k7 pad3 bias=False
  -> sigmoid (``unet_parts.py:39-60``).
* Up          — x2 upsample (bilinear align_corners=True + DoubleConv(in, out,
  mid=in//2) OR ConvTranspose2d(k2,s2) + DoubleConv(in, out)), asymmetric pad
  for odd sizes, optional attention gate on the skip, concat [skip, up]
  (``unet_parts.py:62-98``).
* OutConv     — 1x1 conv to logits (``unet_parts.py:100-106``).

Parameters live in plain nested dicts; BatchNorm running statistics live in a
parallel ``state`` pytree so the whole model stays a pure function
``apply(params, state, x, train) -> (y, new_state)`` suitable for jit/grad/
shard_map.  Initializers reproduce torch defaults so randomly-initialized
training matches the reference distributionally.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.nn import batch_norm, conv2d, conv_transpose2d, max_pool2d
from ..ops.resize import upsample_x2_align_corners

__all__ = [
    "init_conv",
    "init_bn",
    "init_double_conv",
    "init_up",
    "init_out_conv",
    "init_spatial_attention",
    "double_conv_apply",
    "down_apply",
    "up_apply",
    "out_conv_apply",
    "spatial_attention_apply",
]


# ---------------------------------------------------------------------------
# Initializers (torch.nn defaults: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)))
# ---------------------------------------------------------------------------

def init_conv(key, kh: int, kw: int, cin: int, cout: int, bias: bool = False):
    fan_in = cin * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    wkey, bkey = jax.random.split(key)
    p = {"w": jax.random.uniform(wkey, (kh, kw, cin, cout), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(bkey, (cout,), jnp.float32, -bound, bound)
    return p


def init_conv_transpose(key, k: int, cin: int, cout: int, bias: bool = True):
    # torch ConvTranspose2d weight is (cin, cout, k, k); its fan_in is
    # cout * k * k, which sets the init bound.
    fan_in = cout * k * k
    bound = 1.0 / math.sqrt(fan_in)
    wkey, bkey = jax.random.split(key)
    p = {"w": jax.random.uniform(wkey, (k, k, cin, cout), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(bkey, (cout,), jnp.float32, -bound, bound)
    return p


def init_bn(c: int):
    params = {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}
    state = {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)}
    return params, state


def init_double_conv(key, cin: int, cout: int, cmid: Optional[int] = None):
    cmid = cmid or cout
    k1, k2 = jax.random.split(key)
    bn1_p, bn1_s = init_bn(cmid)
    bn2_p, bn2_s = init_bn(cout)
    params = {
        "conv1": init_conv(k1, 3, 3, cin, cmid, bias=False),
        "bn1": bn1_p,
        "conv2": init_conv(k2, 3, 3, cmid, cout, bias=False),
        "bn2": bn2_p,
    }
    state = {"bn1": bn1_s, "bn2": bn2_s}
    return params, state


def init_out_conv(key, cin: int, cout: int):
    return init_conv(key, 1, 1, cin, cout, bias=True)


def init_spatial_attention(key, kernel_size: int = 7):
    return {"conv": init_conv(key, kernel_size, kernel_size, 2, 1, bias=False)}


def init_up(key, cin: int, cout: int, bilinear: bool, use_attention: bool = False):
    """Up block params/state.  cin = channels of (skip + upsampled) concat."""
    kc, kt, ka = jax.random.split(key, 3)
    if bilinear:
        conv_p, conv_s = init_double_conv(kc, cin, cout, cmid=cin // 2)
        params = {"conv": conv_p}
    else:
        conv_p, conv_s = init_double_conv(kc, cin, cout)
        params = {"upconv": init_conv_transpose(kt, 2, cin, cin // 2), "conv": conv_p}
    if use_attention:
        params["att"] = init_spatial_attention(ka)
    return params, {"conv": conv_s}


# ---------------------------------------------------------------------------
# Apply functions
# ---------------------------------------------------------------------------

def double_conv_apply(params, state, x, *, train: bool, compute_dtype=None, axis_name=None):
    y = conv2d(x, params["conv1"]["w"], padding=1, compute_dtype=compute_dtype)
    y, bn1 = batch_norm(
        y, params["bn1"]["scale"], params["bn1"]["bias"],
        state["bn1"]["mean"], state["bn1"]["var"],
        train=train, axis_name=axis_name,
    )
    y = jax.nn.relu(y)
    y = conv2d(y, params["conv2"]["w"], padding=1, compute_dtype=compute_dtype)
    y, bn2 = batch_norm(
        y, params["bn2"]["scale"], params["bn2"]["bias"],
        state["bn2"]["mean"], state["bn2"]["var"],
        train=train, axis_name=axis_name,
    )
    y = jax.nn.relu(y)
    new_state = {"bn1": {"mean": bn1[0], "var": bn1[1]}, "bn2": {"mean": bn2[0], "var": bn2[1]}}
    return y, new_state


def down_apply(params, state, x, *, train: bool, compute_dtype=None, axis_name=None):
    return double_conv_apply(
        params, state, max_pool2d(x, 2),
        train=train, compute_dtype=compute_dtype, axis_name=axis_name,
    )


def spatial_attention_apply(params, x, *, compute_dtype=None):
    # Attention map from channel-wise mean & max; computed in f32 for a stable
    # sigmoid (matches fp32-autocast behavior of sigmoid in torch).
    avg = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
    mx = jnp.max(x.astype(jnp.float32), axis=-1, keepdims=True)
    feats = jnp.concatenate([avg, mx], axis=-1).astype(x.dtype)
    att = conv2d(feats, params["conv"]["w"], padding=3, compute_dtype=compute_dtype)
    return jax.nn.sigmoid(att.astype(jnp.float32)).astype(x.dtype)


def _pad_to_match(x1, x2):
    """Asymmetric pad of x1 (NHWC) to x2's spatial size (unet_parts.py:85-88)."""
    dh = x2.shape[1] - x1.shape[1]
    dw = x2.shape[2] - x1.shape[2]
    if dh == 0 and dw == 0:
        return x1
    return jnp.pad(
        x1,
        ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)),
    )


def up_apply(params, state, x1, x2, *, bilinear: bool, train: bool,
             compute_dtype=None, axis_name=None):
    """x1: decoder feature to upsample; x2: encoder skip."""
    if bilinear:
        x1 = upsample_x2_align_corners(x1)
    else:
        x1 = conv_transpose2d(
            x1, params["upconv"]["w"], params["upconv"].get("b"),
            stride=2, compute_dtype=compute_dtype,
        )
    x1 = _pad_to_match(x1, x2)
    if "att" in params:
        x2 = x2 * spatial_attention_apply(params["att"], x2, compute_dtype=compute_dtype)
    x = jnp.concatenate([x2, x1.astype(x2.dtype)], axis=-1)
    y, conv_s = double_conv_apply(
        params["conv"], state["conv"], x,
        train=train, compute_dtype=compute_dtype, axis_name=axis_name,
    )
    return y, {"conv": conv_s}


def out_conv_apply(params, x, *, compute_dtype=None):
    return conv2d(x, params["w"], params.get("b"), compute_dtype=compute_dtype)
