"""Space-to-depth execution of the UNet forward (exact, fast on TPU).

Same parameters, same numerics as the NHWC path in ``models/blocks.py`` —
only the on-device layout differs: every level runs at a block size chosen so
activations keep >= 128 dense lanes (see ``ops/s2d.py`` for why this is worth
~4-10x on the small-channel levels).  Used when ``UNet.layout == "s2d"``;
both upsampling modes run in lane space (ConvTranspose k2s2 as a block
matmul, bilinear align_corners=True as banded block matmuls); spatial dims
must divide 16 * block.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import s2d as S
from ..ops.nn import max_pool2d

__all__ = ["supports_s2d", "apply_s2d"]


def _widths_from_params(params):
    """Actual per-level widths — the params are the truth, not model.widths
    (a checkpoint of any variant may be loaded into any UNet shell, as the
    reference's predict CLI does with its hardcoded UNet)."""
    keys = ["inc", "down1", "down2", "down3", "down4"]
    return tuple(int(params[k]["conv2"]["w"].shape[-1]) for k in keys)


def output_block(model, params=None) -> int:
    """Block size of the s2d logits (level-0 plan entry)."""
    w0 = _widths_from_params(params)[0] if params is not None else model.widths[0]
    return S.block_for_channels(w0)


def supports_s2d(model, x_shape) -> bool:
    if len(x_shape) == 3:
        x_shape = (*x_shape, 1)
    h, w = x_shape[1], x_shape[2]
    # conservative: divisible for the largest possible block plan (b0 = 4),
    # since the loaded params may be narrower than model.widths declares
    need = 16 * 4
    return h % need == 0 and w % need == 0


def _double_conv(params, state, x, b, cin_unused, *, train, cd, axis_name):
    """DoubleConv in s2d-b layout; returns (y, new_state).

    Folded eval params (no ``bn*`` keys, conv biases carry the BN affine —
    models/fold_bn.py) skip the BatchNorm passes entirely.
    """
    if "bn1" not in params:  # BN-folded inference path
        assert not train, "folded parameters are eval-only"
        y = S.conv_s2d(x, params["conv1"]["w"], b, params["conv1"]["b"],
                       compute_dtype=cd)
        y = jax.nn.relu(y)
        y = S.conv_s2d(y, params["conv2"]["w"], b, params["conv2"]["b"],
                       compute_dtype=cd)
        return jax.nn.relu(y), {}
    y = S.conv_s2d(x, params["conv1"]["w"], b, compute_dtype=cd)
    y, bn1 = S.batch_norm_s2d(
        y, params["bn1"]["scale"], params["bn1"]["bias"],
        state["bn1"]["mean"], state["bn1"]["var"], b,
        train=train, axis_name=axis_name,
    )
    y = jax.nn.relu(y)
    y = S.conv_s2d(y, params["conv2"]["w"], b, compute_dtype=cd)
    y, bn2 = S.batch_norm_s2d(
        y, params["bn2"]["scale"], params["bn2"]["bias"],
        state["bn2"]["mean"], state["bn2"]["var"], b,
        train=train, axis_name=axis_name,
    )
    y = jax.nn.relu(y)
    return y, {"bn1": {"mean": bn1[0], "var": bn1[1]}, "bn2": {"mean": bn2[0], "var": bn2[1]}}


def _pool(x, b):
    """MaxPool2d(2): block b -> b/2 in lane space, or spatial pool at b == 1."""
    if b >= 2:
        return S.max_pool2_s2d(x, b), b // 2
    return max_pool2d(x, 2), 1


def _attention(params, x, b, c, *, cd):
    """SpatialAttention on an s2d-b skip tensor (exact reference semantics)."""
    g = b * b
    xg = x.astype(jnp.float32).reshape(*x.shape[:-1], g, c)
    avg = jnp.mean(xg, axis=-1)                      # (..., g)
    mx = jnp.max(xg, axis=-1)                        # (..., g)
    feats = jnp.stack([avg, mx], axis=-1)            # (..., g, 2)
    feats = feats.reshape(*x.shape[:-1], g * 2).astype(x.dtype)
    att = S.conv_s2d(feats, params["conv"]["w"], b, compute_dtype=cd)  # (..., g*1)
    att = jax.nn.sigmoid(att.astype(jnp.float32)).astype(x.dtype)
    y = xg.astype(x.dtype) * att[..., None]
    return y.reshape(x.shape)


def apply_s2d(model, params, state, x, *, train: bool = False, axis_name=None,
              d2s_output: bool = True, class_major: bool = False):
    """Forward in s2d layout.  Returns (logits, new_state).

    ``d2s_output=False`` leaves the logits in s2d-b0 layout for the fused
    loss/eval paths; with ``class_major=True`` the lanes are ordered
    (class, dy, dx) so per-class tensors are contiguous slices
    (losses/s2d_fused.py).  Call with the defaults to get NHWC logits.
    """
    if x.ndim == 3:  # rank-3 single-channel input (dense program layout)
        x = x[..., None]
    assert not (class_major and d2s_output), "class-major lanes cannot be d2s'd"
    w = _widths_from_params(params)
    cd = model.compute_dtype
    ckpt = (lambda f: jax.checkpoint(f)) if model.remat else (lambda f: f)

    blocks = [S.block_for_channels(c) for c in w]   # encoder block plan
    new_state = {}

    def dc(name, x, b):
        fn = ckpt(lambda p, s, t: _double_conv(p, s, t, b, None, train=train,
                                               cd=cd, axis_name=axis_name))
        y, ns = fn(params[name], state[name] if state is not None else None, x)
        new_state[name] = ns
        return y

    # encoder
    x0 = S.s2d(x, blocks[0])
    x1 = dc("inc", x0, blocks[0])
    feats = [(x1, blocks[0], w[0])]
    cur, cur_b = x1, blocks[0]
    for i in range(1, 5):
        cur, cur_b = _pool(cur, cur_b)
        if cur_b != blocks[i]:
            cur = S.repack(cur, cur_b, blocks[i])
            cur_b = blocks[i]
        cur = dc(f"down{i}", cur, cur_b)
        if i < 4:
            feats.append((cur, cur_b, w[i]))

    # decoder
    y, y_b = cur, cur_b
    dec_out = [w[3], w[2], w[1], w[0]]
    for i in range(1, 5):
        skip, skip_b, skip_c = feats[4 - i]
        p = params[f"up{i}"]
        in_c = y.shape[-1] // (y_b * y_b)
        if "upconv" in p:  # ConvTranspose2d(k2, s2): lane-space matmul
            y = S.conv_transpose2_s2d(y, p["upconv"]["w"], y_b,
                                      p["upconv"].get("b"), compute_dtype=cd)
            up_c = in_c // 2
        else:  # bilinear align_corners x2: banded lane-space matmuls
            y = S.upsample2_ac_s2d(y, y_b)
            up_c = in_c
        y_b = 2 * y_b
        if y_b != skip_b:
            y = S.repack(y, y_b, skip_b)
            y_b = skip_b
        if "att" in p:
            skip = _attention(p["att"], skip, skip_b, skip_c, cd=cd)
        y = S.concat_s2d([skip, y.astype(skip.dtype)], y_b, [skip_c, up_c])
        up_state = state[f"up{i}"]["conv"] if state is not None else None
        y, ns = _double_conv(p["conv"], up_state, y, y_b, None,
                             train=train, cd=cd, axis_name=axis_name)
        new_state[f"up{i}"] = {"conv": ns}

    head = S.conv1x1_s2d_class_major if class_major else S.conv1x1_s2d
    logits = head(y, params["outc"]["w"], y_b,
                  params["outc"].get("b"), compute_dtype=cd)
    logits = logits.astype(jnp.float32)
    if d2s_output:
        logits = S.d2s(logits, y_b)
    return logits, new_state
