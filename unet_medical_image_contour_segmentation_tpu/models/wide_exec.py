"""Wide-layout execution of the UNet forward (exact, fastest on v5e).

Same parameters, same numerics as the NHWC path in ``models/blocks.py`` and
the square-block path in ``models/s2d_exec.py`` — only the on-device layout
differs: every level runs width-blocked at its own bw = ~128/C (ops/wide.py),
which halves the MAC inflation of the C=16 and C=64 levels vs the square s2d
plan (measured 1.43x / 1.09x per conv on v5e) and makes every level
transition a pure reshape.  Used when ``UNet.layout in ("auto", "wide")``;
needs spatial dims divisible by 16 (the same constraint pooling imposes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import wide as W

__all__ = ["supports_wide", "apply_wide", "output_bw"]

MAX_BW = 16  # lets the C=8 UNet_T level reach 128 dense lanes


def _widths_from_params(params):
    """Actual per-level widths — the params are the truth, not model.widths
    (a checkpoint of any variant may be loaded into any UNet shell)."""
    keys = ["inc", "down1", "down2", "down3", "down4"]
    return tuple(int(params[k]["conv2"]["w"].shape[-1]) for k in keys)


def output_bw(model, params=None) -> int:
    w0 = _widths_from_params(params)[0] if params is not None else model.widths[0]
    return W.wide_block(w0, MAX_BW)


def supports_wide(model, x_shape) -> bool:
    if len(x_shape) == 3:
        x_shape = (*x_shape, 1)
    h, w = x_shape[1], x_shape[2]
    # symbolic dims (jax.export shape polymorphism) use the NHWC path, whose
    # ops are shape-polymorphic; the wide kernels bake sizes into constants
    if not (isinstance(h, int) and isinstance(w, int)):
        return False
    return h % 16 == 0 and w % 16 == 0


def _double_conv(params, state, x, bw, *, train, cd, axis_name, split_cs=None):
    """DoubleConv in wide-bw layout; returns (y, new_state).

    Folded eval params (no ``bn*`` keys — models/fold_bn.py) skip the
    BatchNorm passes entirely.

    ``split_cs``: when ``x`` is a LIST of wide tensors (a decoder skip +
    upsample pair that the reference concatenates), conv1's kernel splits
    over them (ops/wide.py:conv_wide_split) — the lane-interleaving concat
    never materializes.
    """

    def conv1(inp, w, b=None, *, fold):
        if split_cs is not None:
            return W.conv_wide_split(inp, split_cs, w, bw, b,
                                     compute_dtype=cd, h_fold=fold)
        return W.conv_wide(inp, w, bw, b, compute_dtype=cd, h_fold=fold)

    if "bn1" not in params:  # BN-folded inference path
        assert not train, "folded parameters are eval-only"
        y = conv1(x, params["conv1"]["w"], params["conv1"]["b"], fold=False)
        y = jax.nn.relu(y)
        y = W.conv_wide(y, params["conv2"]["w"], bw, params["conv2"]["b"],
                        compute_dtype=cd, h_fold=False)
        return jax.nn.relu(y), {}
    y = conv1(x, params["conv1"]["w"], fold=train)
    y, bn1 = W.batch_norm_wide(
        y, params["bn1"]["scale"], params["bn1"]["bias"],
        state["bn1"]["mean"], state["bn1"]["var"], bw,
        train=train, axis_name=axis_name,
    )
    y = jax.nn.relu(y)
    y = W.conv_wide(y, params["conv2"]["w"], bw, compute_dtype=cd, h_fold=train)
    y, bn2 = W.batch_norm_wide(
        y, params["bn2"]["scale"], params["bn2"]["bias"],
        state["bn2"]["mean"], state["bn2"]["var"], bw,
        train=train, axis_name=axis_name,
    )
    y = jax.nn.relu(y)
    return y, {"bn1": {"mean": bn1[0], "var": bn1[1]},
               "bn2": {"mean": bn2[0], "var": bn2[1]}}


# Block width for the attention conv7: feats has 2 logical channels, so
# 64 sub-columns * 2 = 128 dense lanes.  Module-level so probes can A/B
# the pre-r3 behavior (bw_att == skip bw) by monkeypatching.
ATT_CONV_BW = 64


def _attention(params, x, bw, c, *, cd, h_fold=True):
    """SpatialAttention on a wide-bw skip tensor (exact reference semantics).

    The mean/max reduce is deliberately the naive rank-5 grouped reduce +
    broadcast multiply.  A lane-space rewrite (channel mean as an MXU matmul
    with f32 accumulation, max on bf16, broadcast as a 0/1 matmul) measured
    25-40%% faster in ISOLATION (fwd+vjp 3.90 -> 2.29 ms at the C=16 level)
    but 7%% SLOWER in the full unet_sa train step (32.5 -> 34.8 ms,
    interleaved same-process A/B): the rank-5 elementwise pipeline fuses
    into the surrounding BN/ReLU producers and concat/conv consumers, and
    the dot_generals break those fusions.  See CLAUDE.md.

    The conv7, however, runs REBLOCKED to ``bw_att = ATT_CONV_BW`` dense
    lanes (r3): at the skip's own bw the 2-channel feats map is lane-padded
    8-64x on input and 16-128x on output, so the conv7's PHYSICAL MACs
    (~18 GMAC/slice summed over unet_sa's four levels — R*7*128^2 per block
    position) rival the entire rest of the model.  Reblocking is a pure
    reshape and conv_wide is layout-exact, so the result is unchanged.
    """
    xg = x.astype(jnp.float32).reshape(*x.shape[:-1], bw, c)
    avg = jnp.mean(xg, axis=-1)
    mx = jnp.max(xg, axis=-1)
    feats = jnp.stack([avg, mx], axis=-1)            # (..., bw, 2)
    feats = feats.reshape(*x.shape[:-1], bw * 2).astype(x.dtype)
    w_total = feats.shape[-2] * bw                   # logical width
    bw_att = ATT_CONV_BW
    while w_total % bw_att:
        bw_att //= 2
    if bw_att > bw:
        att = W.conv_wide(W.reblock(feats, bw, bw_att), params["conv"]["w"],
                          bw_att, compute_dtype=cd, h_fold=False)
        att = W.reblock(att, bw_att, bw)
    else:
        att = W.conv_wide(feats, params["conv"]["w"], bw, compute_dtype=cd,
                          h_fold=h_fold)
    att = jax.nn.sigmoid(att.astype(jnp.float32)).astype(x.dtype)
    y = xg.astype(x.dtype) * att[..., None]
    return y.reshape(x.shape)


def apply_wide(model, params, state, x, *, train: bool = False, axis_name=None,
               unpack_output: bool = True, class_major: bool = False):
    """Forward in wide layout.  Returns (logits, new_state).

    ``unpack_output=False`` leaves the logits wide-packed for the fused
    loss/eval paths; with ``class_major=True`` the lanes are ordered
    (class, dx) so per-class tensors are contiguous slices
    (losses/s2d_fused.py works on any lane-group size).
    """
    if x.ndim == 3:  # rank-3 single-channel input (dense program layout)
        x = x[..., None]
    assert not (class_major and unpack_output), "class-major lanes cannot unpack"
    w = _widths_from_params(params)
    cd = model.compute_dtype
    ckpt = (lambda f: jax.checkpoint(f)) if model.remat else (lambda f: f)

    bws = [W.wide_block(c, MAX_BW) for c in w]
    new_state = {}

    def dc(name, x, bw):
        fn = ckpt(lambda p, s, t: _double_conv(p, s, t, bw, train=train,
                                               cd=cd, axis_name=axis_name))
        y, ns = fn(params[name], state[name] if state is not None else None, x)
        new_state[name] = ns
        return y

    # encoder
    x0 = W.pack(x, bws[0])
    x1 = dc("inc", x0, bws[0])
    feats = [(x1, bws[0], w[0])]
    cur, cur_bw = x1, bws[0]
    for i in range(1, 5):
        cur = W.max_pool2_wide(cur, cur_bw)
        cur_bw = max(cur_bw // 2, 1)
        if cur_bw != bws[i]:
            cur = W.reblock(cur, cur_bw, bws[i])
            cur_bw = bws[i]
        cur = dc(f"down{i}", cur, cur_bw)
        if i < 4:
            feats.append((cur, cur_bw, w[i]))

    # decoder
    y, y_bw = cur, cur_bw
    for i in range(1, 5):
        skip, skip_bw, skip_c = feats[4 - i]
        p = params[f"up{i}"]
        in_c = y.shape[-1] // y_bw
        if "upconv" in p:  # ConvTranspose2d(k2, s2)
            y = W.conv_transpose2_wide(y, p["upconv"]["w"], y_bw,
                                       p["upconv"].get("b"), compute_dtype=cd)
            up_c = in_c // 2
        else:  # bilinear align_corners x2
            y = W.upsample2_ac_wide(y, y_bw)
            up_c = in_c
        y_bw = 2 * y_bw
        if y_bw != skip_bw:
            y = W.reblock(y, y_bw, skip_bw)
            y_bw = skip_bw
        up_state = state[f"up{i}"]["conv"] if state is not None else None
        if "att" in p:
            # attention Ups keep the concat: feeding the attention-multiplied
            # skip into a split conv breaks its elementwise fusion (measured
            # 36.1 vs 32.3 ms unet_sa train step, interleaved A/B)
            skip = _attention(p["att"], skip, skip_bw, skip_c, cd=cd,
                              h_fold=train)
            y = W.concat_wide([skip, y.astype(skip.dtype)], y_bw,
                              [skip_c, up_c])
            y, ns = _double_conv(p["conv"], up_state, y, y_bw,
                                 train=train, cd=cd, axis_name=axis_name)
        else:
            y, ns = _double_conv(p["conv"], up_state,
                                 [skip, y.astype(skip.dtype)], y_bw,
                                 train=train, cd=cd, axis_name=axis_name,
                                 split_cs=[skip_c, up_c])
        new_state[f"up{i}"] = {"conv": ns}

    head = W.conv1x1_wide_class_major if class_major else W.conv1x1_wide
    logits = head(y, params["outc"]["w"], y_bw,
                  params["outc"].get("b"), compute_dtype=cd)
    logits = logits.astype(jnp.float32)
    if unpack_output:
        logits = W.unpack(logits, y_bw)
    return logits, new_state
