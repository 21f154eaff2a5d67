"""YOLOv8-style segmentation network (runnable equivalent of a missing module).

The reference imports ``YOLOv8_Seg_S`` from ``yolo.yolov8_seg_model``
(``train.py:18``, ``export_model.py:5``) but the ``yolo/`` directory is
absent from the repo; the model appears only in commented-out selection code
(``train.py:261``, "~5 ms").  This module ships a runnable equivalent so the
capability exists: a YOLOv8-S-shaped dense segmentation net — CSP backbone
with C2f blocks and SPPF, an FPN-style top-down neck, and a proto-style mask
head decoded back to input resolution — honoring the reference's model
contract (``n_channels``/``n_classes`` attrs, logits at input resolution,
binary-path training with the same compound loss).

NHWC/TPU-native: ConvBnSiLU primitives on our exact-torch BN, bf16 compute
option, same init/apply pytree style as the UNet family.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import blocks as B
from ..ops.nn import batch_norm, conv2d, conv_transpose2d, max_pool2d

__all__ = ["YOLOv8Seg", "yolov8_seg_s"]


# ---------------------------------------------------------------------------
# primitives: Conv(+s2) -> BN -> SiLU, Bottleneck, C2f, SPPF
# ---------------------------------------------------------------------------

def _init_cbs(key, k, cin, cout):
    p = B.init_conv(key, k, k, cin, cout, bias=False)
    bn_p, bn_s = B.init_bn(cout)
    return {"conv": p, "bn": bn_p}, {"bn": bn_s}


def _cbs(params, state, x, *, stride=1, train, cd, axis_name):
    k = params["conv"]["w"].shape[0]
    y = conv2d(x, params["conv"]["w"], stride=stride, padding=k // 2, compute_dtype=cd)
    y, bn = batch_norm(
        y, params["bn"]["scale"], params["bn"]["bias"],
        state["bn"]["mean"], state["bn"]["var"], train=train, axis_name=axis_name,
    )
    y = (y.astype(jnp.float32) * jax.nn.sigmoid(y.astype(jnp.float32))).astype(y.dtype)
    return y, {"bn": {"mean": bn[0], "var": bn[1]}}


def _init_bottleneck(key, c):
    k1, k2 = jax.random.split(key)
    p1, s1 = _init_cbs(k1, 3, c, c)
    p2, s2 = _init_cbs(k2, 3, c, c)
    return {"cv1": p1, "cv2": p2}, {"cv1": s1, "cv2": s2}


def _bottleneck(params, state, x, *, train, cd, axis_name):
    y, s1 = _cbs(params["cv1"], state["cv1"], x, train=train, cd=cd, axis_name=axis_name)
    y, s2 = _cbs(params["cv2"], state["cv2"], y, train=train, cd=cd, axis_name=axis_name)
    return x + y, {"cv1": s1, "cv2": s2}  # residual shortcut


def _init_c2f(key, cin, cout, n):
    c = cout // 2
    keys = jax.random.split(key, n + 2)
    p1, s1 = _init_cbs(keys[0], 1, cin, cout)
    p2, s2 = _init_cbs(keys[1], 1, (2 + n) * c, cout)
    params = {"cv1": p1, "cv2": p2}
    state = {"cv1": s1, "cv2": s2}
    for i in range(n):
        params[f"m{i}"], state[f"m{i}"] = _init_bottleneck(keys[2 + i], c)
    return params, state


def _c2f(params, state, x, n, *, train, cd, axis_name):
    new_state = {}
    y, new_state["cv1"] = _cbs(params["cv1"], state["cv1"], x, train=train, cd=cd,
                               axis_name=axis_name)
    c = y.shape[-1] // 2
    parts = [y[..., :c], y[..., c:]]
    for i in range(n):
        nxt, new_state[f"m{i}"] = _bottleneck(
            params[f"m{i}"], state[f"m{i}"], parts[-1],
            train=train, cd=cd, axis_name=axis_name,
        )
        parts.append(nxt)
    y = jnp.concatenate(parts, axis=-1)
    y, new_state["cv2"] = _cbs(params["cv2"], state["cv2"], y, train=train, cd=cd,
                               axis_name=axis_name)
    return y, new_state


# pre-reblock ConvT inputs whose optimal output block is HALF the native
# 2*bw (see up_conv in _apply_wide).  TRAIN-ONLY: with the r5 dilated-conv
# ConvT the eval forward measured FASTER post-reblocking (3.588 vs 3.842 ms
# predict step) while the train step prefers the pre-reblock (17.42 vs
# 19.04 ms) — the backward's wgrad reads the smaller pre-reblocked operand.
# Probes A/B by flipping this flag (benchmarks/probe_convt2.py).
PRE_REBLOCK = [True]


# -- wide-layout variants of the primitives (ops/wide.py; bw=1 == dense) -----

def _cbs_w(params, state, x, bw, *, stride=1, train, cd, axis_name):
    from ..ops import wide as W

    w = params["conv"]["w"]
    if w.shape[0] == 1 and w.shape[1] == 1 and stride == 1 and bw > 1:
        # 1x1 convs (C2f cv1/cv2, SPPF, heads): the layout-preserving grouped
        # matmul does the exact logical MACs; conv_wide's block-diagonal
        # kernel would inflate them bw x for no lane-density gain
        y = W.conv1x1_wide(x, w, bw, compute_dtype=cd)
    else:
        y = W.conv_wide(x, w, bw, compute_dtype=cd,
                        stride=stride, h_fold=train)
    bwo = max(bw // stride, 1)
    if bwo == 1:
        y, bn = batch_norm(
            y, params["bn"]["scale"], params["bn"]["bias"],
            state["bn"]["mean"], state["bn"]["var"], train=train, axis_name=axis_name,
        )
    else:
        y, bn = W.batch_norm_wide(
            y, params["bn"]["scale"], params["bn"]["bias"],
            state["bn"]["mean"], state["bn"]["var"], bwo,
            train=train, axis_name=axis_name,
        )
    y = (y.astype(jnp.float32) * jax.nn.sigmoid(y.astype(jnp.float32))).astype(y.dtype)
    return y, {"bn": {"mean": bn[0], "var": bn[1]}}, bwo


def _bottleneck_w(params, state, x, bw, *, train, cd, axis_name):
    y, s1, _ = _cbs_w(params["cv1"], state["cv1"], x, bw, train=train, cd=cd,
                      axis_name=axis_name)
    y, s2, _ = _cbs_w(params["cv2"], state["cv2"], y, bw, train=train, cd=cd,
                      axis_name=axis_name)
    return x + y, {"cv1": s1, "cv2": s2}


def _c2f_w(params, state, x, bw, n, *, train, cd, axis_name):
    from ..ops import wide as W

    new_state = {}
    y, new_state["cv1"], _ = _cbs_w(params["cv1"], state["cv1"], x, bw,
                                    train=train, cd=cd, axis_name=axis_name)
    c = (y.shape[-1] // bw) // 2
    parts = W.split_wide(y, bw, [c, c])
    # the bottleneck chain works on half the channels: run it at ITS optimal
    # block width (reblocks are pure reshapes)
    bw_b = W.wide_block(c)
    chain = W.reblock(parts[1], bw, bw_b)
    for i in range(n):
        chain, new_state[f"m{i}"] = _bottleneck_w(
            params[f"m{i}"], state[f"m{i}"], chain, bw_b,
            train=train, cd=cd, axis_name=axis_name,
        )
        parts.append(W.reblock(chain, bw_b, bw))
    # NOTE: keep the concat here.  Each part is only c*bw = 64 lanes, so the
    # kernel-split form (conv_wide_split) runs 2+n half-empty convs and
    # measured 10% SLOWER end-to-end; the concat builds one dense 128-lane
    # operand.  Splitting only wins when every part is already >= 128 lanes
    # (the UNet/UNet++ skip connections).
    y = W.concat_wide(parts, bw, [c] * (2 + n))
    y, new_state["cv2"], _ = _cbs_w(params["cv2"], state["cv2"], y, bw,
                                    train=train, cd=cd, axis_name=axis_name)
    return y, new_state


def _init_sppf(key, c):
    k1, k2 = jax.random.split(key)
    p1, s1 = _init_cbs(k1, 1, c, c // 2)
    p2, s2 = _init_cbs(k2, 1, c * 2, c)
    return {"cv1": p1, "cv2": p2}, {"cv1": s1, "cv2": s2}


def _maxpool5_same(x):
    """5x5 stride-1 SAME max pool (SPPF)."""
    from jax import lax

    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 5, 5, 1), (1, 1, 1, 1),
        [(0, 0), (2, 2), (2, 2), (0, 0)],
    )


def _sppf(params, state, x, *, train, cd, axis_name):
    new_state = {}
    y, new_state["cv1"] = _cbs(params["cv1"], state["cv1"], x, train=train, cd=cd,
                               axis_name=axis_name)
    p1 = _maxpool5_same(y)
    p2 = _maxpool5_same(p1)
    p3 = _maxpool5_same(p2)
    y = jnp.concatenate([y, p1, p2, p3], axis=-1)
    y, new_state["cv2"] = _cbs(params["cv2"], state["cv2"], y, train=train, cd=cd,
                               axis_name=axis_name)
    return y, new_state


# ---------------------------------------------------------------------------
# the model
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class YOLOv8Seg:
    """CSP backbone + FPN neck + proto mask head -> dense seg logits."""

    n_channels: int = 1
    n_classes: int = 1
    bilinear: bool = False  # contract parity with the UNet family (unused)
    widths: Tuple[int, int, int, int, int] = (32, 64, 128, 256, 512)  # S scale
    depths: Tuple[int, int, int, int] = (1, 2, 2, 1)
    remat: bool = False
    compute_dtype: Optional[jnp.dtype] = None
    layout: str = "auto"  # "auto" | "nhwc" | "wide" (see _apply_wide)
    name: str = "yolov8_seg_s"

    @property
    def hw_divisor(self) -> int:
        """H/W divisibility the stride-32 backbone requires (export contract)."""
        return 32

    def init(self, key):
        w = self.widths
        d = self.depths
        keys = iter(jax.random.split(key, 32))
        P, S = {}, {}
        # backbone: stem (s2) -> [down s2 + C2f] x4 -> SPPF
        P["stem"], S["stem"] = _init_cbs(next(keys), 3, self.n_channels, w[0])
        for i in range(4):
            P[f"down{i}"], S[f"down{i}"] = _init_cbs(next(keys), 3, w[i], w[i + 1])
            P[f"c2f{i}"], S[f"c2f{i}"] = _init_c2f(next(keys), w[i + 1], w[i + 1], d[i])
        P["sppf"], S["sppf"] = _init_sppf(next(keys), w[4])
        # neck (top-down FPN): P5->P4, P4->P3
        P["n4"], S["n4"] = _init_c2f(next(keys), w[4] + w[3], w[3], d[2])
        P["n3"], S["n3"] = _init_c2f(next(keys), w[3] + w[2], w[2], d[1])
        # proto mask head: P3 (stride 8) -> x2 -> x2 -> x2 -> logits at stride 1
        c = w[2]
        P["p_up1"] = B.init_conv_transpose(next(keys), 2, c, c // 2)
        P["p_c1"], S["p_c1"] = _init_cbs(next(keys), 3, c // 2, c // 2)
        P["p_up2"] = B.init_conv_transpose(next(keys), 2, c // 2, c // 4)
        P["p_c2"], S["p_c2"] = _init_cbs(next(keys), 3, c // 4, c // 4)
        P["p_up3"] = B.init_conv_transpose(next(keys), 2, c // 4, c // 4)
        P["p_c3"], S["p_c3"] = _init_cbs(next(keys), 3, c // 4, c // 4)
        P["head"] = B.init_out_conv(next(keys), c // 4, self.n_classes)
        return P, S

    def apply(self, params, state, x, *, train: bool = False, axis_name=None):
        if x.ndim == 3:
            x = x[..., None]
        if self.layout in ("auto", "wide") and self._supports_wide(x.shape):
            from ..ops import wide as W

            logits_w, new_state, bwf = self._apply_wide(
                params, state, x, train=train, axis_name=axis_name, class_major=False
            )
            return W.unpack(logits_w, bwf), new_state
        if self.layout == "wide":
            raise ValueError(
                f"wide layout unsupported for input {x.shape} "
                f"(H and W must be divisible by 32); use layout='nhwc'"
            )
        return self._apply_nhwc(params, state, x, train=train, axis_name=axis_name)

    def _apply_nhwc(self, params, state, x, *, train: bool = False, axis_name=None):
        cd = self.compute_dtype
        d = self.depths
        NS = {}
        kw = dict(train=train, cd=cd, axis_name=axis_name)

        def cbs(name, t, stride=1):
            y, NS[name] = _cbs(params[name], state[name], t, stride=stride, **kw)
            return y

        def c2f(name, t, n):
            y, NS[name] = _c2f(params[name], state[name], t, n, **kw)
            return y

        y = cbs("stem", x, stride=2)                       # /2
        feats = {}
        for i in range(4):
            y = cbs(f"down{i}", y, stride=2)               # /4 /8 /16 /32
            y = c2f(f"c2f{i}", y, d[i])
            feats[i] = y
        y, NS["sppf"] = _sppf(params["sppf"], state["sppf"], y, **kw)   # P5 /32

        # FPN top-down
        up = lambda t: jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)  # nearest x2
        p4 = c2f("n4", jnp.concatenate([up(y), feats[2]], axis=-1), d[2])      # /16
        p3 = c2f("n3", jnp.concatenate([up(p4), feats[1]], axis=-1), d[1])     # /8

        # proto head back to full resolution
        t = conv_transpose2d(p3, params["p_up1"]["w"], params["p_up1"].get("b"),
                             stride=2, compute_dtype=cd)                        # /4
        t = cbs("p_c1", t)
        t = conv_transpose2d(t, params["p_up2"]["w"], params["p_up2"].get("b"),
                             stride=2, compute_dtype=cd)                        # /2
        t = cbs("p_c2", t)
        t = conv_transpose2d(t, params["p_up3"]["w"], params["p_up3"].get("b"),
                             stride=2, compute_dtype=cd)                        # /1
        t = cbs("p_c3", t)
        logits = B.out_conv_apply(params["head"], t, compute_dtype=cd)
        return logits.astype(jnp.float32), NS

    # -- wide (width-only blocked) execution: the default fast path ----------
    def _supports_wide(self, x_shape) -> bool:
        if len(x_shape) == 3:
            x_shape = (*x_shape, 1)
        h, w = x_shape[1], x_shape[2]
        # symbolic dims (shape-polymorphic export) keep the NHWC path
        if not (isinstance(h, int) and isinstance(w, int)):
            return False
        return h % 32 == 0 and w % 32 == 0  # the /32 stride chain's constraint

    def supports_fused(self, x_shape) -> bool:
        return self.layout in ("auto", "wide") and self._supports_wide(x_shape)

    def apply_fused(self, params, state, x, *, train: bool = False, axis_name=None):
        """Class-major packed logits + layout descriptor (as models/unet.py)."""
        logits_cm, new_state, bwf = self._apply_wide(
            params, state, x, train=train, axis_name=axis_name, class_major=True
        )
        return logits_cm, new_state, ("wide", bwf)

    def _apply_wide(self, params, state, x, *, train, axis_name, class_major):
        """Forward in the wide layout (ops/wide.py), exact vs _apply_nhwc.

        The sub-128-channel tensors (stem 32ch @ H/2, C2f0 64ch @ H/4, and
        the whole proto head: 64ch @ H/4 up to 32ch @ H) run width-blocked at
        bw = ~128/C; the stride-2 downsample convs narrow the block in place
        (conv_wide stride=2), so every transition is a pure reshape.  Deep
        levels (C >= 128) have bw == 1, where the wide ops degenerate to the
        dense NHWC ops.
        """
        from ..ops import wide as W

        if x.ndim == 3:
            x = x[..., None]
        cd = self.compute_dtype
        d = self.depths
        NS = {}
        kw = dict(train=train, cd=cd, axis_name=axis_name)

        def cbs(name, t, bw, stride=1):
            y, NS[name], bwo = _cbs_w(params[name], state[name], t, bw,
                                      stride=stride, **kw)
            return y, bwo

        def c2f(name, t, bw, n):
            y, NS[name] = _c2f_w(params[name], state[name], t, bw, n, **kw)
            return y

        # backbone; the stem reads the (C=1) input at the widest block the
        # stride-2 conv can narrow into the C=32 level's bw=4
        y, bw = cbs("stem", W.pack(x, 8), 8, stride=2)          # /2, 32ch, bw4
        feats = {}
        for i in range(4):
            y, bw = cbs(f"down{i}", y, bw, stride=2)            # /4 /8 /16 /32
            c_i = y.shape[-1] // bw
            bw_opt = W.wide_block(c_i)  # re-optimal for non-default widths
            if bw != bw_opt:
                y = W.reblock(y, bw, bw_opt)
                bw = bw_opt
            y = c2f(f"c2f{i}", y, bw, d[i])
            feats[i] = W.unpack(y, bw)  # neck runs dense; no-op at bw 1
        if bw != 1:
            y = W.unpack(y, bw)
            bw = 1
        y, NS["sppf"] = _sppf(params["sppf"], state["sppf"], y, **kw)   # P5 /32

        # FPN top-down (all bw == 1: plain dense ops)
        up = lambda t: jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)  # nearest x2
        p4 = c2f("n4", jnp.concatenate([up(y), feats[2]], axis=-1), 1, d[2])   # /16
        p3 = c2f("n3", jnp.concatenate([up(p4), feats[1]], axis=-1), 1, d[1])  # /8

        # proto head back to full resolution; each ConvT doubles the block,
        # reblocked to the level's ~128/C optimum.  In TRAIN mode, when that
        # means HALVING (p_up3: bw 4 -> 8 -> opt 4), reblock the INPUT
        # instead: the relayout then moves half the bytes and the backward
        # reads the smaller operand (measured 17.42 vs 19.04 ms train step;
        # the eval forward prefers the post-reblock — see PRE_REBLOCK).
        def up_conv(name, t, bw, c_out):
            bw_opt = W.wide_block(c_out)
            if PRE_REBLOCK[0] and train and bw > 1 and bw_opt == bw:
                t = W.reblock(t, bw, bw // 2)
                bw = bw // 2
            t = W.conv_transpose2_wide(t, params[name]["w"], bw,
                                       params[name].get("b"), compute_dtype=cd)
            bw2 = 2 * bw
            if bw2 != bw_opt:
                t = W.reblock(t, bw2, bw_opt)
                bw2 = bw_opt
            return t, bw2

        c = int(params["p_c1"]["conv"]["w"].shape[-1]) * 2  # widths from params
        t, bw = up_conv("p_up1", p3, 1, c // 2)                          # /4
        t, bw = cbs("p_c1", t, bw)
        t, bw = up_conv("p_up2", t, bw, c // 4)                          # /2
        t, bw = cbs("p_c2", t, bw)
        t, bw = up_conv("p_up3", t, bw, c // 4)                          # /1
        t, bw = cbs("p_c3", t, bw)
        head = W.conv1x1_wide_class_major if class_major else W.conv1x1_wide
        logits = head(t, params["head"]["w"], bw, params["head"].get("b"),
                      compute_dtype=cd)
        return logits.astype(jnp.float32), NS, bw


def yolov8_seg_s(n_channels=1, n_classes=1, **kw) -> YOLOv8Seg:
    """YOLOv8_Seg_S equivalent (S width scale, binary seg default)."""
    return YOLOv8Seg(n_channels=n_channels, n_classes=n_classes, **kw)
