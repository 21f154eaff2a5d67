"""UNet++ (nested UNet) model family.

The reference *imports* ``UNetPlusPlus_S``/``UNetPlusPlus`` from
``unet.unet_nested_model`` (``train.py:16``) but that file is absent from the
repo — the import crashes as shipped (SURVEY.md §2.1).  This module ships a
runnable equivalent so the capability exists: the standard UNet++ topology
(Zhou et al., 2018) built from the same DoubleConv blocks, width-parameterized
like the rest of the family.

Node X[i][j]: depth i (spatial /2^i), nest index j.
  X[i][0] = encoder backbone (DoubleConv, maxpool between depths)
  X[i][j] = DoubleConv(concat(X[i][0..j-1], up(X[i+1][j-1])))
Output = 1x1 conv on X[0][depth-1]; optional deep supervision averages the
1x1 heads on X[0][1..depth-1].
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import blocks as B
from ..ops.nn import max_pool2d
from ..ops.resize import upsample_x2_align_corners

__all__ = ["UNetPlusPlus", "unet_pp", "unet_pp_s"]


@dataclasses.dataclass(frozen=True)
class UNetPlusPlus:
    n_channels: int = 1
    n_classes: int = 1
    bilinear: bool = False
    widths: Tuple[int, ...] = (16, 32, 64, 128, 256)
    deep_supervision: bool = False
    remat: bool = False
    compute_dtype: Optional[jnp.dtype] = None
    layout: str = "auto"  # "auto" | "nhwc" | "s2d" | "wide" (see _apply_wide)
    name: str = "unet_pp_s"

    @property
    def depth(self) -> int:
        return len(self.widths)

    @property
    def hw_divisor(self) -> int:
        """H/W divisibility the pooling chain requires (export contract)."""
        return 2 ** (self.depth - 1)

    def init(self, key):
        w = self.widths
        d = self.depth
        params, state = {}, {}
        n_keys = d + sum(d - 1 - i for i in range(d - 1)) * 2 + d
        keys = iter(jax.random.split(key, n_keys + 4))

        # encoder backbone X[i][0]
        for i in range(d):
            cin = self.n_channels if i == 0 else w[i - 1]
            params[f"x{i}_0"], state[f"x{i}_0"] = B.init_double_conv(next(keys), cin, w[i])

        # nested nodes X[i][j], j >= 1
        for j in range(1, d):
            for i in range(d - j):
                cin = w[i] * j  # j previous nodes at this depth
                if self.bilinear:
                    cin_up = w[i + 1]  # upsample keeps channels
                else:
                    params[f"up{i}_{j}"] = B.init_conv_transpose(
                        next(keys), 2, w[i + 1], w[i]
                    )
                    cin_up = w[i]
                p, s = B.init_double_conv(next(keys), cin + cin_up, w[i])
                params[f"x{i}_{j}"], state[f"x{i}_{j}"] = p, s

        if self.deep_supervision:
            for j in range(1, d):
                params[f"out{j}"] = B.init_out_conv(next(keys), w[0], self.n_classes)
        else:
            params["outc"] = B.init_out_conv(next(keys), w[0], self.n_classes)
        return params, state

    def apply(self, params, state, x, *, train: bool = False, axis_name=None):
        if x.ndim == 3:
            x = x[..., None]
        if self.layout in ("auto", "wide") and self._supports_wide(x.shape):
            from ..ops import wide as W

            logits_w, new_state, b0 = self._apply_wide(
                params, state, x, train=train, axis_name=axis_name, class_major=False
            )
            return W.unpack(logits_w, b0), new_state
        if self.layout == "wide":
            raise ValueError(
                f"wide layout unsupported for input {x.shape} "
                f"(H and W must be divisible by {2 ** (self.depth - 1)}); use layout='nhwc'"
            )
        if self.layout in ("auto", "s2d") and self._supports_s2d(x.shape):
            logits_s2d, new_state, b0 = self._apply_s2d(
                params, state, x, train=train, axis_name=axis_name, class_major=False
            )
            from ..ops.s2d import d2s

            return d2s(logits_s2d, b0), new_state
        if self.layout == "s2d":
            raise ValueError(
                f"s2d layout unsupported for input {x.shape} (bilinear={self.bilinear})"
            )
        return self._apply_nhwc(params, state, x, train=train, axis_name=axis_name)

    def _apply_nhwc(self, params, state, x, *, train: bool = False, axis_name=None):
        d = self.depth
        cd = self.compute_dtype
        new_state = {}

        def ckpt(fn):
            return jax.checkpoint(fn) if self.remat else fn

        def dc(name, inp):
            out, ns = ckpt(B.double_conv_apply)(
                params[name], state[name], inp,
                train=train, compute_dtype=cd, axis_name=axis_name,
            )
            new_state[name] = ns
            return out

        def up(i, j, feat):
            if self.bilinear:
                return upsample_x2_align_corners(feat)
            from ..ops.nn import conv_transpose2d

            p = params[f"up{i}_{j}"]
            return conv_transpose2d(feat, p["w"], p.get("b"), stride=2, compute_dtype=cd)

        nodes = {}
        for i in range(d):
            inp = x if i == 0 else max_pool2d(nodes[(i - 1, 0)], 2)
            nodes[(i, 0)] = dc(f"x{i}_0", inp)

        for j in range(1, d):
            for i in range(d - j):
                skips = [nodes[(i, k)] for k in range(j)]
                upped = up(i, j, nodes[(i + 1, j - 1)])
                upped = B._pad_to_match(upped, skips[0])
                feats = jnp.concatenate(
                    skips + [upped.astype(skips[0].dtype)], axis=-1
                )
                nodes[(i, j)] = dc(f"x{i}_{j}", feats)

        if self.deep_supervision:
            outs = [
                B.out_conv_apply(params[f"out{j}"], nodes[(0, j)], compute_dtype=cd)
                for j in range(1, d)
            ]
            logits = sum(outs) / len(outs)
        else:
            logits = B.out_conv_apply(params["outc"], nodes[(0, d - 1)], compute_dtype=cd)
        return logits.astype(jnp.float32), new_state

    # -- fused layout interface (engine/train, evaluate, predict use this) ---
    def supports_fused(self, x_shape) -> bool:
        if self.layout in ("auto", "wide") and self._supports_wide(x_shape):
            return True
        return self.layout in ("auto", "s2d") and self._supports_s2d(x_shape)

    def apply_fused(self, params, state, x, *, train: bool = False, axis_name=None):
        """Class-major packed logits + layout descriptor (as models/unet.py)."""
        if self.layout in ("auto", "wide") and self._supports_wide(x.shape):
            logits_cm, new_state, b0 = self._apply_wide(
                params, state, x, train=train, axis_name=axis_name, class_major=True
            )
            return logits_cm, new_state, ("wide", b0)
        logits_cm, new_state, b0 = self._apply_s2d(
            params, state, x, train=train, axis_name=axis_name, class_major=True
        )
        return logits_cm, new_state, ("s2d", b0)

    # -- wide (width-only blocked) execution: the default fast path ----------
    def _supports_wide(self, x_shape) -> bool:
        if len(x_shape) == 3:
            x_shape = (*x_shape, 1)
        h, w = x_shape[1], x_shape[2]
        # symbolic dims (shape-polymorphic export) keep the NHWC path
        if not (isinstance(h, int) and isinstance(w, int)):
            return False
        div = 2 ** (self.depth - 1)  # the pooling chain's own constraint
        return h % div == 0 and w % div == 0

    def _apply_wide(self, params, state, x, *, train, axis_name, class_major):
        """UNet++ forward in the wide layout (ops/wide.py): every depth runs
        width-blocked at bw = ~128/C and all node-to-node transitions are pure
        reshapes, so the dense skip concats at depth 0 (C=16, the topology's
        hot spot) stay lane-dense.  Exact vs _apply_nhwc (tests/test_wide.py);
        supports bilinear and deep supervision (the s2d path does not)."""
        from ..ops import wide as W
        from .wide_exec import MAX_BW, _double_conv

        if x.ndim == 3:
            x = x[..., None]
        d = self.depth
        cd = self.compute_dtype
        ckpt = (lambda f: jax.checkpoint(f)) if self.remat else (lambda f: f)
        # actual widths from the params (checkpoints may differ from config)
        w = [int(params[f"x{i}_0"]["conv2"]["w"].shape[-1]) for i in range(d)]
        bws = [W.wide_block(c, MAX_BW) for c in w]
        new_state = {}

        def dc(name, t, bw, split_cs=None):
            fn = ckpt(lambda p, s, u: _double_conv(p, s, u, bw, train=train,
                                                   cd=cd, axis_name=axis_name,
                                                   split_cs=split_cs))
            y, ns = fn(params[name], state[name] if state is not None else None, t)
            new_state[name] = ns
            return y

        nodes = {(0, 0): dc("x0_0", W.pack(x, bws[0]), bws[0])}
        for i in range(1, d):
            cur = W.max_pool2_wide(nodes[(i - 1, 0)], bws[i - 1])
            cur_bw = max(bws[i - 1] // 2, 1)
            if cur_bw != bws[i]:
                cur = W.reblock(cur, cur_bw, bws[i])
            nodes[(i, 0)] = dc(f"x{i}_0", cur, bws[i])

        for j in range(1, d):
            for i in range(d - j):
                b = bws[i]
                skips = [nodes[(i, k)] for k in range(j)]
                src = nodes[(i + 1, j - 1)]
                if self.bilinear:
                    upped = W.upsample2_ac_wide(src, bws[i + 1])
                    up_c = w[i + 1]
                else:
                    p_up = params[f"up{i}_{j}"]
                    upped = W.conv_transpose2_wide(src, p_up["w"], bws[i + 1],
                                                   p_up.get("b"), compute_dtype=cd)
                    up_c = w[i]
                up_bw = 2 * bws[i + 1]
                if up_bw != b:
                    upped = W.reblock(upped, up_bw, b)
                # kernel-split conv over the node inputs: the reference's
                # concat never materializes (ops/wide.py:conv_wide_split)
                feats = skips + [upped.astype(skips[0].dtype)]
                nodes[(i, j)] = dc(f"x{i}_{j}", feats, b,
                                   split_cs=[w[i]] * j + [up_c])

        b0 = bws[0]
        head = W.conv1x1_wide_class_major if class_major else W.conv1x1_wide
        if self.deep_supervision:
            outs = [head(nodes[(0, j)], params[f"out{j}"]["w"], b0,
                         params[f"out{j}"].get("b"), compute_dtype=cd)
                    for j in range(1, d)]
            logits = sum(outs) / len(outs)
        else:
            logits = head(nodes[(0, d - 1)], params["outc"]["w"], b0,
                          params["outc"].get("b"), compute_dtype=cd)
        return logits.astype(jnp.float32), new_state, b0

    # -- s2d execution (same layout machinery as models/s2d_exec.py) ---------
    def _supports_s2d(self, x_shape) -> bool:
        if self.bilinear or self.deep_supervision:
            return False
        if len(x_shape) == 3:
            x_shape = (*x_shape, 1)
        h, w = x_shape[1], x_shape[2]
        if not (isinstance(h, int) and isinstance(w, int)):
            return False
        return h % 64 == 0 and w % 64 == 0

    def _apply_s2d(self, params, state, x, *, train, axis_name, class_major):
        from ..ops import s2d as S
        from .s2d_exec import _double_conv, _pool

        if x.ndim == 3:
            x = x[..., None]
        d = self.depth
        cd = self.compute_dtype
        ckpt = (lambda f: jax.checkpoint(f)) if self.remat else (lambda f: f)
        # actual widths from the params (checkpoints may differ from config)
        w = [int(params[f"x{i}_0"]["conv2"]["w"].shape[-1]) for i in range(d)]
        blocks = [S.block_for_channels(c) for c in w]
        new_state = {}

        def dc(name, t, b):
            fn = ckpt(lambda p, s, u: _double_conv(p, s, u, b, None, train=train,
                                                   cd=cd, axis_name=axis_name))
            y, ns = fn(params[name], state[name] if state is not None else None, t)
            new_state[name] = ns
            return y

        nodes = {}
        cur, cur_b = S.s2d(x, blocks[0]), blocks[0]
        nodes[(0, 0)] = dc("x0_0", cur, blocks[0])
        for i in range(1, d):
            cur, cur_b = _pool(nodes[(i - 1, 0)], blocks[i - 1])
            if cur_b != blocks[i]:
                cur = S.repack(cur, cur_b, blocks[i])
            nodes[(i, 0)] = dc(f"x{i}_0", cur, blocks[i])

        for j in range(1, d):
            for i in range(d - j):
                b = blocks[i]
                skips = [nodes[(i, k)] for k in range(j)]
                p_up = params[f"up{i}_{j}"]
                upped = S.conv_transpose2_s2d(
                    nodes[(i + 1, j - 1)], p_up["w"], blocks[i + 1],
                    p_up.get("b"), compute_dtype=cd,
                )
                up_b = 2 * blocks[i + 1]
                if up_b != b:
                    upped = S.repack(upped, up_b, b)
                feats = S.concat_s2d(
                    skips + [upped.astype(skips[0].dtype)], b, [w[i]] * j + [w[i]]
                )
                nodes[(i, j)] = dc(f"x{i}_{j}", feats, b)

        b0 = blocks[0]
        head = S.conv1x1_s2d_class_major if class_major else S.conv1x1_s2d
        logits = head(nodes[(0, d - 1)], params["outc"]["w"], b0,
                      params["outc"].get("b"), compute_dtype=cd)
        return logits.astype(jnp.float32), new_state, b0

    def with_options(self, **kw) -> "UNetPlusPlus":
        return dataclasses.replace(self, **kw)


def unet_pp_s(n_channels=1, n_classes=1, bilinear=False, **kw) -> UNetPlusPlus:
    """UNetPlusPlus_S equivalent (base width 16, as the UNet_S family)."""
    return UNetPlusPlus(n_channels, n_classes, bilinear,
                        widths=(16, 32, 64, 128, 256), name="unet_pp_s", **kw)


def unet_pp(n_channels=1, n_classes=1, bilinear=False, **kw) -> UNetPlusPlus:
    """UNetPlusPlus equivalent (base width 64, as the standard UNet)."""
    return UNetPlusPlus(n_channels, n_classes, bilinear,
                        widths=(64, 128, 256, 512, 1024), name="unet_pp", **kw)
