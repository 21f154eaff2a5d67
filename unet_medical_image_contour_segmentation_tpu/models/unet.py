"""UNet model family as one width-parameterized builder.

The reference ships four near-identical classes differing only in widths
(``/root/reference/unet/unet_model.py``): UNet (64..1024), UNet_T (8..128),
UNet_S (16..256, the default trained model), UNet_SA (UNet_S widths + spatial
attention on every Up).  Here a single :class:`UNet` dataclass captures the
topology, and the variants are preset constructors.

Contract (mirrors the reference's model contract, ``train.py:85,108,118`` and
``unet/unet_model.py:40-50``):

* attributes ``n_channels``, ``n_classes``, ``bilinear``;
* ``init(key) -> (params, state)``;
* ``apply(params, state, x, train) -> (logits, new_state)`` with x NHWC and
  logits ``[B, H, W, n_classes]``;
* ``remat=True`` rematerializes every block (``jax.checkpoint``) — the
  TPU-native version of the reference's OOM fallback ``use_checkpointing()``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import blocks as B

__all__ = ["UNet", "unet", "unet_t", "unet_s", "unet_sa", "MODEL_REGISTRY", "get_model"]


@dataclasses.dataclass(frozen=True)
class UNet:
    """Width-parameterized 4-down/4-up UNet with optional spatial attention."""

    n_channels: int = 1
    n_classes: int = 3
    bilinear: bool = False
    widths: Tuple[int, int, int, int, int] = (16, 32, 64, 128, 256)
    use_attention: bool = False
    remat: bool = False
    compute_dtype: Optional[jnp.dtype] = None  # e.g. jnp.bfloat16
    # "auto" picks the fastest supported layout: wide (models/wide_exec.py)
    # when H, W % 16 == 0, else square s2d, else dense NHWC.
    layout: str = "auto"  # "auto" | "nhwc" | "s2d" | "wide"
    name: str = "unet_s"

    # -- construction -------------------------------------------------------
    def init(self, key):
        w = self.widths
        factor = 2 if self.bilinear else 1
        keys = jax.random.split(key, 10)
        params, state = {}, {}

        params["inc"], state["inc"] = B.init_double_conv(keys[0], self.n_channels, w[0])
        downs = [(w[0], w[1]), (w[1], w[2]), (w[2], w[3]), (w[3], w[4] // factor)]
        for i, (cin, cout) in enumerate(downs, 1):
            params[f"down{i}"], state[f"down{i}"] = B.init_double_conv(keys[i], cin, cout)
        ups = [
            (w[4], w[3] // factor),
            (w[3], w[2] // factor),
            (w[2], w[1] // factor),
            (w[1], w[0]),
        ]
        for i, (cin, cout) in enumerate(ups, 1):
            params[f"up{i}"], state[f"up{i}"] = B.init_up(
                keys[4 + i], cin, cout, self.bilinear, self.use_attention
            )
        params["outc"] = B.init_out_conv(keys[9], w[0], self.n_classes)
        return params, state

    # -- forward -------------------------------------------------------------
    def apply(self, params, state, x, *, train: bool = False, axis_name=None):
        """Forward pass.  x: [B, H, W, n_channels] -> logits [B, H, W, n_classes].

        With ``layout in ("auto", "s2d")`` and compatible shapes, runs in the
        space-to-depth layout — numerically exact, ~4-10x faster on TPU for
        the small-channel levels (ops/s2d.py).

        Rank-3 input (B, H, W) is treated as single-channel: feeding images
        this way avoids the 128x lane padding a (B, H, W, 1) *program input*
        pays in TPU HBM (~1 GB/step at 512x512 batch 8).
        """
        if x.ndim == 3:
            x = x[..., None]
        if self.layout in ("auto", "wide"):
            from .wide_exec import apply_wide, supports_wide

            if supports_wide(self, x.shape):
                return apply_wide(self, params, state, x, train=train, axis_name=axis_name)
            if self.layout == "wide":
                raise ValueError(
                    f"wide layout unsupported for input {x.shape} "
                    f"(H and W must be divisible by 16); use layout='nhwc'"
                )
        if self.layout in ("auto", "s2d"):
            from .s2d_exec import apply_s2d, supports_s2d

            if supports_s2d(self, x.shape):
                return apply_s2d(self, params, state, x, train=train, axis_name=axis_name)
            if self.layout == "s2d":
                raise ValueError(
                    f"s2d layout unsupported for input {x.shape} "
                    f"(bilinear={self.bilinear}); use layout='nhwc'"
                )
        cd = self.compute_dtype
        new_state = {}

        def ckpt(fn):
            return jax.checkpoint(fn) if self.remat else fn

        dc = functools.partial(
            B.double_conv_apply, train=train, compute_dtype=cd, axis_name=axis_name
        )
        down = functools.partial(
            B.down_apply, train=train, compute_dtype=cd, axis_name=axis_name
        )
        up = functools.partial(
            B.up_apply, bilinear=self.bilinear, train=train,
            compute_dtype=cd, axis_name=axis_name,
        )

        x1, new_state["inc"] = ckpt(dc)(params["inc"], state["inc"], x)
        x2, new_state["down1"] = ckpt(down)(params["down1"], state["down1"], x1)
        x3, new_state["down2"] = ckpt(down)(params["down2"], state["down2"], x2)
        x4, new_state["down3"] = ckpt(down)(params["down3"], state["down3"], x3)
        x5, new_state["down4"] = ckpt(down)(params["down4"], state["down4"], x4)
        y, new_state["up1"] = ckpt(up)(params["up1"], state["up1"], x5, x4)
        y, new_state["up2"] = ckpt(up)(params["up2"], state["up2"], y, x3)
        y, new_state["up3"] = ckpt(up)(params["up3"], state["up3"], y, x2)
        y, new_state["up4"] = ckpt(up)(params["up4"], state["up4"], y, x1)
        logits = B.out_conv_apply(params["outc"], y, compute_dtype=cd)
        # Logits in f32 for numerically-stable losses (autocast also upcasts
        # the loss in the reference).
        return logits.astype(jnp.float32), new_state

    # -- fused layout interface (engine/train, evaluate, predict use this) ---
    def supports_fused(self, x_shape) -> bool:
        """Can apply_fused run for this input shape?"""
        if self.layout in ("auto", "wide"):
            from .wide_exec import supports_wide

            if supports_wide(self, x_shape):
                return True
        if self.layout in ("auto", "s2d"):
            from .s2d_exec import supports_s2d

            return supports_s2d(self, x_shape)
        return False

    def apply_fused(self, params, state, x, *, train: bool = False, axis_name=None):
        """Class-major packed logits for fused loss/eval paths.

        Returns (logits_cm, new_state, blk) where blk is a layout descriptor
        ("wide", bw) or ("s2d", b) consumed by ops.wide.pack_mask /
        unpack_pred.  Lanes are class-major, so losses/s2d_fused.py works on
        either layout (it only relies on the lane-group size).
        """
        if self.layout in ("auto", "wide"):
            from .wide_exec import apply_wide, output_bw, supports_wide

            if supports_wide(self, x.shape):
                logits_cm, new_state = apply_wide(
                    self, params, state, x, train=train, axis_name=axis_name,
                    unpack_output=False, class_major=True,
                )
                return logits_cm, new_state, ("wide", output_bw(self, params))
        from .s2d_exec import apply_s2d, output_block

        logits_cm, new_state = apply_s2d(
            self, params, state, x, train=train, axis_name=axis_name,
            d2s_output=False, class_major=True,
        )
        return logits_cm, new_state, ("s2d", output_block(self, params))

    def with_options(self, **kw) -> "UNet":
        return dataclasses.replace(self, **kw)


# -- preset variants (reference unet/unet_model.py) ---------------------------

def unet(n_channels=1, n_classes=3, bilinear=False, **kw) -> UNet:
    """Standard UNet, widths 64..1024 (~40 ms comment, train.py:254)."""
    return UNet(n_channels, n_classes, bilinear,
                widths=(64, 128, 256, 512, 1024), name="unet", **kw)


def unet_t(n_channels=1, n_classes=3, bilinear=False, **kw) -> UNet:
    """Tiny UNet, widths 8..128 (~1 ms comment, train.py:250)."""
    return UNet(n_channels, n_classes, bilinear,
                widths=(8, 16, 32, 64, 128), name="unet_t", **kw)


def unet_s(n_channels=1, n_classes=3, bilinear=False, **kw) -> UNet:
    """Small UNet, widths 16..256 — the reference's default (train.py:253)."""
    return UNet(n_channels, n_classes, bilinear,
                widths=(16, 32, 64, 128, 256), name="unet_s", **kw)


def unet_sa(n_channels=1, n_classes=3, bilinear=False, **kw) -> UNet:
    """UNet_S widths with spatial attention on all Up blocks."""
    return UNet(n_channels, n_classes, bilinear,
                widths=(16, 32, 64, 128, 256), use_attention=True,
                name="unet_sa", **kw)


def _extra_registry():
    from .unet_nested import unet_pp, unet_pp_s
    from .yolov8_seg import yolov8_seg_s

    return {"unet_pp": unet_pp, "unet_pp_s": unet_pp_s, "yolov8_seg_s": yolov8_seg_s}


MODEL_REGISTRY = {
    "unet": unet,
    "unet_t": unet_t,
    "unet_s": unet_s,
    "unet_sa": unet_sa,
}


def get_model(name: str, **kw):
    registry = dict(MODEL_REGISTRY)
    if name not in registry:
        registry.update(_extra_registry())
    try:
        return registry[name](**kw)
    except KeyError:
        raise ValueError(
            f"unknown model {name!r}; available: "
            f"{sorted(MODEL_REGISTRY) + ['unet_pp', 'unet_pp_s', 'yolov8_seg_s']}"
        )
