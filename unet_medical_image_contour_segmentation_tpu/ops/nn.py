"""Core NN primitives in NHWC with PyTorch-matching numerics.

The reference model (``/root/reference/unet/unet_parts.py``) is built from
Conv2d(3x3, bias=False) / BatchNorm2d / ReLU / MaxPool2d(2) /
ConvTranspose2d(k=2, s=2) / Conv2d(1x1) / Conv2d(7x7, bias=False).  This
module provides those primitives as pure functions over parameter pytrees.

Layout: activations NHWC (TPU-native; the reference itself opts into
channels_last at ``train.py:113,262``), conv weights HWIO, transpose-conv
weights HWOI-equivalent stored as HWIO of the *forward* conv it transposes.

Mixed precision: convolutions accept a ``compute_dtype`` (bf16 on TPU —
replacing the reference's fp16 autocast + GradScaler, which TPUs don't need);
BatchNorm statistics are always computed in f32, mirroring torch autocast's
fp32 BN.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "conv2d",
    "conv_transpose2d",
    "max_pool2d",
    "batch_norm",
    "BN_EPS",
    "BN_MOMENTUM",
]

# torch.nn.BatchNorm2d defaults (used by every BN in the reference).
BN_EPS = 1e-5
BN_MOMENTUM = 0.1

_DIMNUMS = lax.conv_dimension_numbers(
    (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC")
)


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    *,
    stride: int = 1,
    padding: int = 0,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """2-D convolution, NHWC x HWIO -> NHWC.  Matches torch.nn.Conv2d."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    # No explicit preferred_element_type: the TPU MXU accumulates bf16 x bf16
    # in f32 internally and rounds to the bf16 output — the same numerics as
    # cuDNN-under-autocast — while keeping the conv VJP dtype-consistent.
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=dn,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv_transpose2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    *,
    stride: int = 2,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Transposed conv matching torch.nn.ConvTranspose2d(kernel_size=k, stride=s).

    ``w`` is stored HWIO with I = input channels of the transpose conv and
    O = its output channels (torch's (in, out, kh, kw) transposed to
    (kh, kw, in, out)).  Implemented as the equivalent input-dilated
    convolution with a spatially-flipped kernel — the exact gradient-of-conv
    semantics torch uses, and the form XLA pipelines well on TPU.
    """
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    k = w.shape[0]
    wf = w[::-1, ::-1]  # spatial flip
    dn = lax.conv_dimension_numbers(x.shape, wf.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x,
        wf,
        window_strides=(1, 1),
        padding=[(k - 1, k - 1), (k - 1, k - 1)],
        lhs_dilation=(stride, stride),
        dimension_numbers=dn,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def max_pool2d(x: jnp.ndarray, window: int = 2) -> jnp.ndarray:
    """MaxPool2d(window) with stride == window (reference uses MaxPool2d(2)).

    Floor-mode like torch: trailing rows/cols that don't fill a window are
    dropped (torch default ceil_mode=False).
    """
    n, h, w, c = x.shape
    if h % window or w % window:
        x = x[:, : (h // window) * window, : (w // window) * window, :]
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, window, window, 1),
        padding="VALID",
    )


def batch_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    running_mean: jnp.ndarray,
    running_var: jnp.ndarray,
    *,
    train: bool,
    momentum: float = BN_MOMENTUM,
    eps: float = BN_EPS,
    axis_name: Optional[str] = None,
):
    """BatchNorm2d over NHWC channels with exact torch semantics.

    Returns ``(y, (new_running_mean, new_running_var))``.

    * train: normalize with biased batch statistics; update running stats with
      ``running = (1 - momentum) * running + momentum * batch`` where the
      variance update uses the *unbiased* estimator (torch quirk).
    * eval: normalize with running statistics.
    * axis_name: if set (inside shard_map/pmap over a data mesh axis), batch
      statistics are all-reduced across that axis — cross-replica BN, so data
      parallel training matches single-device numerics.

    Statistics are computed in f32 even under bf16 compute (torch autocast
    keeps BN in fp32).
    """
    in_dtype = x.dtype
    stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(stat_dtype)
    if train:
        reduce_axes = (0, 1, 2)
        mean = jnp.mean(xf, axis=reduce_axes)
        mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
        n = x.shape[0] * x.shape[1] * x.shape[2]
        if axis_name is not None:
            mean = lax.pmean(mean, axis_name)
            mean_sq = lax.pmean(mean_sq, axis_name)
            n = n * lax.psum(1, axis_name)
        var = mean_sq - jnp.square(mean)  # biased
        unbiased_var = var * (n / max(n - 1, 1))
        new_mean = (1.0 - momentum) * running_mean + momentum * mean
        new_var = (1.0 - momentum) * running_var + momentum * unbiased_var
        use_mean, use_var = mean, var
    else:
        new_mean, new_var = running_mean, running_var
        use_mean = running_mean.astype(stat_dtype)
        use_var = running_var.astype(stat_dtype)
    inv = lax.rsqrt(use_var + eps) * scale.astype(stat_dtype)
    y = (xf - use_mean) * inv + bias.astype(stat_dtype)
    return y.astype(in_dtype), (new_mean, new_var)
