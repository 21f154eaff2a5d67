"""Space-to-depth (s2d) execution layout for small-channel conv levels.

WHY.  TPU HBM buffers are tiled (8, 128) on the last two dims, so an NHWC
tensor with C < 128 lanes is physically padded to 128 — a 512x512x16
activation costs 8x its logical bytes in bandwidth, and the MXU runs a
C_out=16 conv at ~12% lane utilization.  Measured on v5e: a dense 3x3 conv at
(512, 512, 16) runs at ~1.4 TFLOP/s, while the mathematically identical
block-conv on the s2d-transformed tensor runs at ~87 TFLOP/s.

WHAT.  A tensor at resolution (H, W, C) is stored as (H/b, W/b, b*b*C) with
lane index ((dy*b + dx)*C + c) — pixel (dy, dx) of each b x b block.  All
UNet ops have exact equivalents in this layout:

* conv k x k (stride 1, SAME):  a block-space conv with a *scattered* kernel
  K[(R,S), (di,dj,ci), (dy,dx,co)] = W[u,v,ci,co] where dy+u = (R-cen)*b+di.
  b*b times more MACs, but dense lanes and full MXU utilization more than
  pay for them at C <= 32.
* maxpool 2x2: pure lane-space regroup (block b -> b/2, same grid).
* conv-transpose k2 s2: pure lane-space matmul (block b -> 2b, same grid).
* batchnorm: per-channel stats from lane-tiled scale/bias (exact).
* concat: per-(dy,dx)-group lane concat.

Everything here is numerically exact vs the NHWC reference path (tested).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "block_for_channels",
    "s2d",
    "d2s",
    "s2d_int",
    "d2s_int",
    "repack",
    "conv_s2d",
    "conv1x1_s2d",
    "conv1x1_s2d_class_major",
    "conv_transpose2_s2d",
    "upsample2_ac_s2d",
    "max_pool2_s2d",
    "batch_norm_s2d",
    "concat_s2d",
]


def block_for_channels(c: int, max_block: int = 4) -> int:
    """Smallest power-of-two block b with b*b*c >= 128, capped at max_block."""
    b = 1
    while b < max_block and b * b * c < 128:
        b *= 2
    return b


def s2d(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/b, W/b, b*b*C)."""
    if b == 1:
        return x
    B, H, W, C = x.shape
    x = x.reshape(B, H // b, b, W // b, b, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // b, W // b, b * b * C)


def d2s(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """(B, H/b, W/b, b*b*C) -> (B, H, W, C)."""
    if b == 1:
        return x
    B, Hb, Wb, L = x.shape
    C = L // (b * b)
    x = x.reshape(B, Hb, Wb, b, b, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, Hb * b, Wb * b, C)


def repack(x: jnp.ndarray, b_from: int, b_to: int) -> jnp.ndarray:
    """Change block size at the same logical resolution."""
    if b_from == b_to:
        return x
    return s2d(d2s(x, b_from), b_to)


@functools.lru_cache(maxsize=None)
def _scatter_map(k: int, b: int) -> Tuple[np.ndarray, int]:
    """Static scatter map for a k x k SAME conv in s2d-b layout.

    Returns (map, R) where map[R_i, S_j, di, dj, dy, dx, u, v] in {0,1} and
    R is the block-space kernel size.  Nonzero iff input pixel
    (block R_i - cen, intra di) at tap (u, v) feeds output intra-pixel
    (dy, dx):  dy + (u - p) == (R_i - cen)*b + di  (same for columns).
    """
    p = k // 2
    cen = math.ceil(p / b)  # blocks of padding needed on each side
    R = 2 * cen + 1
    m = np.zeros((R, R, b, b, b, b, k, k), dtype=np.float32)
    for dy in range(b):
        for u in range(k):
            t = dy + u - p
            Ri = cen + (t // b)
            di = t % b
            for dx in range(b):
                for v in range(k):
                    s = dx + v - p
                    Sj = cen + (s // b)
                    dj = s % b
                    m[Ri, Sj, di, dj, dy, dx, u, v] = 1.0
    return m, R


def _scatter_kernel(w: jnp.ndarray, b: int) -> Tuple[jnp.ndarray, int]:
    """(k, k, Cin, Cout) -> block-space kernel (R, R, b*b*Cin, b*b*Cout)."""
    k = w.shape[0]
    cin, cout = w.shape[2], w.shape[3]
    m, R = _scatter_map(k, b)
    ws = jnp.einsum(
        "RSijyxuv,uvco->RSijcyxo", jnp.asarray(m, w.dtype), w
    )
    return ws.reshape(R, R, b * b * cin, b * b * cout), R


def conv_s2d_xla(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: int,
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """Block-conv formulation (scattered kernel via lax.conv).  b*b x the
    logical MACs but dense lanes; the linear reference the Pallas kernel's
    dw transpose uses."""
    if b == 1:
        from .nn import conv2d

        return conv2d(x, w, bias, padding=w.shape[0] // 2, compute_dtype=compute_dtype)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    ws, R = _scatter_kernel(w, b)
    pad = R // 2
    dn = lax.conv_dimension_numbers(x.shape, ws.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x, ws, (1, 1), [(pad, pad), (pad, pad)], dimension_numbers=dn
    )
    if bias is not None:
        y = y + jnp.tile(bias, b * b).astype(y.dtype)
    return y


def conv_s2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: int,
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """k x k stride-1 SAME conv on an s2d-b tensor; exact NHWC-conv equivalent.

    x: (B, H/b, W/b, b*b*Cin); w: (k, k, Cin, Cout) original kernel.

    Set UMICS_PALLAS=1 to dispatch b == 4 3x3 convs (8 <= Cin <= 32) to the
    Pallas im2col kernel (ops/pallas_conv.py).  In isolation it beats the XLA
    block-conv ~1.15x (4x fewer MACs, double-buffered halo DMA: 1.97 vs
    2.29 ms for the cin=16 level-0 conv), but END-TO-END the model runs ~3%
    SLOWER with it: the custom call is a fusion barrier, so XLA can no longer
    fold the surrounding pad/BN/ReLU into the conv — the default stays XLA.
    A winning kernel must fuse the whole Conv+BN+ReLU level.
    """
    import os

    if (
        b == 4
        and w.shape[0] == 3
        and 8 <= w.shape[2] <= 32
        and os.environ.get("UMICS_PALLAS") == "1"
    ):
        from .pallas_conv import conv_s2d_b4_im2col, pallas_supported

        if pallas_supported(x.shape):
            if compute_dtype is not None:
                x = x.astype(compute_dtype)
                w = w.astype(compute_dtype)
            y = conv_s2d_b4_im2col(x, w)
            if bias is not None:
                y = y + jnp.tile(bias, b * b).astype(y.dtype)
            return y
    return conv_s2d_xla(x, w, b, bias, compute_dtype)


def conv1x1_s2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: int,
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """1x1 conv: per-(dy,dx)-group matmul over channels (no spatial movement)."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    B, Hb, Wb, L = x.shape
    cin, cout = w.shape[2], w.shape[3]
    g = L // cin
    xg = x.reshape(B, Hb, Wb, g, cin)
    y = jnp.einsum("bhwgc,cd->bhwgd", xg, w[0, 0])
    y = y.reshape(B, Hb, Wb, g * cout)
    if bias is not None:
        y = y + jnp.tile(bias, g).astype(y.dtype)
    return y


def conv_transpose2_s2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: int,
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """ConvTranspose2d(k=2, s=2) on an s2d-b tensor -> s2d-(2b) tensor.

    Each input pixel (dy, dx) produces output pixels (2dy+r, 2dx+s) with
    weight w[r, s] — a pure lane-space contraction (same block grid).
    w: (2, 2, Cin, Cout) in HWIO (our torch-compat storage).
    """
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    B, Hb, Wb, L = x.shape
    cin, cout = w.shape[2], w.shape[3]
    g = L // cin  # = b*b
    xg = x.reshape(B, Hb, Wb, b, b, cin)
    # y[dy, r, dx, s, co] so the flat lane index is ((2dy+r)*2b + (2dx+s))*co
    y = jnp.einsum("bhwyxc,rsco->bhwyrxso", xg, w)
    y = y.reshape(B, Hb, Wb, (2 * b) * (2 * b) * cout)
    if bias is not None:
        y = y + jnp.tile(bias, (2 * b) * (2 * b)).astype(y.dtype)
    return y


@functools.lru_cache(maxsize=None)
def _upsample2_band_np(size: int, b: int):
    """Banded block form of the x2 align_corners=True interpolation matrix.

    The (2*size, size) torch-semantics matrix (ops/resize.py) reshaped to
    blocks: output grid row Ho only reads input grid rows {Ho-1, Ho, Ho+1}
    (src index of output i lies in [i/2 - 1/2, i/2], so the band is 1 block
    either side).  Returns three (size/b, 2b, b) numpy tensors
    (A_prev, A_same, A_next); boundary blocks of A_prev/A_next are zero.
    """
    from .resize import _interp_matrix_np

    m = _interp_matrix_np(size, 2 * size, True)  # (2*size, size)
    nb = size // b
    mr = m.reshape(nb, 2 * b, nb, b)
    a_prev = np.zeros((nb, 2 * b, b), np.float32)
    a_same = np.zeros((nb, 2 * b, b), np.float32)
    a_next = np.zeros((nb, 2 * b, b), np.float32)
    check = np.zeros_like(mr)
    for ho in range(nb):
        a_same[ho] = mr[ho, :, ho, :]
        check[ho, :, ho, :] = mr[ho, :, ho, :]
        if ho > 0:
            a_prev[ho] = mr[ho, :, ho - 1, :]
            check[ho, :, ho - 1, :] = mr[ho, :, ho - 1, :]
        if ho < nb - 1:
            a_next[ho] = mr[ho, :, ho + 1, :]
            check[ho, :, ho + 1, :] = mr[ho, :, ho + 1, :]
    assert np.array_equal(check, mr), "x2 upsample bandwidth exceeded one block"
    return a_prev, a_same, a_next


def _shift_grid(x: jnp.ndarray, axis: int, direction: int) -> jnp.ndarray:
    """Neighbor block row/column with zero boundary (direction +1 = previous)."""
    pad = [(0, 0)] * x.ndim
    if direction > 0:
        pad[axis] = (1, 0)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, x.shape[axis])
    else:
        pad[axis] = (0, 1)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(1, x.shape[axis] + 1)
    return jnp.pad(x, pad)[tuple(sl)]


def upsample2_ac_s2d(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """Bilinear x2 upsample (align_corners=True) on an s2d-b tensor -> s2d-2b.

    Exact torch ``nn.Upsample(scale_factor=2, align_corners=True)`` semantics
    (reference unet/unet_parts.py:70) without ever leaving lane space: the
    interpolation matrix is block-banded, so each output block is three small
    (2b x b) matmuls against the same / previous / next input block per axis
    — O(b) work per output element vs the O(H) dense-matrix contraction the
    NHWC path uses, and the tensor keeps >= 128 dense lanes throughout.
    """
    B, Hb, Wb, L = x.shape
    c = L // (b * b)
    in_dtype = x.dtype
    xg = x.astype(jnp.float32).reshape(B, Hb, Wb, b, b, c)

    ap, a0, an = (jnp.asarray(a) for a in _upsample2_band_np(Hb * b, b))
    # rows: dy (b) -> dy_o (2b)
    y = jnp.einsum("hyd,bhwdxc->bhwyxc", a0, xg)
    y += jnp.einsum("hyd,bhwdxc->bhwyxc", ap, _shift_grid(xg, 1, +1))
    y += jnp.einsum("hyd,bhwdxc->bhwyxc", an, _shift_grid(xg, 1, -1))

    bp, b0, bn = (jnp.asarray(a) for a in _upsample2_band_np(Wb * b, b))
    # cols: dx (b) -> dx_o (2b)
    z = jnp.einsum("wxs,bhwysc->bhwyxc", b0, y)
    z += jnp.einsum("wxs,bhwysc->bhwyxc", bp, _shift_grid(y, 2, +1))
    z += jnp.einsum("wxs,bhwysc->bhwyxc", bn, _shift_grid(y, 2, -1))
    return z.reshape(B, Hb, Wb, (2 * b) * (2 * b) * c).astype(in_dtype)


def max_pool2_s2d(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """MaxPool2d(2) on an s2d-b tensor -> s2d-(b/2) tensor (b must be even).

    Pure lane-space regroup: every 2x2 pixel window lives inside one block.
    """
    assert b % 2 == 0, "max_pool2_s2d needs an even block"
    B, Hb, Wb, L = x.shape
    c = L // (b * b)
    xg = x.reshape(B, Hb, Wb, b // 2, 2, b // 2, 2, c)
    y = jnp.max(xg, axis=(4, 6))
    return y.reshape(B, Hb, Wb, (b // 2) * (b // 2) * c)


def batch_norm_s2d(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    running_mean: jnp.ndarray,
    running_var: jnp.ndarray,
    b: int,
    *,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
    axis_name=None,
    groups: Optional[int] = None,
):
    """BatchNorm2d with exact torch semantics on an s2d-b tensor.

    Stats are per *original* channel: lane stats are regrouped (groups, C)
    and averaged; normalization applies lane-tiled scale/bias so the tensor
    never leaves its dense layout.  ``groups`` defaults to b*b (square
    blocks); the wide layout passes groups=bw (ops/wide.py).
    """
    in_dtype = x.dtype
    g = b * b if groups is None else groups
    c = x.shape[-1] // g
    xf = x.astype(jnp.float32)
    if train:
        lane_mean = jnp.mean(xf, axis=(0, 1, 2))           # (g*C,)
        lane_mean_sq = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2] * g
        if axis_name is not None:
            lane_mean = lax.pmean(lane_mean, axis_name)
            lane_mean_sq = lax.pmean(lane_mean_sq, axis_name)
            n = n * lax.psum(1, axis_name)
        mean = jnp.mean(lane_mean.reshape(g, c), axis=0)
        mean_sq = jnp.mean(lane_mean_sq.reshape(g, c), axis=0)
        var = mean_sq - jnp.square(mean)
        unbiased = var * (n / max(n - 1, 1))
        new_mean = (1 - momentum) * running_mean + momentum * mean
        new_var = (1 - momentum) * running_var + momentum * unbiased
        use_mean, use_var = mean, var
    else:
        new_mean, new_var = running_mean, running_var
        use_mean = running_mean.astype(jnp.float32)
        use_var = running_var.astype(jnp.float32)
    inv = lax.rsqrt(use_var + eps) * scale.astype(jnp.float32)
    shift = bias.astype(jnp.float32) - use_mean * inv
    y = xf * jnp.tile(inv, g) + jnp.tile(shift, g)
    return y.astype(in_dtype), (new_mean, new_var)


def concat_s2d(xs, b: int, channels) -> jnp.ndarray:
    """Channel-concat of same-layout s2d tensors (per-(dy,dx)-group concat).

    ``channels``: original channel count of each tensor.
    """
    g = b * b
    parts = [
        x.reshape(*x.shape[:-1], g, c) for x, c in zip(xs, channels)
    ]
    y = jnp.concatenate(parts, axis=-1)
    return y.reshape(*y.shape[:-2], g * sum(channels))


def conv1x1_s2d_class_major(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: int,
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """1x1 conv emitting CLASS-MAJOR lanes: y[..., co*g + (dy*b+dx)].

    With class as the slow lane index, per-class tensors are contiguous lane
    slices of width g = b*b — softmax/argmax/one-hot over classes become
    elementwise ops on dense slices, never leaving the s2d layout.  Used by
    the fused loss/eval paths (losses/s2d_fused.py).
    """
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    B, Hb, Wb, L = x.shape
    cin, cout = w.shape[2], w.shape[3]
    g = L // cin
    xg = x.reshape(B, Hb, Wb, g, cin)
    y = jnp.einsum("bhwgc,cd->bhwdg", xg, w[0, 0])  # (..., cout, g)
    y = y.reshape(B, Hb, Wb, cout * g)
    if bias is not None:
        y = y + jnp.repeat(bias, g).astype(y.dtype)
    return y


def s2d_int(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """(B, H, W) integer map -> (B, H/b, W/b, b*b) s2d lanes."""
    if b == 1:
        return x[..., None]
    B, H, W = x.shape
    x = x.reshape(B, H // b, b, W // b, b)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(B, H // b, W // b, b * b)


def d2s_int(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """(B, H/b, W/b, b*b) -> (B, H, W) integer map."""
    if b == 1:
        return x[..., 0]
    B, Hb, Wb, g = x.shape
    x = x.reshape(B, Hb, Wb, b, b)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(B, Hb * b, Wb * b)
