"""Width-only blocked ("wide") execution layout — lane-dense with free transitions.

A tensor at resolution (H, W, C) is stored as (H, W/bw, bw*C) with lane index
(dx*C + c).  Like the square s2d layout (ops/s2d.py) this keeps >= 128 dense
lanes for small C, but blocking ONLY the width has two structural advantages
measured on v5e (see CLAUDE.md conv landscape):

* **Half the MAC inflation.**  An XLA block conv's MAC inflation equals the
  lane-padding factor L/C for any block shape, so the minimum for a k x k
  conv is reached at the smallest L >= 128: bw = 128/C.  Square s2d-b4
  (L = 256 for C=16) pays 16x; wide-8 (L = 128) pays 8x — measured 1.43x
  faster for the 512^2 C=16 level, 1.09x for the C=64 level (wide-2 vs b2).
  The kernel's H-extent stays k (H is a spatial dim), W-extent is
  2*ceil((k//2)/bw)+1 blocks.

* **Free layout transitions.**  (H, W/bw, bw*C) <-> (H, W/bw', bw'*C) <->
  dense NHWC are all row-major reshapes of the last two dims — no
  lane<->sublane transpose, so every level can run at its own optimal bw
  and the decoder can concat/reblock at will.  (Square s2d needs scatter
  repacks between block plans.)

All ops here are numerically exact equivalents of their NHWC counterparts
(tested in tests/test_wide.py) and fully autodiff-able.
"""

from __future__ import annotations

import contextlib
import functools
import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "wide_block",
    "pack",
    "unpack",
    "pack_int",
    "unpack_int",
    "reblock",
    "conv_wide",
    "conv_wide_int8",
    "conv_wide_split_int8",
    "conv1x1_wide_int8",
    "conv1x1_wide",
    "conv1x1_wide_class_major",
    "conv_transpose2_wide",
    "conv_transpose2_wide_dilated",
    "conv_transpose2_wide_einsum",
    "max_pool2_wide",
    "upsample2_ac_wide",
    "batch_norm_wide",
    "no_h_fold",
    "conv_wide_split",
    "conv1x1_wide_split",
    "concat_wide",
    "split_wide",
]


def wide_block(c: int, max_bw: int = 8) -> int:
    """Largest power-of-two bw <= max_bw with bw*c just covering 128 lanes."""
    bw = 1
    while bw < max_bw and bw * c < 128:
        bw *= 2
    return bw


# -- packing: all pure reshapes ------------------------------------------------

def pack(x: jnp.ndarray, bw: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W/bw, bw*C)."""
    if bw == 1:
        return x
    B, H, W, C = x.shape
    return x.reshape(B, H, W // bw, bw * C)


def unpack(x: jnp.ndarray, bw: int) -> jnp.ndarray:
    if bw == 1:
        return x
    B, H, Wb, L = x.shape
    return x.reshape(B, H, Wb * bw, L // bw)


def pack_int(m: jnp.ndarray, bw: int) -> jnp.ndarray:
    """(B, H, W) integer map -> (B, H, W/bw, bw)."""
    B, H, W = m.shape
    return m.reshape(B, H, W // bw, bw)


def unpack_int(m: jnp.ndarray, bw: int) -> jnp.ndarray:
    B, H, Wb, g = m.shape
    return m.reshape(B, H, Wb * g)


def reblock(x: jnp.ndarray, bw_from: int, bw_to: int) -> jnp.ndarray:
    """Change block width at the same resolution (pure reshape)."""
    if bw_from == bw_to:
        return x
    return pack(unpack(x, bw_from), bw_to)


# -- convolution ----------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _scatter_map_wide(k: int, bw: int, stride: int = 1) -> Tuple[np.ndarray, int, int]:
    """Static scatter for a k x k SAME conv: width taps -> block-lane taps.

    Returns (map, cen, R): map[Rj, dxi, dxo, v] in {0,1}, R = W-block kernel
    extent, cen = index of the aligned (zero-offset) block.  Nonzero iff
    input pixel (block Rj - cen, intra dxi) at width tap v feeds output
    intra-pixel dxo: stride*dxo + v - p == (Rj - cen)*bw + dxi.

    With stride > 1 the output block narrows to bw//stride intra-pixels but
    the BLOCK GRID COUNT is preserved (output width = W/stride), so the
    block-space conv always runs W-stride 1.
    """
    p = k // 2
    bwo = bw // stride
    cen = math.ceil(p / bw)
    hi = (stride * (bwo - 1) + (k - 1) - p) // bw
    R = cen + hi + 1
    m = np.zeros((R, bw, bwo, k), np.float32)
    for dxo in range(bwo):
        for v in range(k):
            t = stride * dxo + v - p
            m[cen + (t // bw), t % bw, dxo, v] = 1.0
    return m, cen, R


def _scatter_kernel_wide(w: jnp.ndarray, bw: int, stride: int = 1):
    """(k, k, Cin, Cout) -> ((k, R, bw*Cin, (bw//stride)*Cout), cen, R)."""
    k = w.shape[0]
    cin, cout = w.shape[2], w.shape[3]
    m, cen, R = _scatter_map_wide(k, bw, stride)
    ws = jnp.einsum("Rixv,uvco->uRicxo", jnp.asarray(m, w.dtype), w)
    return ws.reshape(k, R, bw * cin, (bw // stride) * cout), cen, R


# XLA's TPU conv emitter switches to a ~2x-slower (mostly backward-pass)
# strategy once one image's spatial plane H * W' exceeds this many positions
# (measured on v5e: (2,1024,128) and (4,512,128) grads run 9.5 ms where the
# equal-MAC (8,512,64) / (8,256,128) shapes run 5.0 ms).  conv_wide folds H
# into the batch dim with a halo to stay below it — numerically exact.
H_FOLD_PLANE = 32768
_H_FOLD_MIN_ROWS = 64  # keeps halo duplication overhead under ~3%
_H_FOLD_SUPPRESSED = [False]


@contextlib.contextmanager
def no_h_fold():
    """Disable H->batch folding for code traced inside this context.

    Used by the GSPMD spatial train step (parallel/spatial.py): there the H
    axis is SHARDED over the mesh, and folding it into batch would replace
    cheap halo exchanges with all-to-all reshards around every conv."""
    prev = _H_FOLD_SUPPRESSED[0]
    _H_FOLD_SUPPRESSED[0] = True
    try:
        yield
    finally:
        _H_FOLD_SUPPRESSED[0] = prev


def _h_fold_factor(h: int, wp: int, stride: int) -> int:
    """Chunks to split H into so each chunk's plane fits H_FOLD_PLANE.

    Only narrow-W' shapes are in the slow regime: every measured slow case
    has W' <= 128 ((2,1024,128), (4,512,128)); at W' = 256 (the big unet's
    C=64 level at 512²) the unfolded conv is fine and folding COSTS 28%
    (interleaved A/B: 129 vs 101 ms full train step) — XLA can tile a wide
    W' dimension itself.
    """
    if _H_FOLD_SUPPRESSED[0] or stride != 1 or wp > 128 \
            or h * wp <= H_FOLD_PLANE:
        return 1
    f = 1
    while (
        h % (f * 2) == 0
        and h // (f * 2) >= _H_FOLD_MIN_ROWS
        and (h // f) * wp > H_FOLD_PLANE
    ):
        f *= 2
    return f


def conv_wide(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bw: int,
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=None,
    stride: int = 1,
    h_fold: bool = True,
) -> jnp.ndarray:
    """k x k SAME conv on a wide-bw tensor; exact NHWC equivalent.

    x: (B, H, W/bw, bw*Cin); w: (k, k, Cin, Cout) -> (B, H/stride, W/bw,
    (bw/stride)*Cout).  Stride 1 preserves the block; stride s narrows the
    intra-block width to bw/s (requires bw % s == 0 for bw > 1), keeping the
    block grid count — the output is wide-(bw/s) at W/s resolution.

    With ``h_fold`` (the default), large planes (H * W' > H_FOLD_PLANE,
    e.g. 1024x1024 inputs) are folded: H splits into overlapping chunks
    (halo k//2 rows each side, conv VALID in H over the globally padded
    tensor) stacked into the batch dim — the same sums in the same order,
    so bit-exact, but the per-image plane stays in XLA's fast conv regime.
    The win is in the BACKWARD (level-0 grad 9.5 -> 5.1 ms, full unet_s
    1024^2 train step 49.5 -> 41.9 ms on v5e); the folded forward alone is
    ~11%% slower (overlap copies), so eval callers pass h_fold=False.
    """
    if bw == 1:
        from .nn import conv2d

        return conv2d(x, w, bias, stride=stride, padding=w.shape[0] // 2,
                      compute_dtype=compute_dtype)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    assert bw % stride == 0, f"stride {stride} must divide block width {bw}"
    ws, cen, R = _scatter_kernel_wide(w, bw, stride)
    k = w.shape[0]
    ph = k // 2
    f = _h_fold_factor(x.shape[1], x.shape[2], stride) if h_fold else 1
    if f > 1:
        b, h, wp, lanes = x.shape
        ch = h // f
        xp = jnp.pad(x, ((0, 0), (ph, ph), (0, 0), (0, 0)))
        chunks = [
            lax.slice_in_dim(xp, i * ch, i * ch + ch + 2 * ph, axis=1)
            for i in range(f)
        ]
        x = jnp.stack(chunks, axis=1).reshape(b * f, ch + 2 * ph, wp, lanes)
        h_pad = (0, 0)  # VALID in H: the global pad + halo is already applied
    else:
        h_pad = (ph, ph)
    dn = lax.conv_dimension_numbers(x.shape, ws.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x, ws, (stride, 1), [h_pad, (cen, R - 1 - cen)],
        dimension_numbers=dn,
    )
    if f > 1:  # (b*f, ch, wp, L) -> (b, f*ch == H, wp, L); chunks are b-major
        y = y.reshape(x.shape[0] // f, -1, y.shape[2], y.shape[3])
    if bias is not None:
        y = y + jnp.tile(bias, bw // stride).astype(y.dtype)
    return y


def conv_wide_int8(x: jnp.ndarray, w: jnp.ndarray, bw: int,
                   stride: int = 1) -> jnp.ndarray:
    """k x k SAME conv on an int8 wide tensor -> int32 accumulators.

    x: (B, H, W/bw, bw*Cin) int8; w: (k, k, Cin, Cout) int8 (LOGICAL HWIO —
    the wide kernel scatter happens here).  A true int8 x int8 -> int32 MXU
    conv: 2x the bf16 peak on v5e and half the HBM activation bytes —
    measured 1.36x/1.09x/1.12x vs bf16 at unet_s's level-0/2/4 shapes with
    the full requant epilogue included (benchmarks/probe_int8.py).

    ``stride`` narrows the block in place as conv_wide does (bw -> bw/stride
    for bw > 1; plain strided conv at bw == 1) — the YOLO backbone's
    stride-2 downsample CBS convs.

    The scatter einsum runs in f32 (entries are exact copies of int8 values,
    so the cast back to int8 is lossless).  Eval-only: no h_fold (the folded
    forward is slower — CLAUDE.md), no bias; the dequant / requant epilogues
    live in models/quantize.py.
    """
    assert x.dtype == jnp.int8 and w.dtype == jnp.int8, (x.dtype, w.dtype)
    k = w.shape[0]
    if bw == 1:
        dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            x, w, (stride, stride), [(k // 2, k // 2)] * 2,
            dimension_numbers=dn, preferred_element_type=jnp.int32)
    assert bw % stride == 0, f"stride {stride} must divide block width {bw}"
    ws, cen, R = _scatter_kernel_wide(w.astype(jnp.float32), bw, stride)
    ws = ws.astype(jnp.int8)
    dn = lax.conv_dimension_numbers(x.shape, ws.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x, ws, (stride, 1), [(k // 2, k // 2), (cen, R - 1 - cen)],
        dimension_numbers=dn, preferred_element_type=jnp.int32)


def conv1x1_wide_int8(x: jnp.ndarray, w: jnp.ndarray, bw: int) -> jnp.ndarray:
    """1x1 conv on an int8 wide tensor -> int32 (per-dx-group matmul).

    The int8 twin of conv1x1_wide: lanes are (dx, c) so the group reshape
    exposes logical channels to one (cin, cout) int8 matmul; per-part input
    scales for mixed-scale concat inputs fold into the kernel's cin slices
    upstream (models/quantize.py), exactly as for the 3x3 split convs.
    """
    assert x.dtype == jnp.int8 and w.dtype == jnp.int8, (x.dtype, w.dtype)
    B, Hb, Wb, L = x.shape
    cin, cout = w.shape[2], w.shape[3]
    g = L // cin
    xg = x.reshape(B, Hb, Wb, g, cin)
    y = jnp.einsum("bhwgc,cd->bhwgd", xg, w[0, 0],
                   preferred_element_type=jnp.int32)
    return y.reshape(B, Hb, Wb, g * cout)


def conv_wide_split_int8(xs, channels, w, bw: int) -> jnp.ndarray:
    """``conv_wide_int8(concat_wide(xs, bw, channels), w, bw)`` without the
    concat: kernel-split partial convs summed in int32 (exact — integer
    addition is associative, unlike the float split in conv_wide_split).
    Mixed input scales are handled UPSTREAM by folding each part's
    activation scale into the kernel's cin slice before weight quantization
    (models/quantize.py), so the int32 partials share one dequant scale.
    """
    assert len(xs) == len(channels), (len(xs), len(channels))
    assert sum(channels) == w.shape[2], (channels, w.shape)
    if bw == 1:  # dense channel concat is already shuffle-free at bw == 1
        return conv_wide_int8(jnp.concatenate(xs, axis=-1), w, bw)
    off, y = 0, None
    for x, c in zip(xs, channels):
        part = conv_wide_int8(x, w[:, :, off:off + c, :], bw)
        y = part if y is None else y + part
        off += c
    return y


def conv1x1_wide(x, w, bw, bias=None, compute_dtype=None):
    """1x1 conv: per-dx-group channel matmul (layout-preserving)."""
    from .s2d import conv1x1_s2d  # group count derived from shapes, not b

    return conv1x1_s2d(x, w, bw, bias, compute_dtype=compute_dtype)


def conv1x1_wide_class_major(x, w, bw, bias=None, compute_dtype=None):
    """1x1 conv emitting class-major lanes (co*bw + dx) for the fused losses."""
    from .s2d import conv1x1_s2d_class_major

    return conv1x1_s2d_class_major(x, w, bw, bias, compute_dtype=compute_dtype)


# -- pooling / upsampling --------------------------------------------------------

def max_pool2_wide(x: jnp.ndarray, bw: int) -> jnp.ndarray:
    """MaxPool2d(2): rows pair-max (sublane) + lane pair-max.

    (B, H, W/bw, bw*C) -> (B, H/2, W/(2*?) ...): for bw >= 2 the grid is
    unchanged and the block halves (bw -> bw/2); for bw == 1 the W axis
    itself halves (plain NHWC pooling).
    """
    y = jnp.maximum(x[:, 0::2], x[:, 1::2])
    if bw == 1:
        return jnp.maximum(y[:, :, 0::2], y[:, :, 1::2])
    B, H2, Wb, L = y.shape
    c = L // bw
    yg = y.reshape(B, H2, Wb, bw // 2, 2, c)
    return jnp.max(yg, axis=4).reshape(B, H2, Wb, (bw // 2) * c)


def conv_transpose2_wide_einsum(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bw: int,
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """ConvTranspose2d(k=2, s=2), per-row-parity einsum form (r4 default).

    SUPERSEDED as the default by :func:`conv_transpose2_wide_dilated` (r5):
    the r5 HLO audit showed this form's assembly — two dot-output layout
    copies, a pad/maximum stack, and the H-merge reshape — costs ~1.15 ms
    of the 4.68 ms yolov8_seg predict step, and the dilated-conv form
    measured 1.37x end-to-end there (1.07-1.10x on the UNet family).  Kept
    for A/B probes (benchmarks/probe_convt2.py) and as the reference
    formulation.

    Row doubling rides the (spatial) H axis via an interleaving reshape;
    width doubling is a pure lane expansion.  w: (2, 2, Cin, Cout) HWIO.
    One dot PER OUTPUT-ROW PARITY r: the single-einsum form
    ``bhwxc,rsco->bhrwxso`` needs r moved between h and w — a physical
    transpose copy of the full 2x-res tensor.  Splitting r gives each dot
    the NATURAL output order == the wide lane order (2*dx+s, co); the bias
    add fuses into the dot epilogue.
    """
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    B, H, Wb, L = x.shape
    cin, cout = w.shape[2], w.shape[3]
    xg = x.reshape(B, H, Wb, bw, cin)
    rows = []
    for r in range(2):
        # yr[b, h, wb, dx, s, co]: output row 2h+r, intra-pixel 2dx+s
        yr = jnp.einsum("bhwxc,sco->bhwxso", xg, w[r])
        if bias is not None:
            yr = yr + bias.astype(yr.dtype)
        rows.append(yr.reshape(B, H, Wb, 2 * bw * cout))
    return jnp.stack(rows, axis=2).reshape(B, 2 * H, Wb, 2 * bw * cout)


@functools.lru_cache(maxsize=None)
def _convt_scatter_map(bw: int) -> np.ndarray:
    """m[dx, s, p] = 1 iff intra-pixel dx at kernel W-tap s writes output
    intra-pixel p = 2*dx + s (all within ONE block: R = 1)."""
    m = np.zeros((bw, 2, 2 * bw), np.float32)
    for dx in range(bw):
        for s in range(2):
            m[dx, s, 2 * dx + s] = 1.0
    return m


def conv_transpose2_wide_dilated(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bw: int,
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """ConvTranspose2d(k=2, s=2) on a wide-bw tensor, as ONE dilated conv.

    Same contract as :func:`conv_transpose2_wide` — (B, H, Wb, bw*Cin) ->
    (B, 2H, Wb, 2bw*Cout), i.e. wide-(2bw) at 2x resolution — but H rides
    the conv engine (``lhs_dilation=(2, 1)`` with the H-flipped kernel, the
    exact gradient-of-strided-conv form ops/nn.py:conv_transpose2d uses
    dense) and W rides the lane dim via a scatter kernel: output intra-pixel
    2*dx+s reads input intra-pixel dx at kernel tap s — all within one
    block, so the W extent is a single block (R = 1) and the conv emits the
    doubled lanes IN PLACE.

    Why: the per-row-parity einsum form materializes its two dot outputs
    (layout copies), a pad/maximum stack, and an H-merge reshape — measured
    ~1.15 ms of the 4.68 ms yolov8_seg predict step (r5 HLO audit).  Here
    the whole ConvT is one conv op with a conv-native output layout.  The
    lane scatter inflates MACs by 2*bw over the logical ConvT, but these
    ConvTs are tiny (cin = cout = C/4 at the proto head) and the op
    replaces memory passes, not FLOPs.  Measured on v5e (r5,
    benchmarks/probe_convt2.py, interleaved 128-step chains): yolo predict
    1.37x, unet_s predict 1.09x / train 1.07x, unet_pp_s predict 1.10x
    end-to-end — THE DEFAULT ``conv_transpose2_wide`` since r5.  Forward
    bit-identical to the dense NHWC ConvT (it is the same lhs-dilated conv
    formulation ops/nn.py:conv_transpose2d lowers to).
    """
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    cin, cout = w.shape[2], w.shape[3]
    m = jnp.asarray(_convt_scatter_map(bw), w.dtype)
    # wk[v, dx, c, p, o] = w[1-v, s, c, o] where p == 2*dx+s
    wk = jnp.einsum("xsp,vsco->vxcpo", m, w[::-1])
    wk = wk.reshape(2, 1, bw * cin, 2 * bw * cout)
    dn = lax.conv_dimension_numbers(x.shape, wk.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x, wk, (1, 1), [(1, 1), (0, 0)],
        lhs_dilation=(2, 1), dimension_numbers=dn,
    )
    if bias is not None:
        y = y + jnp.tile(bias, 2 * bw).astype(y.dtype)
    return y


# r5 default: the dilated-conv formulation (see its docstring for the
# measured wins); probes monkeypatch this module attribute to A/B.
conv_transpose2_wide = conv_transpose2_wide_dilated


def upsample2_ac_wide(x: jnp.ndarray, bw: int) -> jnp.ndarray:
    """Bilinear x2 upsample (align_corners=True), wide-bw -> wide-(2bw) at 2x.

    H axis: gather + lerp with static torch-semantics indices (sublane
    gathers, lanes stay dense).  W axis: the same banded block matmuls the
    square layout uses (ops/s2d.py:_upsample2_band_np) restricted to one
    axis.  Exact vs ops/resize.upsample_x2_align_corners.
    """
    from .resize import _interp_matrix_np
    from .s2d import _shift_grid, _upsample2_band_np

    B, H, Wb, L = x.shape
    c = L // bw
    in_dtype = x.dtype
    xf = x.astype(jnp.float32)

    # rows: out[i] = (1-f) * x[i0] + f * x[i1]
    mat = _interp_matrix_np(H, 2 * H, True)
    i0 = np.argmax(mat > 0, axis=1)
    frac = 1.0 - mat[np.arange(2 * H), i0]
    i1 = np.minimum(i0 + 1, H - 1)
    f = jnp.asarray(frac, jnp.float32)[None, :, None, None]
    y = jnp.take(xf, jnp.asarray(i0), axis=1) * (1.0 - f) + \
        jnp.take(xf, jnp.asarray(i1), axis=1) * f

    # cols: banded block matmuls, band = one block either side
    bp, b0, bn = (jnp.asarray(a) for a in _upsample2_band_np(Wb * bw, bw))
    yg = y.reshape(B, 2 * H, Wb, bw, c)
    z = jnp.einsum("wxs,bhwsc->bhwxc", b0, yg)
    z += jnp.einsum("wxs,bhwsc->bhwxc", bp, _shift_grid(yg, 2, +1))
    z += jnp.einsum("wxs,bhwsc->bhwxc", bn, _shift_grid(yg, 2, -1))
    return z.reshape(B, 2 * H, Wb, 2 * bw * c).astype(in_dtype)


# -- normalization / concat -------------------------------------------------------

def batch_norm_wide(x, scale, bias, running_mean, running_var, bw, *,
                    train: bool, momentum: float = 0.1, eps: float = 1e-5,
                    axis_name=None):
    """BatchNorm2d with torch semantics on a wide-bw tensor (lane groups bw)."""
    from .s2d import batch_norm_s2d

    return batch_norm_s2d(
        x, scale, bias, running_mean, running_var, bw,
        train=train, momentum=momentum, eps=eps, axis_name=axis_name,
        groups=bw,
    )


# Opt-in custom_vjp for conv_wide_split (UMICS_SPLIT_CVJP=1): computes the
# backward's dx contributions as EXPLICIT flipped-kernel conv_wide calls
# instead of XLA's conv-transpose autodiff — the r4 bounded probe
# (benchmarks/probe_vjp.py) for whether restructuring the dx path removes
# the {3,0,2,1} layout copies feeding add_any in the train step's HLO
# (24% of the r3 step profile).  Mathematically identical (adjoint of a
# stride-1 SAME odd-k conv == SAME conv with the spatially-flipped,
# in/out-swapped kernel); floats differ by accumulation order, so this
# stays opt-in unless it wins end-to-end.
SPLIT_CUSTOM_VJP = [os.environ.get("UMICS_SPLIT_CVJP", "0") == "1"]


def _split_conv_impl(channels, bw, cd, h_fold, xs, w):
    off, y = 0, None
    for x, c in zip(xs, channels):
        part = conv_wide(x, w[:, :, off:off + c, :], bw,
                         compute_dtype=cd, h_fold=h_fold)
        y = part if y is None else y + part
        off += c
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _split_conv_cvjp(channels, bw, cd, h_fold, xs, w):
    return _split_conv_impl(channels, bw, cd, h_fold, xs, w)


def _split_conv_cvjp_fwd(channels, bw, cd, h_fold, xs, w):
    return _split_conv_impl(channels, bw, cd, h_fold, xs, w), (xs, w)


def _split_conv_cvjp_bwd(channels, bw, cd, h_fold, res, dy):
    xs, w = res
    dxs, off = [], 0
    for x, c in zip(xs, channels):
        # adjoint as a forward-style conv: flip spatially, swap in/out
        wf = jnp.flip(w[:, :, off:off + c, :], (0, 1)).swapaxes(2, 3)
        dx = conv_wide(dy, wf, bw, compute_dtype=cd, h_fold=h_fold)
        dxs.append(dx.astype(x.dtype))
        off += c
    # dw via XLA's native wgrad of each partial conv (that path profiled fine)
    dws, off = [], 0
    for x, c in zip(xs, channels):
        _, vjp_fn = jax.vjp(
            lambda wi, _x=x: conv_wide(_x, wi, bw, compute_dtype=cd,
                                       h_fold=h_fold),
            w[:, :, off:off + c, :],
        )
        dws.append(vjp_fn(dy)[0])
        off += c
    return tuple(dxs), jnp.concatenate(dws, axis=2)


_split_conv_cvjp.defvjp(_split_conv_cvjp_fwd, _split_conv_cvjp_bwd)


def conv_wide_split(xs, channels, w, bw: int, bias=None, compute_dtype=None,
                    h_fold: bool = True) -> jnp.ndarray:
    """``conv_wide(concat_wide(xs, bw, channels), w, bw)`` without the concat.

    ``concat_wide`` interleaves lanes per dx group — a full-tensor shuffle
    (and an equally expensive slice-shuffle in its VJP).  Splitting the
    kernel on its input-channel axis and summing the partial convs computes
    the identical MACs with no shuffle: measured 2.4x faster forward /
    1.6x faster grad at the 512^2 C=16 decoder level on v5e.  The partial
    sums reassociate the K-reduction, so results match concat+conv to
    accumulation order (exact in f32 on CPU tests' tolerances).

    Only use when every part is lane-dense (c_i * bw >= 128): half-empty
    parts make each partial conv pad its lanes and measured 10% slower
    end-to-end on YOLO's C2f (c*bw = 64) — keep concat_wide there.  At
    bw == 1 the dense channel concat is already shuffle-free (lanes ARE
    channels), so this falls back to concat + conv — splitting there only
    costs conv-count and fusion (the big `unet` lost 17% before this
    fallback).
    """
    assert len(xs) == len(channels), (len(xs), len(channels))
    assert sum(channels) == w.shape[2], (
        f"split channels {channels} must cover the kernel's cin {w.shape[2]}"
    )
    if bw == 1:
        return conv_wide(jnp.concatenate(xs, axis=-1), w, bw, bias,
                         compute_dtype=compute_dtype, h_fold=h_fold)
    if SPLIT_CUSTOM_VJP[0]:
        y = _split_conv_cvjp(tuple(channels), bw, compute_dtype, h_fold,
                             tuple(xs), w)
    else:
        y = _split_conv_impl(channels, bw, compute_dtype, h_fold, xs, w)
    if bias is not None:
        y = y + jnp.tile(bias, bw).astype(y.dtype)
    return y


def conv1x1_wide_split(xs, channels, w, bw: int, bias=None,
                       compute_dtype=None) -> jnp.ndarray:
    """``conv1x1_wide(concat_wide(xs, bw, channels), w, bw)`` without the
    concat — same kernel-splitting identity (and bw == 1 concat fallback)
    as ``conv_wide_split``."""
    assert len(xs) == len(channels), (len(xs), len(channels))
    assert sum(channels) == w.shape[2], (
        f"split channels {channels} must cover the kernel's cin {w.shape[2]}"
    )
    if bw == 1:
        return conv1x1_wide(jnp.concatenate(xs, axis=-1), w, bw, bias,
                            compute_dtype=compute_dtype)
    off, y = 0, None
    for x, c in zip(xs, channels):
        part = conv1x1_wide(x, w[:, :, off:off + c, :], bw,
                            compute_dtype=compute_dtype)
        y = part if y is None else y + part
        off += c
    if bias is not None:
        y = y + jnp.tile(bias, bw).astype(y.dtype)
    return y


def concat_wide(xs, bw: int, channels) -> jnp.ndarray:
    """Channel-concat of same-block wide tensors (per-dx-group lane concat).

    NOTE: this is a lane-interleaving shuffle of the full tensor.  When the
    concat feeds a conv, use ``conv_wide_split``/``conv1x1_wide_split``
    instead — kernel splitting computes the same result with no shuffle.
    """
    parts = [x.reshape(*x.shape[:-1], bw, c) for x, c in zip(xs, channels)]
    y = jnp.concatenate(parts, axis=-1)
    return y.reshape(*y.shape[:-2], bw * sum(channels))


def split_wide(x: jnp.ndarray, bw: int, channels) -> list:
    """Channel-split of a wide tensor (inverse of concat_wide)."""
    xg = x.reshape(*x.shape[:-1], bw, x.shape[-1] // bw)
    out, at = [], 0
    for c in channels:
        out.append(xg[..., at:at + c].reshape(*x.shape[:-1], bw * c))
        at += c
    return out


# -- fused-path layout descriptors -------------------------------------------------
#
# ``model.apply_fused`` returns a block descriptor ("s2d", b) or ("wide", bw)
# alongside the class-major logits; the fused loss/eval consumers use these
# two helpers instead of hard-coding one layout's int pack.

def pack_mask(blk, mask: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) integer mask -> the lane grouping matching ``blk``."""
    kind, n = blk
    if kind == "s2d":
        from .s2d import s2d_int

        return s2d_int(mask, n)
    return pack_int(mask, n)


def unpack_pred(blk, pred: jnp.ndarray) -> jnp.ndarray:
    """Lane-grouped integer prediction -> (B, H, W) map."""
    kind, n = blk
    if kind == "s2d":
        from .s2d import d2s_int

        return d2s_int(pred, n)
    return unpack_int(pred, n)
