"""Image resize ops with exact PyTorch numerics, NHWC, TPU-friendly.

The reference uses two distinct bilinear semantics that JAX does not provide
out of the box:

* ``nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True)`` inside
  the decoder ``Up`` block (reference ``unet/unet_parts.py:70``).
* ``F.interpolate(x, (H, W), mode='bilinear')`` (``align_corners=False``) to
  map logits back to the original image size (reference ``predict.py:26``).

Both are implemented here as separable 1-D interpolations expressed as two
dense matmuls (rows then columns).  On TPU a dense ``(out, in)`` interpolation
matrix contraction runs on the MXU and is dramatically faster than the
gather/scatter lowering XLA produces for ``jax.image.resize`` — the matrices
are built once per (in, out, mode) at trace time and constant-folded.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = [
    "bilinear_resize",
    "upsample_x2_align_corners",
    "interp_matrix",
]


@functools.lru_cache(maxsize=None)
def _interp_matrix_np(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) row-stochastic bilinear interpolation matrix.

    Matches PyTorch's ``upsample_bilinear2d`` source-index computation:
    ``area_pixel_compute_source_index`` in ATen.
    """
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros_like(dst)
        else:
            src = dst * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = np.maximum(scale * (dst + 0.5) - 0.5, 0.0)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.clip(i0, 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    frac = (src - i0).astype(np.float32)
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    # np.add.at handles i0 == i1 (edge pixels) by accumulating both weights.
    np.add.at(mat, (rows, i0), 1.0 - frac)
    np.add.at(mat, (rows, i1), frac)
    return mat


def interp_matrix(in_size: int, out_size: int, align_corners: bool) -> jnp.ndarray:
    """Bilinear interpolation matrix as a jnp constant (trace-time cached)."""
    return jnp.asarray(_interp_matrix_np(in_size, out_size, align_corners))


def bilinear_resize(x: jnp.ndarray, out_h: int, out_w: int, *, align_corners: bool) -> jnp.ndarray:
    """Bilinear resize of NHWC ``x`` to (out_h, out_w), PyTorch semantics.

    ``align_corners=True``  matches ``nn.Upsample(..., align_corners=True)``.
    ``align_corners=False`` matches ``F.interpolate(..., mode='bilinear')``.
    Computation runs in f32 regardless of input dtype (as torch does for
    interpolate under autocast) and is cast back to the input dtype.
    """
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mh = interp_matrix(h, out_h, align_corners)  # (out_h, h)
    mw = interp_matrix(w, out_w, align_corners)  # (out_w, w)
    # rows: (out_h, h) x (n, h, w, c) -> (n, out_h, w, c)
    y = jnp.einsum("oh,nhwc->nowc", mh, xf, preferred_element_type=jnp.float32)
    # cols: (out_w, w) x (n, out_h, w, c) -> (n, out_h, out_w, c)
    y = jnp.einsum("pw,nowc->nopc", mw, y, preferred_element_type=jnp.float32)
    return y.astype(dtype)


def upsample_x2_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """x2 bilinear upsample with align_corners=True (decoder path).

    Concrete shapes use the constant-matrix MXU contraction; symbolic shapes
    (jax.export shape polymorphism) fall back to a gather+lerp formulation
    whose interpolation weights are computed on-device from the runtime dims,
    so bilinear models export with dynamic H/W like the reference's ONNX
    dynamic axes (export_model.py:30-46).
    """
    n, h, w, c = x.shape
    if isinstance(h, int) and isinstance(w, int):
        return bilinear_resize(x, 2 * h, 2 * w, align_corners=True)
    return _upsample_x2_ac_dynamic(x)


def _upsample_x2_ac_dynamic(x: jnp.ndarray) -> jnp.ndarray:
    """Shape-polymorphic x2 align_corners=True upsample (gather + lerp)."""
    from jax import lax

    dtype = x.dtype
    xf = x.astype(jnp.float32)

    def one_axis(y, axis):
        size = y.shape[axis]
        # src = i * (H-1) / (2H-1), evaluated with exact integer quotient /
        # remainder so i0 and frac match the f64 constant-matrix path bitwise
        i = lax.iota(jnp.int32, 2 * size)
        num = i * jnp.asarray(size - 1, jnp.int32)
        den = jnp.asarray(2 * size - 1, jnp.int32)
        i0 = num // den
        i1 = jnp.minimum(i0 + 1, size - 1)
        frac = (num % den).astype(jnp.float32) / den.astype(jnp.float32)
        shape = [1] * y.ndim
        shape[axis] = 2 * size
        frac = frac.reshape(shape)
        return (
            jnp.take(y, i0, axis=axis) * (1.0 - frac)
            + jnp.take(y, i1, axis=axis) * frac
        )

    return one_axis(one_axis(xf, 1), 2).astype(dtype)
