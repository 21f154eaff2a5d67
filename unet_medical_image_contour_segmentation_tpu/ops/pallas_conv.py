"""Pallas TPU kernel: im2col conv for s2d-b4 tensors — 4x fewer MACs.

The XLA block-conv formulation of a 3x3 conv in s2d-4 layout
(``ops/s2d.py:conv_s2d``) multiplies by a (3, 3, 16*Cin, 16*Cout) scattered
kernel that is 1/16 dense — 16x the logical MACs, running at full MXU
utilization.  This kernel does the same conv with only 4x the logical MACs:
for each output grid block, the 6x6-pixel input window is assembled in VMEM
(im2col) and hit with ONE dense (36*Cin, 16*Cout) matmul.

Key layout fact that makes assembly cheap: s2d lanes are ordered
(di, dj, ci), so for a fixed window row wu the three column groups are
*contiguous* lane slices of the (TR+2, G+2, 16*Cin) input tile —
  wv=0   -> lanes [(di*4+3)*Cin : +Cin]   at grid-col offset 0
  wv=1-4 -> lanes [ di*4*Cin   : +4*Cin]  at grid-col offset 1
  wv=5   -> lanes [ di*4*Cin   : +Cin]    at grid-col offset 2
— 18 static strided copies per tile, then a single MXU contraction.

Backward: dx reuses this same kernel (rotated/transposed weights — the
gradient of a stride-1 SAME conv is the same conv shape); dw transposes the
XLA block-conv linearly (no primal recompute).  Exactness is tested against
the NHWC conv on CPU via interpret mode.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv_s2d_b4_im2col", "pallas_supported"]

B4 = 4
WIN = B4 + 2  # 6x6 pixel window per output block


def pallas_supported(x_shape, interpret_ok: bool = True) -> bool:
    """The kernel handles s2d-4 tensors whose grid tiles evenly."""
    g_h, g_w = x_shape[1], x_shape[2]
    tr = min(8, g_h)
    if g_h % tr or g_w < 8:
        return False
    if jax.default_backend() == "tpu":
        return True
    return interpret_ok  # interpret mode keeps CPU tests on the same path


@functools.lru_cache(maxsize=None)
def _im2col_map() -> np.ndarray:
    """(6, 6, 3, 3, 4, 4) scatter: window pos (wu, wv) x tap (u, v) x out (dy, dx)."""
    m = np.zeros((WIN, WIN, 3, 3, B4, B4), np.float32)
    for dy in range(B4):
        for u in range(3):
            for dx in range(B4):
                for v in range(3):
                    m[dy + u, dx + v, u, v, dy, dx] = 1.0
    return m


def _w_im2col(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (36*Cin, 16*Cout) im2col weight."""
    cin, cout = w.shape[2], w.shape[3]
    m = jnp.asarray(_im2col_map(), w.dtype)
    wim = jnp.einsum("WVuvyx,uvco->WVcyxo", m, w)
    return wim.reshape(WIN * WIN * cin, B4 * B4 * cout)


def _kernel(xp_hbm, wim_ref, out_ref, xs, patch, sems, *, tr, g, cin):
    """One (batch, row-tile) grid cell with double-buffered halo DMA.

    The row-tile DMAs are prefetched one tile ahead (2-slot scratch), so the
    HBM->VMEM latency hides under the previous tile's assembly + matmul —
    without this the ~128 serialized DMA waits dominate the kernel.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    slot = i % 2
    nxt = (i + 1) % 2

    def dma(tile_idx, slot_idx):
        return pltpu.make_async_copy(
            xp_hbm.at[b, pl.ds(tile_idx * tr, tr + 2)], xs.at[slot_idx],
            sems.at[slot_idx],
        )

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < n_tiles)
    def _():
        dma(i + 1, nxt).start()

    dma(i, slot).wait()
    rows_all = xs[slot]

    # assemble the (TR, G, 36*Cin) patch from contiguous lane slices
    for wu in range(WIN):
        goff = (3 + wu) // B4   # grid-row offset 0..2
        di = (3 + wu) % B4      # intra-block row of the source lanes
        rows = rows_all[goff : goff + tr]
        base = wu * WIN * cin
        # wv = 0: right edge (dj=3) of the left neighbor column
        patch[:, :, base : base + cin] = (
            rows[:, 0:g, (di * B4 + 3) * cin : (di * B4 + 4) * cin]
        )
        # wv = 1..4: all four dj of the center column
        patch[:, :, base + cin : base + 5 * cin] = (
            rows[:, 1 : g + 1, di * B4 * cin : (di * B4 + 4) * cin]
        )
        # wv = 5: left edge (dj=0) of the right neighbor column
        patch[:, :, base + 5 * cin : base + 6 * cin] = (
            rows[:, 2 : g + 2, di * B4 * cin : (di * B4 + 1) * cin]
        )

    flat = patch[:].reshape(tr * g, WIN * WIN * cin)
    acc = jnp.dot(flat, wim_ref[:], preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(tr, g, out_ref.shape[-1]).astype(out_ref.dtype)


def _pallas_forward(xp: jnp.ndarray, wim: jnp.ndarray, cin: int, cout: int,
                    tr: int, gh: int, gw: int) -> jnp.ndarray:
    """xp: (B, Gh+2, Gw_pad, 16*Cin) zero-padded grid, Gw_pad a multiple of 8
    (DMA tile alignment); -> (B, Gh, Gw, 16*Cout)."""
    bsz, _, gwp, _ = xp.shape
    interpret = jax.default_backend() != "tpu"
    kern = functools.partial(_kernel, tr=tr, g=gw, cin=cin)
    return pl.pallas_call(
        kern,
        grid=(bsz, gh // tr),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # manual DMA with halo
            pl.BlockSpec(memory_space=pltpu.VMEM),  # im2col weight
        ],
        out_specs=pl.BlockSpec(
            (1, tr, gw, 16 * cout), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, gh, gw, 16 * cout), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tr + 2, gwp, 16 * cin), xp.dtype),  # 2-slot halo tiles
            pltpu.VMEM((tr, gw, WIN * WIN * cin), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, wim)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def conv_s2d_b4_im2col(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """3x3 SAME conv on an s2d-4 tensor via the Pallas im2col kernel.

    x: (B, Gh, Gw, 16*Cin); w: (3, 3, Cin, Cout) -> (B, Gh, Gw, 16*Cout).
    Exact equivalent of ``ops.s2d.conv_s2d(x, w, 4)``.
    """
    return _fwd_impl(x, w)


def _fwd_impl(x, w):
    cin, cout = w.shape[2], w.shape[3]
    gh, gw = x.shape[1], x.shape[2]
    tr = min(8, gh)
    pad_right = 1 + (-(gw + 2) % 8)  # total width to a multiple of 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, pad_right), (0, 0)))
    wim = _w_im2col(w).astype(x.dtype)
    return _pallas_forward(xp, wim, cin, cout, tr, gh, gw)


def _fwd_rule(x, w):
    return _fwd_impl(x, w), (x, w)


def _bwd_rule(res, g):
    x, w = res
    # dx: gradient of a stride-1 SAME conv == the same conv with the kernel
    # rotated 180 degrees and in/out channels swapped -> reuse this kernel.
    w_rot = w[::-1, ::-1].transpose(0, 1, 3, 2)
    dx = _fwd_impl(g.astype(x.dtype), w_rot)
    # dw: transpose the (linear-in-w) XLA block-conv; no primal recompute.
    from .s2d import conv_s2d_xla

    dw = jax.linear_transpose(
        lambda w_: conv_s2d_xla(x, w_, B4), w
    )(g.astype(x.dtype))[0]
    return dx, dw


conv_s2d_b4_im2col.defvjp(_fwd_rule, _bwd_rule)
