"""Spatial partitioning: GSPMD-sharded convolutions and tiled inference.

The reference handles arbitrary sizes by resizing, never tiling
(``predict.py:26``; SURVEY.md §5 "long-context analogue").  For large scans
(1024x1024+) two TPU-native mechanisms are provided:

* **GSPMD spatial sharding** — the forward is jitted with the input's H axis
  sharded over a mesh axis; XLA's SPMD partitioner inserts the halo exchanges
  every convolution needs at shard boundaries automatically (the idiomatic
  TPU way to spatially partition a conv net — no hand-written ppermute).
  Numerically identical to the unsharded forward.

* **Sliding-window tiled inference** — single-chip processing of images too
  large for one activation footprint: overlapping tiles with a ``halo``
  margin, forward per tile, center-stitched.  Exact when ``halo`` exceeds the
  model's half receptive field (~96 px for the UNet_S topology); smaller halos
  trade exactness at tile seams for memory.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_spatial_mesh",
    "make_dp_spatial_mesh",
    "make_spatial_forward",
    "make_spatial_train_step",
    "tiled_inference",
]

SPATIAL_AXIS = "sp"
DATA_AXIS = "data"


def make_spatial_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SPATIAL_AXIS,))


def make_dp_spatial_mesh(dp: int, sp: int, devices=None) -> Mesh:
    """2-D (data, spatial) mesh: batch shards over ``dp``, image H over ``sp``.

    The composition for large-scan training: e.g. on a 4x2 slice, 4-way batch
    parallelism with each image's rows split over 2 chips — halving the
    per-chip activation footprint of a 1024x1024+ scan while keeping the
    global-batch numerics (XLA turns every loss/BN/grad reduction into a
    collective over both axes).
    """
    devices = list(devices if devices is not None else jax.devices())
    assert dp * sp <= len(devices), f"need {dp * sp} devices, have {len(devices)}"
    grid = np.asarray(devices[: dp * sp]).reshape(dp, sp)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def make_spatial_forward(model, mesh: Mesh):
    """jitted (params, bn_state, image) -> logits with H sharded over the mesh.

    Parameters are replicated; the image/logits are sharded on axis 1 (H).
    XLA GSPMD partitions every conv/pool/upsample and inserts halo exchanges.
    """
    repl = NamedSharding(mesh, P())
    spatial = NamedSharding(mesh, P(None, SPATIAL_AXIS))

    def fwd(params, bn_state, image):
        logits, _ = model.apply(params, bn_state, image, train=False)
        return logits

    return jax.jit(
        fwd,
        in_shardings=(repl, repl, spatial),
        out_shardings=spatial,
    )


def make_spatial_train_step(model, loss_cfg, opt_cfg, mesh: Mesh,
                            clipping: float = 1.0):
    """jitted (state, batch, lr) -> (state', metrics) with the image H axis
    sharded over ``mesh``'s spatial axis (and the batch axis over its data
    axis, if the mesh has one).

    This is the GSPMD counterpart of ``data_parallel.make_parallel_train_step``
    (which uses shard_map + explicit psums): the *single-device* train step
    (engine/train.py:make_train_step) is jitted with sharding constraints and
    XLA's SPMD partitioner does the rest — halo exchanges for every conv/pool/
    upsample window crossing a shard boundary, and global collectives for the
    BN batch statistics, the loss reductions, and the gradient sums.  The
    result is numerically the single-device global-batch step (reduction
    order aside; tested to 1e-5 on a CPU mesh).

    Use it when one image's activations exceed a chip (1024x1024+ training —
    the reference can only resize such scans, SURVEY.md §5 "long-context
    analogue"); for plain batch scaling prefer the shard_map path, which
    avoids re-partitioning analysis at compile time.
    """
    from ..engine.train import make_train_step
    from ..ops import wide as W

    step_fn = make_train_step(model, loss_cfg, opt_cfg, clipping, axis_name=None)
    axes = mesh.axis_names
    batch_axis = DATA_AXIS if DATA_AXIS in axes else None
    repl = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(batch_axis, SPATIAL_AXIS))

    jitted = jax.jit(
        step_fn,
        in_shardings=(repl, {"image": sharded, "mask": sharded}, repl),
        out_shardings=(repl, repl),
    )

    def step(state, batch, lr):
        # trace (first call) with H->batch folding suppressed: H is SHARDED
        # here, and folding it into batch would turn the partitioner's cheap
        # halo exchanges into all-to-all reshards around every conv
        with W.no_h_fold():
            return jitted(state, batch, lr)

    return step


def tiled_inference(
    model,
    params,
    bn_state,
    image: jnp.ndarray,
    *,
    tile: int = 512,
    halo: int = 96,
    tile_batch: int = 8,
) -> jnp.ndarray:
    """Class indices for a large NHWC image via overlapping tiles.

    ONE jitted program for the whole grid: a ``lax.scan`` over groups of
    ``tile_batch`` tiles, each step gathering its windows with a vmapped
    ``dynamic_slice``, running them stacked through the batch dim of a single
    traced forward, and stitching the argmax cores into the output carry with
    ``dynamic_update_slice`` — no per-tile dispatch, no host stitching (the
    previous form paid one round trip per tile: 64 at 4096²).  Exact when
    ``halo`` covers the model's half receptive field: cores are disjoint and
    each window sees the same pixels the dense forward would.

    (``engine/predict.py:_build_tile_grid_step`` is the production variant of
    the same program, with BN folding, data-parallel tile sharding, and the
    rank-3 single-channel transfer; this is the minimal library form.)
    """
    from jax import lax

    n, h, w, c = image.shape
    ph = -h % tile
    pw = -w % tile
    padded = jnp.pad(image, ((0, 0), (halo, halo + ph), (halo, halo + pw), (0, 0)))
    gh, gw = (h + ph) // tile, (w + pw) // tile
    win = tile + 2 * halo

    tpb = max(1, min(tile_batch, gh * gw))
    ii, jj = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    offs = np.stack([ii.ravel(), jj.ravel()], axis=1).astype(np.int32) * tile
    pad_t = -len(offs) % tpb
    if pad_t:  # duplicates of the last tile rewrite the same core: idempotent
        offs = np.concatenate([offs, np.repeat(offs[-1:], pad_t, axis=0)])
    offs = offs.reshape(-1, tpb, 2)

    @jax.jit
    def run(params, bn_state, padded):
        def body(out, off):
            wins = jax.vmap(
                lambda o: lax.dynamic_slice(
                    padded, (0, o[0], o[1], 0), (n, win, win, c)
                )
            )(off)
            logits, _ = model.apply(
                params, bn_state, wins.reshape(tpb * n, win, win, c),
                train=False,
            )
            pred = jnp.argmax(logits.astype(jnp.float32), axis=-1)
            pred = pred[:, halo: halo + tile, halo: halo + tile]
            pred = pred.astype(jnp.int32).reshape(tpb, n, tile, tile)
            for t in range(tpb):
                out = lax.dynamic_update_slice(
                    out, pred[t], (0, off[t, 0], off[t, 1])
                )
            return out, ()

        out0 = jnp.zeros((n, gh * tile, gw * tile), jnp.int32)
        out, _ = lax.scan(body, out0, jnp.asarray(offs))
        return out

    return run(params, bn_state, padded)[:, :h, :w]
