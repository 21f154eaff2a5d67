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

__all__ = ["make_spatial_mesh", "make_spatial_forward", "tiled_inference"]

SPATIAL_AXIS = "sp"


def make_spatial_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SPATIAL_AXIS,))


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


def tiled_inference(
    model,
    params,
    bn_state,
    image: jnp.ndarray,
    *,
    tile: int = 512,
    halo: int = 96,
) -> jnp.ndarray:
    """Class indices for a large NHWC image via overlapping tiles.

    The image is padded to a tile grid, each (tile + 2*halo) window is run
    through one shared jitted forward (one compilation for all tiles), and
    the central ``tile`` x ``tile`` cores are stitched back.
    """
    n, h, w, c = image.shape
    ph = -h % tile
    pw = -w % tile
    padded = jnp.pad(image, ((0, 0), (halo, halo + ph), (halo, halo + pw), (0, 0)))
    gh, gw = (h + ph) // tile, (w + pw) // tile
    win = tile + 2 * halo

    @jax.jit
    def run_tile(tile_img):
        logits, _ = model.apply(params, bn_state, tile_img, train=False)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return probs[:, halo : halo + tile, halo : halo + tile, :]

    rows = []
    for i in range(gh):
        cols = []
        for j in range(gw):
            window = jax.lax.dynamic_slice(
                padded, (0, i * tile, j * tile, 0), (n, win, win, c)
            )
            cols.append(run_tile(window))
        rows.append(jnp.concatenate(cols, axis=2))
    probs = jnp.concatenate(rows, axis=1)[:, :h, :w, :]
    return jnp.argmax(probs, axis=-1).astype(jnp.int32)
