"""Inference: preprocess -> jitted forward -> resize-to-original -> argmax -> post.

Reference: ``/root/reference/predict.py``.  Per-image semantics preserved
(grayscale 'L' input, ``BasicDataset.preprocess(scale=1)``, bilinear
``align_corners=False`` resize of the logits back to the original size,
argmax, optional ``postprocess_mask`` — default on, {0,128,255} PNG output).

TPU restructuring: the reference runs one host->device->host round trip per
file; here images are grouped by size and batched through one jitted
program per (input, output) shape pair, with cv2 post-processing running in a
host thread pool while the device works on the next batch.
"""

from __future__ import annotations

import logging
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..data.dataset import BasicDataset
from ..ops.resize import bilinear_resize
from ..pipeline.post_process import postprocess_mask

__all__ = ["Predictor", "StableHLOPredictor", "mask_to_image", "collect_image_files"]

log = logging.getLogger(__name__)


def mask_to_image(mask: np.ndarray) -> Image.Image:
    """{0,1,2} -> {0,128,255} PNG (predict.py:52-58)."""
    vis = np.zeros_like(mask, dtype=np.uint8)
    vis[mask == 0] = 0
    vis[mask == 1] = 128
    vis[mask == 2] = 255
    return Image.fromarray(vis)


def _norm_uint8_host(images: np.ndarray) -> np.ndarray:
    """uint8 [B, ...] -> float32, mirroring ``BasicDataset.preprocess``'s
    per-image rule (data/dataset.py:150): divide by 255 iff any pixel > 1."""
    out = images.astype(np.float32)
    axes = tuple(range(1, out.ndim))
    mx = out.max(axis=axes, keepdims=True)
    return np.where(mx > 1, out / np.float32(255.0), out)


def _norm_uint8_dev(x: jnp.ndarray) -> jnp.ndarray:
    """Device-side counterpart of :func:`_norm_uint8_host` (inside jit).

    Uses the same f32 division; on TPU the lowered divide can differ from
    the host's by 1 ulp (reciprocal-multiply), far below the bf16 compute
    resolution — the uint8 transfer path's contract is argmax parity with
    host preprocessing, not bitwise logits (tests/test_pipeline.py).
    """
    xf = x.astype(jnp.float32)
    axes = tuple(range(1, x.ndim))
    mx = jnp.max(xf, axis=axes, keepdims=True)
    return xf / jnp.where(mx > 1, jnp.float32(255.0), jnp.float32(1.0))


def collect_image_files(input_dir: str) -> List[str]:
    """Recursive png/jpg/jpeg walk (predict.py:61-68)."""
    files = []
    for root, _, names in os.walk(input_dir):
        for name in names:
            if name.lower().endswith((".png", ".jpg", ".jpeg")):
                files.append(os.path.join(root, name))
    return sorted(files)


class Predictor:
    """Batched jitted predictor for a fixed model + parameters.

    ``fold_bn=True`` (default) pre-folds the BatchNorm affines into the conv
    weights for the fused s2d inference path — numerically exact for eval
    mode, and skips every BN pass over the big activation tensors.

    ``num_devices=N`` serves data-parallel: params replicated over a 1-D
    mesh, every batch sharded on dim 0 (ragged batches pad to a device
    multiple and crop back) — output identical to single-device.

    ``quantize=True`` serves the UNet family in int8 (models/quantize.py):
    weights quantize per-output-channel from the BN-folded kernels,
    activation scales calibrate automatically on the FIRST batch predicted
    (or explicitly via :meth:`calibrate`), and every 3x3 conv runs
    int8 x int8 -> int32 on the MXU — measured 1.36x at the dominant conv
    shape on v5e (benchmarks/probe_int8.py), with per-tensor scales so one
    calibration serves every input size.  Opt-in: outputs are near-exact
    (argmax-identical on random init; Dice deltas on trained checkpoints
    documented in PARITY.md) but not bit-equal to the float path.
    """

    # dense-path pixel budget: above this, predict tiles the image (the
    # reference would resize or OOM, /root/reference/predict.py:26); 0 = never
    TILE_THRESHOLD = 1536 * 1536

    # single-device unless __init__ builds a mesh (subclasses that skip
    # super().__init__, like StableHLOPredictor, stay single-device)
    _mesh = None
    _ndev = 1

    def __init__(self, model, params, bn_state, batch_size: int = 8,
                 fold_bn: bool = True, tile: Optional[int] = None,
                 tile_halo: int = 96,
                 tile_threshold: Optional[int] = None,
                 num_devices: Optional[int] = None,
                 quantize: bool = False):
        self.model = model
        self.params = params
        self.bn_state = bn_state
        self.batch_size = batch_size
        self.tile = tile
        self.tile_halo = tile_halo
        self.tile_threshold = (
            self.TILE_THRESHOLD if tile_threshold is None else tile_threshold
        )
        # per-instance jit cache keyed by (in_hw, out_hw) — an lru_cache on the
        # bound method would pin the instance (and its params) process-wide
        self._step_cache: Dict[Tuple, object] = {}
        self.folded_params = None
        if fold_bn:
            try:
                from ..models.fold_bn import fold_params

                self.folded_params = fold_params(params, bn_state)
            except (KeyError, TypeError):
                pass  # no conv+BN pairs to fold: fall back to live BN

        self.quantize = quantize
        self._qparams = None
        # folded params the QUANTIZE walkers consume: the UNet-family /
        # UNet++ fold (== folded_params) or the yolo CBS fold (quantize-only
        # — the float yolo eval keeps live BN)
        self._qfolded = self.folded_params
        if quantize:
            fp = self.folded_params
            unet_keys = {"inc", "down1", "up1", "outc"}
            pp_keys = {"x0_0", "x1_0"}
            yolo_keys = {"stem", "sppf", "n3"}
            if fp is None and yolo_keys <= set(params):
                from ..models.fold_bn import fold_yolo_params

                self._qfolded = fold_yolo_params(params, bn_state)
            elif fp is None or not (unet_keys <= set(fp) or pp_keys <= set(fp)):
                raise ValueError(
                    "quantize=True needs a UNet-family, UNet++ or YOLOv8Seg "
                    "model with foldable BatchNorm (fold_bn=True); got "
                    f"folded={fp is not None}"
                )

        # data-parallel serving: batch sharded over a 1-D mesh, params
        # replicated; ragged batches pad to a device multiple and crop back
        self._mesh = None
        self._ndev = 1
        if num_devices and num_devices > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import make_data_mesh

            self._mesh = make_data_mesh(num_devices)
            self._ndev = num_devices
            rep = NamedSharding(self._mesh, P())
            self.params = jax.device_put(self.params, rep)
            if self.bn_state is not None:
                self.bn_state = jax.device_put(self.bn_state, rep)
            if self.folded_params is not None:
                self.folded_params = jax.device_put(self.folded_params, rep)

    def _shard_batch(self, images):
        """-> (device array [padded to an _ndev multiple, dim 0 sharded], B)."""
        b = images.shape[0]
        if self._mesh is None:
            return jnp.asarray(images), b
        from jax.sharding import NamedSharding, PartitionSpec as P

        # pad on the host, then ONE sharded upload (jnp first would commit to
        # device 0 and pay a second reshard transfer)
        pad = -b % self._ndev
        arr = np.asarray(images)
        if pad:
            arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)])
        return jax.device_put(arr, NamedSharding(self._mesh, P("data"))), b

    # -- int8 serving (models/quantize.py) --------------------------------

    quantize = False  # instance attr set in __init__; class default for
    _qparams = None   # subclasses that skip super().__init__
    _amax = None      # calibration amaxes (kept for save_calibration)
    _qfolded = None   # folded params for the quantize walkers

    def _wide_ok(self, h: int, w: int) -> bool:
        shape = (1, h, w, getattr(self.model, "n_channels", 1))
        if hasattr(self.model, "_supports_wide"):  # UNet++: depth-derived
            return self.model._supports_wide(shape)
        from ..models.wide_exec import supports_wide

        return supports_wide(self.model, shape)

    def calibrate(self, images) -> None:
        """Calibrate the int8 activation scales on representative images.

        ``images``: [B, H, W(, C)] float array.  Called automatically on the
        first predicted batch when ``quantize=True``; call explicitly to pin
        scales to a chosen calibration set.  H/W crop down to multiples of
        the model's wide-layout divisor (per-tensor scales are
        crop-insensitive).
        """
        from ..models.quantize import calibrate_amax

        arr = np.asarray(images)
        if arr.dtype == np.uint8:
            arr = _norm_uint8_host(arr)
        div = getattr(self.model, "hw_divisor", 16)
        hc, wc = arr.shape[1] // div * div, arr.shape[2] // div * div
        if hc < div or wc < div:
            raise ValueError(f"calibration images too small: {arr.shape}")
        folded = self._qfolded if self._qfolded is not None else self.folded_params
        self._set_amax(calibrate_amax(self.model, folded,
                                      jnp.asarray(arr[:, :hc, :wc])))

    def _set_amax(self, amax: Dict[str, float]) -> None:
        """Build (and shard) the int8 qparams from calibration amaxes."""
        from ..models.quantize import (
            build_qparams, build_qparams_pp, build_qparams_yolo,
        )

        folded = self._qfolded if self._qfolded is not None else self.folded_params
        builder = (build_qparams_pp if "x0_0" in folded
                   else build_qparams_yolo if "stem" in folded
                   else build_qparams)
        qp = builder(self.model, folded, amax)
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            qp = jax.device_put(qp, NamedSharding(self._mesh, P()))
        self._amax = dict(amax)
        self._qparams = qp

    def save_calibration(self, path: str) -> None:
        """Persist the activation-scale calibration (a small JSON of
        per-tap amax floats).  Rebuilding the int8 weights from it is
        deterministic, so a saved calibration makes quantized serving
        restart-stable and calibration-data-free."""
        if getattr(self, "_amax", None) is None:
            raise ValueError("not calibrated yet: call calibrate() or "
                             "predict one batch first")
        import json

        with open(path, "w") as f:
            json.dump(self._amax, f, indent=1, sort_keys=True)

    def load_calibration(self, path: str) -> None:
        """Load a calibration saved by :meth:`save_calibration`."""
        import json

        with open(path) as f:
            self._set_amax(json.load(f))

    def _ensure_quantized(self, images: np.ndarray) -> None:
        """First-batch auto-calibration (bounded to 4 images).

        Skips batches whose 16-multiple crop would be degenerate (< 32 px:
        a 5-level UNet's bottleneck collapses) — such batches serve float
        until a calibratable one arrives.
        """
        if not self.quantize or self._qparams is not None:
            return
        arr = np.asarray(images)
        div = getattr(self.model, "hw_divisor", 16)
        m = max(32, div)
        if arr.shape[1] // div * div >= m and arr.shape[2] // div * div >= m:
            self.calibrate(arr[:4])

    # minimum batch for the int8 DENSE program, per arch: at small batch the
    # int8 conv win (HBM bytes halve) shrinks on lane/sublane-starved tensors
    # while the requant/attention-quant elementwise passes do not.  unet_sa
    # measured (r5, benchmarks/probe_int8_e2e.py --batches 1,2,4, 512²,
    # interleaved, 128-step chains): b=1 0.967x, b=2 0.949x, b=4 1.160x,
    # b=8 1.18x (r4) — int8 only pays from b=4.  Below the threshold the
    # dense path serves the float program instead (the tiled path always
    # runs >= tile_batch cores per step, so it is not gated).  Archs absent
    # from the map have no measured regression.
    INT8_MIN_BATCH: Dict[str, int] = {"unet_sa": 4}

    def _int8_min_batch(self) -> int:
        return self.INT8_MIN_BATCH.get(getattr(self.model, "name", ""), 1)

    def _step(self, in_hw: Tuple[int, int], out_hw: Tuple[int, int],
              from_uint8: bool = False, batch: Optional[int] = None):
        use_int8 = self._qparams is not None and (
            batch is None or batch >= self._int8_min_batch())
        key = (in_hw, out_hw, use_int8, from_uint8)
        if key not in self._step_cache:
            self._step_cache[key] = self._build_step(in_hw, out_hw,
                                                     from_uint8, use_int8)
        return self._step_cache[key]

    def _build_step(self, in_hw: Tuple[int, int], out_hw: Tuple[int, int],
                    from_uint8: bool = False, use_int8: bool = True):
        model = self.model
        n_classes = getattr(model, "n_classes", 0)
        folded = self.folded_params

        if use_int8 and self._qparams is not None and self._wide_ok(*in_hw):
            from ..models.quantize import apply_wide_int8

            qparams = self._qparams

            @jax.jit
            def run_q(params, bn_state, images):  # params/bn unused: quantized
                if from_uint8:
                    images = _norm_uint8_dev(images)
                if out_hw == in_hw and n_classes > 1:
                    from ..losses.s2d_fused import argmax_class_major
                    from ..ops.wide import unpack_pred

                    logits_cm, blk = apply_wide_int8(
                        model, qparams, images,
                        unpack_output=False, class_major=True)
                    return unpack_pred(blk, argmax_class_major(logits_cm, n_classes))
                logits, _ = apply_wide_int8(model, qparams, images)
                logits = bilinear_resize(
                    logits, out_hw[0], out_hw[1], align_corners=False)
                if n_classes == 1:
                    return (jax.nn.sigmoid(logits[..., 0]) > 0.5).astype(jnp.int32)
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)

            return run_q

        @jax.jit
        def run(params, bn_state, images):
            if from_uint8:
                images = _norm_uint8_dev(images)
            if (
                out_hw == in_hw
                and n_classes > 1
                and hasattr(model, "supports_fused")
                and model.supports_fused(images.shape)
            ):
                from ..losses.s2d_fused import argmax_class_major
                from ..ops.wide import unpack_pred

                if folded is not None:
                    logits_cm, _, blk = model.apply_fused(folded, None, images, train=False)
                else:
                    logits_cm, _, blk = model.apply_fused(params, bn_state, images, train=False)
                pred = argmax_class_major(logits_cm, n_classes)
                return unpack_pred(blk, pred)
            logits, _ = model.apply(params, bn_state, images, train=False)
            logits = bilinear_resize(
                logits.astype(jnp.float32), out_hw[0], out_hw[1], align_corners=False
            )
            if n_classes == 1:
                # binary checkpoints: sigmoid > 0.5, as the evaluate path does
                # (the reference's predict CLI is multiclass-only — it always
                # argmaxes, predict.py:28 — so this is an extension, matching
                # its evaluate.py:64 semantics)
                return (jax.nn.sigmoid(logits[..., 0]) > 0.5).astype(jnp.int32)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        return run

    def _use_tiling(self, in_hw, out_hw) -> bool:
        """Tile when the image exceeds the dense-path pixel budget.

        Only when no back-resize is requested: tiling produces class indices,
        and the reference's logits-then-bilinear-resize contract
        (predict.py:26) cannot be reproduced from stitched argmax cores.
        (predict's preprocess runs at scale=1, so out_hw == in_hw there.)
        """
        if self.tile_threshold <= 0 or tuple(out_hw) != tuple(in_hw):
            return False
        return in_hw[0] * in_hw[1] > self.tile_threshold

    # tiles packed into the batch dim of each scan step of the device tiling
    # program; rounded up to a device multiple under data-parallel serving so
    # TILES (not redundant batch padding) are what shards over the mesh
    tile_batch = 8
    # tile=None auto-selects per input: the LARGEST candidate whose grid has
    # at least AUTO_TILE_MIN_TILES tiles (bigger tiles cut the halo-MAC share
    # — 704²/512² = 1.89x vs 1216²/1024² = 1.41x — but small grids waste scan
    # padding and lose core batching).  Measured on v5e (r5,
    # benchmarks/probe_tile_sweep.py, halo 96, chained): 4096² tile 1024 beats
    # 512 by 1.13x bf16 / 1.28x int8 (14.77 / 21.41 slices/s); 2048² tile 512
    # stays best (49.3 vs 46.9 bf16, int8 tied).  Grid-size rule: 4096² has 16
    # 1024-tiles (wins), 2048² has 4 (loses) — threshold 8 between them.
    AUTO_TILES = (512, 1024)
    AUTO_TILE_MIN_TILES = 8

    def _auto_tile(self, h: int, w: int) -> int:
        for t in sorted(self.AUTO_TILES, reverse=True):
            if (-(-h // t)) * (-(-w // t)) >= self.AUTO_TILE_MIN_TILES:
                return t
        return min(self.AUTO_TILES)
    # escape hatch: False restores the one-dispatch-per-tile host-stitched
    # path (kept for A/B exactness tests and dispatch-overhead probes)
    tile_on_device = True

    def _tile_core_forward(self, win: int, core: int, halo: int):
        """(params, bn_state, [B,win,win,C]) -> [B,core,core] int32 argmax
        of the central core.  Shared by the host- and device-tiled paths;
        StableHLOPredictor overrides it with the exported module's call.

        Multiclass cores argmax in the packed class-major lane layout and
        unpack ONE int map (as the dense ``_build_step`` does) instead of
        unpacking ``n_classes`` logit planes to pixel space first — tile
        windows are fixed aligned sizes, so the fused layouts qualify unless
        tile/halo are set to non-16-multiples (then the NHWC path runs)."""
        model = self.model
        folded = self.folded_params
        n_classes = getattr(model, "n_classes", 0)
        n_ch = getattr(model, "n_channels", 1)
        qparams = self._qparams if (self._qparams is not None
                                    and self._wide_ok(win, win)) else None
        fused = (n_classes > 1 and hasattr(model, "supports_fused")
                 and model.supports_fused((1, win, win, n_ch)))

        def fwd(params, bn_state, tile_img):
            if qparams is not None:  # int8 serving path
                from ..models.quantize import apply_wide_int8

                if n_classes > 1:
                    from ..losses.s2d_fused import argmax_class_major
                    from ..ops.wide import unpack_pred

                    cm, blk = apply_wide_int8(model, qparams, tile_img,
                                              unpack_output=False,
                                              class_major=True)
                    pred = unpack_pred(blk, argmax_class_major(cm, n_classes))
                else:
                    logits, _ = apply_wide_int8(model, qparams, tile_img)
                    pred = jax.nn.sigmoid(
                        logits[..., 0].astype(jnp.float32)) > 0.5
            elif fused:
                from ..losses.s2d_fused import argmax_class_major
                from ..ops.wide import unpack_pred

                if folded is not None:
                    cm, _, blk = model.apply_fused(folded, None, tile_img,
                                                   train=False)
                else:
                    cm, _, blk = model.apply_fused(params, bn_state, tile_img,
                                                   train=False)
                pred = unpack_pred(blk, argmax_class_major(cm, n_classes))
            else:
                if folded is not None:
                    logits, _ = model.apply(folded, None, tile_img, train=False)
                else:
                    logits, _ = model.apply(params, bn_state, tile_img,
                                            train=False)
                if n_classes == 1:  # binary: sigmoid > 0.5 (see _build_step)
                    pred = jax.nn.sigmoid(
                        logits[..., 0].astype(jnp.float32)) > 0.5
                else:
                    pred = jnp.argmax(logits.astype(jnp.float32), axis=-1)
            return pred[:, halo: halo + core, halo: halo + core].astype(jnp.int32)

        return fwd

    def _build_tile_step(self, win: int, core: int, halo: int):
        """Jitted (params, bn_state, [B,win,win,C]) -> [B,core,core] argmax."""
        return jax.jit(self._tile_core_forward(win, core, halo))

    def _build_tile_grid_step(self, n: int, c: int, h: int, w: int,
                              tile: int, halo: int, tpb: int, rank3: bool,
                              from_uint8: bool = False):
        """ONE jitted program for the whole tile grid.

        Device-pads the raw image (halo + grid rounding), then ``lax.scan``s
        over groups of ``tpb`` tiles: each step gathers the windows with a
        vmapped ``dynamic_slice``, runs the shared core forward on them
        stacked into the batch dim (the model is traced once for the entire
        grid), and stitches the cores into the output carry with
        ``dynamic_update_slice`` — no per-tile dispatch, no host round trips
        (a 4096² scan previously paid 64 of them), no host stitching.  The
        stitched map leaves the device once, as int8 (class indices fit; 4x
        less device->host traffic than int32 on a 4096² map).  Under
        data-parallel serving the stacked tile batch is sharded over the
        mesh, so devices split TILES instead of recomputing padded batch
        copies.

        Exact vs the host-stitched path: same windows, same forward, same
        argmax, disjoint cores (grid-remainder duplicate tiles rewrite the
        same core idempotently).
        """
        from jax import lax

        win = tile + 2 * halo
        ph, pw = -h % tile, -w % tile
        gh, gw = (h + ph) // tile, (w + pw) // tile
        core_fwd = self._tile_core_forward(win, tile, halo)
        mesh = self._mesh

        # static tile-offset schedule: (S, tpb, 2) int32, remainder padded
        # with duplicates of the last tile (idempotent rewrites of its core)
        ii, jj = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
        offs = np.stack([ii.ravel(), jj.ravel()], axis=1).astype(np.int32) * tile
        pad_t = -len(offs) % tpb
        if pad_t:
            offs = np.concatenate([offs, np.repeat(offs[-1:], pad_t, axis=0)])
        offs = offs.reshape(-1, tpb, 2)

        @jax.jit
        def run(params, bn_state, image):
            # single-channel inputs arrive rank-3: a (B, H, W, 1) program
            # input buffer is lane-padded 128x in TPU HBM (CLAUDE.md) —
            # ruinous for a 4096² padded scan
            spatial_pad = ((0, 0), (halo, halo + ph), (halo, halo + pw))
            padded = jnp.pad(image, spatial_pad if rank3
                             else spatial_pad + ((0, 0),))
            if from_uint8:
                # the padded buffer STAYS uint8 (4x less HBM traffic per
                # window gather); each window divides by the per-image
                # divisor, matching _norm_uint8_dev (zero-padding cannot
                # raise a uint8 max, so padded and raw maxima agree)
                axes = tuple(range(1, padded.ndim))
                mx = jnp.max(padded.astype(jnp.float32), axis=axes,
                             keepdims=True)
                div = jnp.where(mx > 1, jnp.float32(255.0), jnp.float32(1.0))

            def body(out, off):
                if rank3:
                    wins = jax.vmap(
                        lambda o: lax.dynamic_slice(
                            padded, (0, o[0], o[1]), (n, win, win)
                        )
                    )(off)
                else:
                    wins = jax.vmap(
                        lambda o: lax.dynamic_slice(
                            padded, (0, o[0], o[1], 0), (n, win, win, c)
                        )
                    )(off)
                if from_uint8:  # wins: (tpb, n, ...); div broadcasts per image
                    wins = wins.astype(jnp.float32) / div[None]
                x = (wins.reshape(tpb * n, win, win) if rank3
                     else wins.reshape(tpb * n, win, win, c))
                if mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    x = lax.with_sharding_constraint(
                        x, NamedSharding(mesh, P("data"))
                    )
                pred = core_fwd(params, bn_state, x).astype(jnp.int8)
                pred = pred.reshape(tpb, n, tile, tile)
                for t in range(tpb):  # tpb is small and static: unrolled
                    out = lax.dynamic_update_slice(
                        out, pred[t], (0, off[t, 0], off[t, 1])
                    )
                return out, ()

            out0 = jnp.zeros((n, gh * tile, gw * tile), jnp.int8)
            out, _ = lax.scan(body, out0, jnp.asarray(offs))
            return out[:, :h, :w]

        return run

    def _tiled_predict(self, images: np.ndarray) -> np.ndarray:
        """[B,H,W,C] -> [B,H,W] int32 via overlapping tiles (exact: the halo
        covers the receptive field).  Default: one jitted scan over the tile
        grid, stitched on device (``_build_tile_grid_step``);
        ``tile_on_device=False`` falls back to one dispatch per tile with
        host stitching."""
        from_uint8 = images.dtype == np.uint8
        if from_uint8 and not self.tile_on_device:
            images, from_uint8 = _norm_uint8_host(images), False
        n, h, w = images.shape[:3]
        tile = self.tile if self.tile else self._auto_tile(h, w)
        halo = self.tile_halo
        c = images.shape[3] if images.ndim == 4 else 1
        if images.ndim == 3:
            images = images[..., None]
        ph, pw = -h % tile, -w % tile
        gh, gw = (h + ph) // tile, (w + pw) // tile
        win = tile + 2 * halo

        if self.tile_on_device:
            # tiles per scan step: a device multiple (so DP shards tiles),
            # clamped to the grid size (no point padding past the grid)
            tpb = max(1, -(-self.tile_batch // self._ndev) * self._ndev)
            tpb = min(tpb, -(-gh * gw // self._ndev) * self._ndev)
            rank3 = c == 1 and self._rank3_transfer
            key = ("tilegrid", n, c, h, w, tile, halo, tpb, rank3,
                   self._qparams is not None, from_uint8)
            if key not in self._step_cache:
                self._step_cache[key] = self._build_tile_grid_step(
                    n, c, h, w, tile, halo, tpb, rank3, from_uint8
                )
            run = self._step_cache[key]
            x = images[..., 0] if rank3 else images  # pad happens on device
            if self._mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                x = jax.device_put(np.asarray(x), NamedSharding(self._mesh, P()))
            return np.asarray(run(self.params, self.bn_state,
                                  jnp.asarray(x))).astype(np.int32)

        padded = np.pad(images, ((0, 0), (halo, halo + ph), (halo, halo + pw), (0, 0)))
        key = ("tile", win, tile, halo, self._qparams is not None)
        if key not in self._step_cache:
            self._step_cache[key] = self._build_tile_step(win, tile, halo)
        run = self._step_cache[key]

        out = np.empty((n, h + ph, w + pw), np.int32)
        pending = []  # (i, j, device array): fetch after all dispatches
        for i in range(gh):
            for j in range(gw):
                window = padded[:, i * tile: i * tile + win, j * tile: j * tile + win]
                t, _ = self._shard_batch(
                    window[..., 0]
                    if (c == 1 and self._rank3_transfer) else window
                )
                pending.append((i, j, run(self.params, self.bn_state, t)))
        for i, j, dev in pending:
            out[:, i * tile:(i + 1) * tile, j * tile:(j + 1) * tile] = \
                np.asarray(dev)[:n]
        return out[:, :h, :w]

    def predict_array(self, images: np.ndarray, out_hw: Optional[Tuple[int, int]] = None) -> np.ndarray:
        """images: [B, H, W, C] float -> [B, outH, outW] int32 class indices.

        ``uint8`` input uploads RAW and normalizes on device (per-image /255
        iff max > 1, as ``BasicDataset.preprocess``): 4x less host->device
        transfer — the interactive bottleneck for large scans.  Argmax
        parity with host normalization (the device divide can differ by
        1 f32 ulp); pass float for bitwise-identical logits.
        """
        if images.dtype == np.uint8 and not self._uint8_transfer:
            images = _norm_uint8_host(np.asarray(images))
        in_hw = images.shape[1:3]
        out_hw = tuple(out_hw or in_hw)
        self._ensure_quantized(images)
        if self._use_tiling(in_hw, out_hw):
            return self._tiled_predict(images)
        run = self._step(tuple(in_hw), out_hw, images.dtype == np.uint8,
                         batch=images.shape[0])
        if images.ndim == 4 and images.shape[-1] == 1:
            images = images[..., 0]  # rank-3 transfer avoids HBM lane padding
        x, b = self._shard_batch(images)
        return np.asarray(run(self.params, self.bn_state, x))[:b]

    def predict_image(self, img: Image.Image, postprocess: bool = True) -> np.ndarray:
        """One PIL image -> {0,1,2} mask at the original size."""
        arr = BasicDataset.preprocess(None, img, scale=1, is_mask=False)
        pred = self.predict_array(arr[None], out_hw=(img.size[1], img.size[0]))[0]
        if postprocess:
            pred = postprocess_mask(pred.astype(np.uint8))
        return pred

    def predict_paths(  # noqa: C901 — host/device overlap plumbing
        self,
        in_files: Iterable[str],
        output_dir: Optional[str] = None,
        postprocess: bool = True,
        save: bool = True,
        overwrite_suffix: str = ".png",
        fast_transfer: bool = False,
    ) -> Dict[str, np.ndarray]:
        """Batch-predict files, grouped by image size; returns {path: mask}.

        ``fast_transfer=True`` uploads raw uint8 pixels and normalizes on
        device (4x less host->device traffic; the upload dominates large
        scans).  Valid because predict runs preprocess at scale=1: the
        identity-size PIL resize is bit-exact and the /255 moves on-device
        (argmax parity — see :meth:`predict_array`).
        """
        in_files = list(in_files)
        raw_uint8 = fast_transfer and self._uint8_transfer

        def load(path):
            try:
                img = Image.open(path).convert("L")
                if raw_uint8:
                    return path, np.asarray(img)[..., None]
                return path, BasicDataset.preprocess(None, img, scale=1, is_mask=False)
            except Exception:
                log.exception("Failed to open %s", path)
                return path, None

        # parallel decode (PIL releases the GIL), grouped by size
        by_size: Dict[Tuple[int, int], List[Tuple[str, np.ndarray]]] = {}
        with ThreadPoolExecutor(max_workers=8) as loader:
            for path, arr in loader.map(load, in_files):
                if arr is not None:
                    by_size.setdefault(arr.shape[:2], []).append((path, arr))

        results: Dict[str, np.ndarray] = {}

        def host_post(path: str, pred: np.ndarray):
            if postprocess:
                pred = postprocess_mask(pred.astype(np.uint8))
            results[path] = pred
            if save:
                if output_dir is None:
                    out_path = os.path.splitext(path)[0] + overwrite_suffix
                else:
                    os.makedirs(output_dir, exist_ok=True)
                    base = os.path.splitext(os.path.basename(path))[0]
                    out_path = os.path.join(output_dir, base + overwrite_suffix)
                if out_path.lower().endswith(".png"):
                    # level-1 zlib: 4.9x faster encode on this 1-core host,
                    # decoded pixels identical (masks are large flat regions)
                    mask_to_image(pred).save(out_path, compress_level=1)
                else:
                    mask_to_image(pred).save(out_path)

        def post_chunk(chunk, preds_device):
            preds = np.asarray(preds_device)  # device->host off the main loop
            for (path, _), pred in zip(chunk, preds):
                host_post(path, pred)

        with ThreadPoolExecutor(max_workers=8) as pool:
            futures = []
            for size, items in by_size.items():
                for i in range(0, len(items), self.batch_size):
                    chunk = items[i : i + self.batch_size]
                    batch = np.stack([a for _, a in chunk])
                    preds_device = self._predict_device(batch)
                    # async dispatch: post-processing (and the device->host
                    # copy) overlaps the next batch's forward
                    futures.append(pool.submit(post_chunk, chunk, preds_device))
            for f in futures:
                f.result()
        return results

    # single-channel batches transfer rank-3 (a (B,H,W,1) program input is
    # lane-padded 128x in HBM); exported StableHLO modules have a fixed
    # rank-4 signature, so StableHLOPredictor turns this off
    _rank3_transfer = True
    # raw-uint8 upload + device normalization; backends with a fixed float
    # signature (StableHLOPredictor) turn this off and host-normalize instead
    _uint8_transfer = True

    def _predict_device(self, images: np.ndarray):
        """Dispatch one batch; returns a (possibly device) prediction array.

        Subclass override point for custom inference backends.
        """
        if images.dtype == np.uint8 and not self._uint8_transfer:
            images = _norm_uint8_host(images)
        in_hw = tuple(images.shape[1:3])
        self._ensure_quantized(images)
        if self._use_tiling(in_hw, in_hw):
            return self._tiled_predict(images)
        run = self._step(in_hw, in_hw, images.dtype == np.uint8,
                         batch=images.shape[0])
        if self._rank3_transfer and images.ndim == 4 and images.shape[-1] == 1:
            images = images[..., 0]
        x, _ = self._shard_batch(images)  # padded rows drop in the zip-post
        return self._run_step(run, x)

    def _run_step(self, run, images):
        return run(self.params, self.bn_state, images)


class StableHLOPredictor(Predictor):
    """Predictor backed by a serialized StableHLO module (engine/export.py).

    The TPU-native analogue of the reference's TorchScript ``.pt`` loading
    (predict.py:95-100): a deployable compiled artifact instead of live
    parameters.  The exported module maps images -> logits; resizing to the
    original size and the argmax run in a jitted wrapper around the call.
    """

    _rank3_transfer = False  # exported signature is rank-4 (B, H, W, C)
    _uint8_transfer = False  # exported signature is float: host-normalize

    def __init__(self, exported_bytes: bytes, batch_size: int = 8,
                 tile: int = 512, tile_halo: int = 96,
                 tile_threshold: Optional[int] = None):
        self.exported = jax.export.deserialize(bytearray(exported_bytes))
        self.params = self.bn_state = None  # baked into the exported module
        self.batch_size = batch_size
        self.tile = tile
        self.tile_halo = tile_halo
        self.tile_threshold = (
            self.TILE_THRESHOLD if tile_threshold is None else tile_threshold
        )
        self._step_cache: Dict[Tuple, object] = {}

    @classmethod
    def from_file(cls, path: str, batch_size: int = 8) -> "StableHLOPredictor":
        with open(path, "rb") as f:
            return cls(f.read(), batch_size=batch_size)

    def _build_step(self, in_hw: Tuple[int, int], out_hw: Tuple[int, int],
                    from_uint8: bool = False, use_int8: bool = False):
        # use_int8 is decided at EXPORT time (export_stablehlo_int8 bakes the
        # quantized program); the live-quantization flag never applies here
        # (self._qparams stays None, so the base _step always passes False).
        exported = self.exported
        assert not from_uint8, "uint8 input is host-normalized for StableHLO"

        @jax.jit
        def run(images):
            logits = exported.call(images)
            logits = bilinear_resize(
                logits.astype(jnp.float32), out_hw[0], out_hw[1], align_corners=False
            )
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        return run

    def _tile_core_forward(self, win: int, core: int, halo: int):
        exported = self.exported

        def fwd(params, bn_state, tile_img):  # params/bn ignored: baked in
            logits = exported.call(tile_img)
            pred = jnp.argmax(logits.astype(jnp.float32), axis=-1)
            return pred[:, halo: halo + core, halo: halo + core].astype(jnp.int32)

        return fwd

    def predict_array(self, images, out_hw=None):
        images = np.asarray(images)
        if images.dtype == np.uint8:  # exported signature is float: host-norm
            images = _norm_uint8_host(images)
        in_hw = images.shape[1:3]
        out_hw = tuple(out_hw or in_hw)
        if self._use_tiling(in_hw, out_hw):
            return self._tiled_predict(images)
        run = self._step(tuple(in_hw), out_hw)
        return np.asarray(run(jnp.asarray(images)))

    def _run_step(self, run, images):
        return run(images)
