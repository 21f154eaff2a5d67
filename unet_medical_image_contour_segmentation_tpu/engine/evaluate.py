"""Validation loop: batched device forward, host post-process off-critical-path.

Reference: ``/root/reference/evaluate.py``.  Semantics preserved:

* binary (n_classes == 1): targets //= 2, sigmoid > 0.5, per-batch
  ``dice_coeff`` (evaluate.py:54-65);
* multiclass: argmax, Dice computed **only for class 2** (the target contour,
  evaluate.py:111-117);
* optional post-processed Dice via ``postprocess_mask``;
* ``min_dice`` tracked across *batches* (init 10, evaluate.py:34);
* optional prediction PNG dumps with the {0->0, 1->128, 2->255} value map.

Restructured for TPU (SURVEY.md §3.2 calls the reference's per-sample
device<->host ping-pong its biggest performance sin): the device computes the
whole batch's class indices and raw Dice in one jitted call; cv2 post-process
and PNG encoding run in a host thread pool, overlapped with the next batch's
forward pass.
"""

from __future__ import annotations

import functools
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..losses.dice import dice_coeff
from ..pipeline.post_process import postprocess_mask

__all__ = ["evaluate", "eval_forward", "make_eval_step"]


def eval_forward(model, n_classes: int, params, bn_state, image) -> jnp.ndarray:
    """Pure eval forward: (params, bn_state, image) -> [B,H,W] int32 classes.

    Multiclass s2d-capable configs take the fused path: argmax over
    class-major lane slices then a dense integer d2s — no padded (H, W, C)
    logits ever hit HBM.
    """
    if (
        n_classes > 1
        and hasattr(model, "supports_fused")
        and model.supports_fused(image.shape)
    ):
        from ..losses.s2d_fused import argmax_class_major
        from ..ops.wide import unpack_pred

        logits_cm, _, blk = model.apply_fused(params, bn_state, image, train=False)
        pred = argmax_class_major(logits_cm, n_classes)
        return unpack_pred(blk, pred)
    logits, _ = model.apply(params, bn_state, image, train=False)
    if n_classes == 1:
        prob = jax.nn.sigmoid(logits[..., 0].astype(jnp.float32))
        return (prob > 0.5).astype(jnp.int32)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def make_eval_step(model, n_classes: int):
    """jitted: (params, bn_state, image) -> pred [B,H,W] int32 class indices."""
    return jax.jit(functools.partial(eval_forward, model, n_classes))


def _dice_np(pred: np.ndarray, true: np.ndarray, eps: float = 1e-6) -> float:
    """Reference dice_coeff(reduce_batch_first=False) on host arrays [B,H,W]."""
    inter = 2.0 * (pred * true).sum(axis=(-1, -2))
    sets = pred.sum(axis=(-1, -2)) + true.sum(axis=(-1, -2))
    sets = np.where(sets == 0, inter, sets)
    return float(np.mean((inter + eps) / (sets + eps)))


def _save_png(arr: np.ndarray, path: str, value_map=None):
    from PIL import Image

    out = arr.astype(np.uint8)
    if value_map is not None:
        vis = np.zeros_like(out)
        for src, dst in value_map.items():
            vis[out == src] = dst
        out = vis
    Image.fromarray(out).save(path, compress_level=1)


def evaluate(
    model,
    params,
    bn_state,
    dataloader,
    *,
    epoch_pred_dir: Optional[str] = None,
    postprocess: bool = True,
    eval_step=None,
    batch_sharding=None,
    batch_pad: int = 1,
) -> Tuple[float, float, float]:
    """Returns (dice_original, dice_postprocessed, min_dice) averaged over batches.

    ``batch_sharding``/``batch_pad``: shard each val batch over a device mesh
    (the train loop passes its own batch sharding, so a data-parallel run
    evaluates data-parallel instead of replicating the forward on every
    device).  Ragged batches pad to a ``batch_pad`` multiple by repeating the
    last sample; predictions are cropped back before any host work, so the
    Dice triple is identical to single-device."""
    n_classes = model.n_classes
    eval_step = eval_step or make_eval_step(model, n_classes)

    postprocessed_dir = None
    if epoch_pred_dir is not None and postprocess:
        postprocessed_dir = os.path.join(epoch_pred_dir, "postprocessed")
        os.makedirs(postprocessed_dir, exist_ok=True)

    def host_work(batch_index, pred, true):
        """cv2 post-process + PNG dumps for one batch (runs in a worker thread).

        Returns (dice_orig, dice_post_or_None, batch_min) — reduced by the
        caller, so worker threads never touch shared state.
        """
        if n_classes == 1:
            true = true // 2
            d_orig = _dice_np(pred.astype(np.float32), true.astype(np.float32))
            post = None
            if postprocess:
                # Reference quirk (evaluate.py:73-77): the binary path feeds a
                # {0,255} image into a {0,1,2}-expecting postprocess, which
                # zeroes the mask; preserved for parity.
                post = np.stack(
                    [postprocess_mask((pred[i] * 255).astype(np.uint8)) // 255
                     for i in range(pred.shape[0])]
                )
                d_post = _dice_np(post.astype(np.float32), true.astype(np.float32))
        else:
            d_orig = _dice_np(
                (pred == 2).astype(np.float32), (true == 2).astype(np.float32)
            )
            post = None
            if postprocess:
                post = np.stack(
                    [postprocess_mask(pred[i].astype(np.uint8)) for i in range(pred.shape[0])]
                )
                d_post = _dice_np(
                    (post == 2).astype(np.float32), (true == 2).astype(np.float32)
                )

        if postprocess:
            current = min(d_orig, d_post) if n_classes == 1 else d_orig
        else:
            d_post = None
            current = d_orig

        if epoch_pred_dir is not None:
            vm = None if n_classes == 1 else {0: 0, 1: 128, 2: 255}
            bin_vm = {0: 0, 1: 255}
            for i in range(pred.shape[0]):
                _save_png(
                    pred[i],
                    os.path.join(epoch_pred_dir, f"pred_batch{batch_index}_sample{i}.png"),
                    bin_vm if n_classes == 1 else vm,
                )
                if postprocess and post is not None:
                    _save_png(
                        post[i],
                        os.path.join(postprocessed_dir, f"pred_batch{batch_index}_sample{i}.png"),
                        bin_vm if n_classes == 1 else {0: 0, 2: 255},
                    )
        return d_orig, d_post, current

    from tqdm import tqdm

    n_batches = len(dataloader) if hasattr(dataloader, "__len__") else None
    with ThreadPoolExecutor(max_workers=2) as pool:
        pending = []
        batch_index = 0
        # validation progress (reference evaluate.py:45); auto-off on non-TTY
        for batch in tqdm(dataloader, total=n_batches, desc="Validation round",
                          unit="batch", leave=False, disable=None):
            image = batch["image"]
            if image.ndim == 4 and image.shape[-1] == 1:
                image = image[..., 0]  # rank-3 transfer: dense HBM layout
            n_real = image.shape[0]
            if batch_sharding is not None:
                # pad on the host, then ONE sharded upload (jnp.asarray first
                # would commit to device 0 and pay a second reshard transfer)
                pad = -n_real % max(1, batch_pad)
                if pad:
                    image = np.concatenate(
                        [np.asarray(image),
                         np.repeat(np.asarray(image[-1:]), pad, axis=0)]
                    )
                image = jax.device_put(np.asarray(image), batch_sharding)
            else:
                image = jnp.asarray(image)
            pred = eval_step(params, bn_state, image)
            if pred.shape[0] != n_real:
                pred = pred[:n_real]
            batch_index += 1
            # hand the DEVICE array to the worker: the device->host copy
            # happens there, so the main loop dispatches the next forward
            # without waiting for this batch's results
            pending.append(
                pool.submit(
                    lambda bi, p, m: host_work(bi, np.asarray(p), m),
                    batch_index, pred, np.asarray(batch["mask"]),
                )
            )
        results = [f.result() for f in pending]

    num_batches = len(results)
    n = max(num_batches, 1)
    dice_original = sum(r[0] for r in results) / n
    if postprocess:
        dice_postprocessed = sum(r[1] for r in results) / n
    else:
        dice_postprocessed = dice_original
    min_dice = min((r[2] for r in results), default=10.0)  # reference inits to 10
    return dice_original, dice_postprocessed, min_dice
