"""Host-side dataset mirroring the reference's BasicDataset.

Reference: ``/root/reference/utils/data_loading.py:37-137``.  Same behavior —
id scan, parallel mask-value scan, 4x rotation augmentation (original + 90/
180/270 with expand), PIL NEAREST/BICUBIC scale resize, mask value map
{255->2, 128->1, 0->0}, /255 image normalization — but emitting channel-last
(H, W, C) numpy for the TPU NHWC data path instead of CHW torch tensors.

PIL is kept for the resizes on purpose: bitwise parity of BICUBIC/NEAREST
resampling with the reference is a stated goal (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import logging
import threading
from concurrent.futures import ThreadPoolExecutor
from os import listdir
from os.path import isfile, join, splitext
from pathlib import Path
from typing import Dict

import numpy as np
from PIL import Image

__all__ = ["BasicDataset", "CarvanaDataset", "load_image", "unique_mask_values"]

log = logging.getLogger(__name__)


def load_image(filename) -> Image.Image:
    """npy / torch-tensor / image file -> PIL image (data_loading.py:15-22)."""
    ext = splitext(str(filename))[1]
    if ext == ".npy":
        return Image.fromarray(np.load(filename))
    if ext in (".pt", ".pth"):
        import torch

        return Image.fromarray(torch.load(filename, weights_only=False).numpy())
    return Image.open(filename)


def unique_mask_values(idx: str, mask_dir: Path, mask_suffix: str):
    mask_file = list(Path(mask_dir).glob(idx + mask_suffix + ".*"))[0]
    mask = np.asarray(load_image(mask_file))
    if mask.ndim == 2:
        return np.unique(mask)
    if mask.ndim == 3:
        return np.unique(mask.reshape(-1, mask.shape[-1]), axis=0)
    raise ValueError(f"mask arrays must be rank 2 or 3, got rank {mask.ndim}")


class BasicDataset:
    """Image/mask pair dataset with optional 4x rotation augmentation."""

    def __init__(
        self,
        images_dir,
        mask_dir,
        scale: float = 1.0,
        mask_suffix: str = "_mask",
        augment: bool = True,
        scan_mask_values: bool = True,
        cache_bytes: int = 0,
    ):
        self.images_dir = Path(images_dir)
        self.mask_dir = Path(mask_dir)
        if not 0 < scale <= 1:
            raise ValueError(f"scale must lie in (0, 1], got {scale}")
        self.scale = scale
        self.mask_suffix = mask_suffix
        self.augment = augment
        # Optional ready-sample cache: decode+rotate+preprocess is fully
        # deterministic per index, so epochs >= 2 can skip the host's decode
        # path entirely (it is the serial bottleneck on few-core hosts).
        # Insert-until-full within the byte budget — access is cyclic per
        # epoch, so eviction would only churn.  0 disables (reference-like).
        self._cache = {} if cache_bytes > 0 else None
        self._cache_budget = int(cache_bytes)
        self._cache_used = 0
        self._cache_lock = threading.Lock()

        self.ids = [
            splitext(f)[0]
            for f in listdir(images_dir)
            if isfile(join(images_dir, f)) and not f.startswith(".")
        ]
        if not self.ids:
            raise RuntimeError(
                f"image directory {images_dir} contains no usable files"
            )
        log.info("dataset ready: %d ids under %s", len(self.ids), images_dir)

        if scan_mask_values:
            # The reference uses a fork Pool (data_loading.py:53-57); PIL +
            # numpy release the GIL so threads give the same scan throughput
            # without fork overhead.
            with ThreadPoolExecutor() as ex:
                unique = list(
                    ex.map(
                        lambda i: unique_mask_values(i, self.mask_dir, self.mask_suffix),
                        self.ids,
                    )
                )
            self.mask_values = list(
                sorted(np.unique(np.concatenate(unique), axis=0).tolist())
            )
        else:
            self.mask_values = [0, 128, 255]

    def __len__(self) -> int:
        return len(self.ids) * (4 if self.augment else 1)

    @staticmethod
    def preprocess(mask_values, pil_img: Image.Image, scale: float, is_mask: bool):
        """Resize + value-map/normalize one PIL image (data_loading.py:65-89).

        Images come back channel-last (H, W, C) float; masks (H, W) int8.
        """
        w, h = pil_img.size
        new_w, new_h = int(scale * w), int(scale * h)
        if new_w <= 0 or new_h <= 0:
            raise ValueError(
                f"scale {scale} collapses a {w}x{h} image to zero pixels"
            )
        pil_img = pil_img.resize(
            (new_w, new_h), resample=Image.NEAREST if is_mask else Image.BICUBIC
        )
        img = np.asarray(pil_img)

        if is_mask:
            mask = np.zeros((new_h, new_w), dtype=np.int8)
            mask[img == 255] = 2  # target contour
            mask[img == 128] = 1  # background
            mask[img == 0] = 0    # shadow/ghost
            return mask

        if img.ndim == 2:
            img = img[..., np.newaxis]  # (H, W, 1) — NHWC, not the reference's CHW
        if (img > 1).any():
            img = img.astype(np.float32) / 255.0
        return np.ascontiguousarray(img, dtype=np.float32)

    @staticmethod
    def rotate_image_and_mask(img: Image.Image, mask: Image.Image, angle: int):
        return img.rotate(angle, expand=True), mask.rotate(angle, expand=True)

    def sample_name(self, idx: int) -> str:
        original_idx = idx // 4 if self.augment else idx
        return self.ids[original_idx]

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        if self._cache is not None:
            hit = self._cache.get(idx)
            if hit is not None:
                return hit  # consumers stack into fresh batches, never mutate
        original_idx = idx // 4 if self.augment else idx
        rotation_idx = idx % 4 if self.augment else 0

        name = self.ids[original_idx]
        mask_file = list(self.mask_dir.glob(name + self.mask_suffix + ".*"))
        img_file = list(self.images_dir.glob(name + ".*"))
        if len(img_file) != 1:
            raise AssertionError(
                f"expected exactly one image for id {name!r}, got {img_file}"
            )
        if len(mask_file) != 1:
            raise AssertionError(
                f"expected exactly one mask for id {name!r}, got {mask_file}"
            )

        mask = load_image(mask_file[0])
        img = load_image(img_file[0])
        if img.size != mask.size:
            raise AssertionError(
                f"size mismatch for {name!r}: image {img.size} vs mask {mask.size}"
            )

        if self.augment and rotation_idx > 0:
            angles = [90, 180, 270]
            img, mask = self.rotate_image_and_mask(img, mask, angles[rotation_idx - 1])

        img_a = self.preprocess(self.mask_values, img, self.scale, is_mask=False)
        mask_a = self.preprocess(self.mask_values, mask, self.scale, is_mask=True)

        if not np.all((mask_a >= 0) & (mask_a <= 2)):
            raise AssertionError("mask holds values outside the class range {0,1,2}")

        sample = {"image": img_a, "mask": mask_a.astype(np.int32)}
        if self._cache is not None:
            nb = sample["image"].nbytes + sample["mask"].nbytes
            # locked check+insert: concurrent loader threads decoding the
            # same idx must not double-count the budget
            with self._cache_lock:
                if (idx not in self._cache
                        and self._cache_used + nb <= self._cache_budget):
                    self._cache[idx] = sample
                    self._cache_used += nb
        return sample


class CarvanaDataset(BasicDataset):
    def __init__(self, images_dir, mask_dir, scale=1, augment=True):
        super().__init__(images_dir, mask_dir, scale, mask_suffix="_mask", augment=augment)
