#!/usr/bin/env python
"""Generate a learnable synthetic 512^2 contour-segmentation dataset on disk.

Images: dark background + bright filled ellipse(s) with noise and blur-ish
texture.  Masks: 0 background / 255 interior / 128 boundary ring — the same
three-value convention the reference dataset uses (mask values {0,128,255}).
Layout: <root>/imgs/{train,val}/c*.png + <root>/masks/{train,val}/c*_mask.png
"""
import sys
from pathlib import Path

import numpy as np
from PIL import Image

root = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth512")
n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 64
n_val = int(sys.argv[3]) if len(sys.argv) > 3 else 8
H = W = 512
rng = np.random.default_rng(7)

yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)


def make_pair(rng):
    mask = np.zeros((H, W), np.uint8)
    img = rng.normal(40, 12, (H, W)).astype(np.float32)
    for _ in range(rng.integers(1, 3)):
        cy, cx = rng.uniform(128, H - 128), rng.uniform(128, W - 128)
        ry, rx = rng.uniform(40, 140), rng.uniform(40, 140)
        th = rng.uniform(0, np.pi)
        c, s = np.cos(th), np.sin(th)
        u = ((xx - cx) * c + (yy - cy) * s) / rx
        v = (-(xx - cx) * s + (yy - cy) * c) / ry
        d = u * u + v * v
        inner = d < 1.0
        ring = (d < 1.18) & ~inner
        mask[inner] = 255
        mask[ring & (mask == 0)] = 128
        img[inner] += rng.uniform(120, 170)
        img[ring] += rng.uniform(60, 100)
    img += rng.normal(0, 8, (H, W))
    return np.clip(img, 0, 255).astype(np.uint8), mask


for split, n in (("train", n_train), ("val", n_val)):
    (root / "imgs" / split).mkdir(parents=True, exist_ok=True)
    (root / "masks" / split).mkdir(parents=True, exist_ok=True)
    for i in range(n):
        img, mask = make_pair(rng)
        Image.fromarray(img).save(root / "imgs" / split / f"c{i:03d}.png")
        Image.fromarray(mask).save(root / "masks" / split / f"c{i:03d}_mask.png")
print(f"wrote {n_train}+{n_val} pairs under {root}")
