"""Stages 2 & 4: 512x512 letterbox normalization and its exact inverse.

Reference: ``/root/reference/utils/png_normalize.py`` and
``png_denormalize.py``.  Normalize: grayscale 'L', aspect-preserving LANCZOS
resize with the long side -> 512, centered paste on a black 512x512 canvas,
per-file original sizes recorded in ``original_sizes.json``.  Denormalize:
recompute scale/padding from the recorded size, crop the black bars, LANCZOS
back to the original WxH.  PIL LANCZOS is kept for bit parity with the
reference (SURVEY.md §7).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Dict, Optional, Tuple

from PIL import Image

__all__ = [
    "letterbox_geometry",
    "normalize_image",
    "denormalize_image",
    "PngNormalizer",
    "PngDenormalizer",
]

log = logging.getLogger(__name__)


def letterbox_geometry(orig_w: int, orig_h: int, target: int = 512) -> Tuple[int, int, int, int]:
    """(new_w, new_h, pad_x, pad_y) of the centered letterbox."""
    if orig_w >= orig_h:
        new_w = target
        new_h = int(orig_h * (target / orig_w))
    else:
        new_h = target
        new_w = int(orig_w * (target / orig_h))
    pad_x = (target - new_w) // 2
    pad_y = (target - new_h) // 2
    return new_w, new_h, pad_x, pad_y


def normalize_image(img: Image.Image, target: int = 512) -> Image.Image:
    """Grayscale + LANCZOS long-side resize + centered black letterbox."""
    if img.mode != "L":
        img = img.convert("L")
    w, h = img.size
    new_w, new_h, pad_x, pad_y = letterbox_geometry(w, h, target)
    resized = img.resize((new_w, new_h), resample=Image.LANCZOS)
    canvas = Image.new("L", (target, target), 0)
    canvas.paste(resized, (pad_x, pad_y))
    return canvas


def denormalize_image(img: Image.Image, orig_w: int, orig_h: int, target: int = 512) -> Image.Image:
    """Crop the letterbox padding and LANCZOS back to the original size."""
    new_w, new_h, pad_x, pad_y = letterbox_geometry(orig_w, orig_h, target)
    cropped = img.crop((pad_x, pad_y, pad_x + new_w, pad_y + new_h))
    return cropped.resize((orig_w, orig_h), resample=Image.LANCZOS)


class PngNormalizer:
    """Directory/single-file letterbox normalizer writing original_sizes.json."""

    def __init__(self, input_path: str, output_path: Optional[str] = None, target_size: int = 512):
        self.input_path = Path(input_path)
        if output_path:
            self.output_path = Path(output_path)
        elif self.input_path.is_file():
            self.output_path = self.input_path.parent
        else:
            self.output_path = self.input_path
        self.target_size = target_size
        self.original_sizes: Dict[str, Dict[str, int]] = {}

    def _json_path(self) -> Path:
        if self.input_path.is_file():
            return self.output_path / f"{self.input_path.stem}_sizes.json"
        return self.output_path / "original_sizes.json"

    def normalize(self) -> Dict[str, int]:
        self.output_path.mkdir(parents=True, exist_ok=True)
        if self.input_path.is_file():
            files = [self.input_path] if self.input_path.suffix.lower() == ".png" else []
        else:
            files = sorted(self.input_path.glob("*.png"))
        if not files:
            log.warning("No PNG images found at %s", self.input_path)
            return {"processed": 0, "failed": 0, "total": 0}

        ok = 0
        for p in files:
            try:
                with Image.open(p) as img:
                    w, h = img.size
                    self.original_sizes[p.name] = {"width": w, "height": h}
                    out = normalize_image(img, self.target_size)
                    out.save(self.output_path / p.name, "PNG", compress_level=1)
                ok += 1
            except Exception:
                log.exception("Failed to normalize %s", p.name)

        with open(self._json_path(), "w", encoding="utf-8") as f:
            json.dump(self.original_sizes, f, ensure_ascii=False, indent=2)
        return {"processed": ok, "failed": len(files) - ok, "total": len(files)}


class PngDenormalizer:
    """Inverse letterbox using the recorded original sizes."""

    def __init__(
        self,
        input_path: str,
        output_path: Optional[str] = None,
        original_sizes_json: Optional[str] = None,
        target_size: int = 512,
    ):
        self.input_path = Path(input_path)
        if output_path:
            self.output_path = Path(output_path)
        elif self.input_path.is_file():
            self.output_path = self.input_path.parent
        else:
            self.output_path = self.input_path
        if original_sizes_json:
            self.original_sizes_json = Path(original_sizes_json)
        elif self.input_path.is_file():
            self.original_sizes_json = self.input_path.parent / f"{self.input_path.stem}_sizes.json"
        else:
            self.original_sizes_json = self.input_path / "original_sizes.json"
        self.target_size = target_size
        self.original_sizes: Dict[str, Dict[str, int]] = {}

    def denormalize(self) -> Dict[str, int]:
        try:
            with open(self.original_sizes_json, "r", encoding="utf-8") as f:
                self.original_sizes = json.load(f)
        except Exception:
            log.exception("Failed to load original sizes JSON %s", self.original_sizes_json)
            return {"processed": 0, "failed": 0, "total": 0}

        self.output_path.mkdir(parents=True, exist_ok=True)
        if self.input_path.is_file():
            files = [self.input_path] if self.input_path.suffix.lower() == ".png" else []
        else:
            files = sorted(self.input_path.glob("*.png"))
        if not files:
            log.warning("No PNG images found at %s", self.input_path)
            return {"processed": 0, "failed": 0, "total": 0}

        ok = 0
        for p in files:
            if p.name not in self.original_sizes:
                log.warning("No original size recorded for %s, skipping", p.name)
                continue
            try:
                size = self.original_sizes[p.name]
                with Image.open(p) as img:
                    out = denormalize_image(img, size["width"], size["height"], self.target_size)
                    out.save(self.output_path / p.name, "PNG", compress_level=1)
                ok += 1
            except Exception:
                log.exception("Failed to denormalize %s", p.name)
        return {"processed": ok, "failed": len(files) - ok, "total": len(files)}


def main_normalize():
    """CLI mirror of reference utils/png_normalize.py:169-183."""
    import argparse

    logging.basicConfig(level=logging.INFO, format="%(asctime)s - %(levelname)s - %(message)s")
    parser = argparse.ArgumentParser(description="Letterbox PNGs to 512x512")
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", "-o")
    parser.add_argument("--size", "-s", type=int, default=512)
    args = parser.parse_args()
    PngNormalizer(args.input, args.output, target_size=args.size).normalize()


def main_denormalize():
    """CLI mirror of reference utils/png_denormalize.py:177-195."""
    import argparse

    logging.basicConfig(level=logging.INFO, format="%(asctime)s - %(levelname)s - %(message)s")
    parser = argparse.ArgumentParser(description="Invert the 512x512 letterbox")
    parser.add_argument("-i", "--input", required=True)
    parser.add_argument("-o", "--output")
    parser.add_argument("-j", "--json")
    parser.add_argument("-s", "--size", type=int, default=512)
    args = parser.parse_args()
    PngDenormalizer(args.input, args.output, args.json, target_size=args.size).denormalize()
