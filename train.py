#!/usr/bin/env python
"""Train a UNet-family model (thin wrapper; see package ``cli.train``).

Kept at the repo root so ``python train.py`` mirrors the reference's
top-level script (``/root/reference/train.py``); the installable console
entry point is ``umics-train``.
"""

import sys

from unet_medical_image_contour_segmentation_tpu.cli.train import main

if __name__ == "__main__":
    sys.exit(main())
