#!/usr/bin/env python
"""Predict contour masks (thin wrapper; see package ``cli.predict``).

Kept at the repo root so ``python predict.py`` mirrors the reference's
top-level script (``/root/reference/predict.py``); the installable console
entry point is ``umics-predict``.
"""

import sys

from unet_medical_image_contour_segmentation_tpu.cli.predict import main

if __name__ == "__main__":
    sys.exit(main())
