#!/usr/bin/env python
"""Export a checkpoint (thin wrapper; see package ``cli.export_model``).

Kept at the repo root so ``python export_model.py`` mirrors the reference's
top-level script (``/root/reference/export_model.py``); the installable
console entry point is ``umics-export``.
"""

import sys

from unet_medical_image_contour_segmentation_tpu.cli.export_model import main

if __name__ == "__main__":
    sys.exit(main())
