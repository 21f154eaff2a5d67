#!/usr/bin/env python
"""RAW contour-extraction pipeline (thin wrapper; see package ``cli.seg_main``).

Kept at the repo root so ``python seg_main.py`` mirrors the reference's
top-level script (``/root/reference/seg_main.py``); the installable console
entry point is ``umics-seg-main``.
"""

import sys

from unet_medical_image_contour_segmentation_tpu.cli.seg_main import main

if __name__ == "__main__":
    sys.exit(main())
