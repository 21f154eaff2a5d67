"""Visualization helpers (reference ``utils/utils.py:4-13``)."""

from __future__ import annotations

import numpy as np

__all__ = ["plot_img_and_mask"]


def plot_img_and_mask(img, mask):
    """Image + one subplot per mask class (matplotlib, host-side)."""
    import matplotlib.pyplot as plt

    mask = np.asarray(mask)
    classes = int(mask.max()) + 1
    fig, ax = plt.subplots(1, classes + 1)
    ax[0].set_title("Input image")
    ax[0].imshow(img, cmap="gray")
    for i in range(classes):
        ax[i + 1].set_title(f"Mask (class {i + 1})")
        ax[i + 1].imshow(mask == i)
    plt.xticks([]), plt.yticks([])
    plt.show()
