"""Connected-component penalty loss (host-side, non-differentiable).

Reference: ``/root/reference/utils/connected_component_loss.py``.  The
original is a cv2/numpy round-trip with no gradient, referenced only from
commented-out code (``train.py:124-132``); we keep the same contract: a host
function over a [B, H, W] probability array.  ``as_jax_callback`` wraps it as
a ``jax.pure_callback`` so it can sit inside a jitted step if ever enabled.
"""

from __future__ import annotations

import numpy as np

__all__ = ["connected_component_loss", "as_jax_callback"]


def connected_component_loss(
    pred_mask,
    edge_distance: int = 50,
    min_area: int = 1000,
    penalty_weight: float = 0.1,
) -> float:
    """Penalty for small components and components hugging the image border."""
    import cv2

    pred = np.asarray(pred_mask)
    batch_size = pred.shape[0]
    penalty = 0.0
    for i in range(batch_size):
        binary = (pred[i] > 0.5).astype(np.uint8)
        contours, _ = cv2.findContours(binary, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
        h, w = binary.shape
        for contour in contours:
            area = cv2.contourArea(contour)
            if area < min_area:
                penalty += 1.0 - area / min_area
                continue
            x, y, cw, ch = cv2.boundingRect(contour)
            cx, cy = x + cw // 2, y + ch // 2
            dist = min(cx, w - cx, cy, h - cy)
            if dist < edge_distance:
                penalty += 1.0 - dist / edge_distance
    return penalty / batch_size * penalty_weight


def as_jax_callback(edge_distance=50, min_area=1000, penalty_weight=0.1):
    """jit-compatible wrapper: [B, H, W] probs -> f32 scalar (no gradient)."""
    import jax
    import jax.numpy as jnp

    def _host(p):
        return np.float32(
            connected_component_loss(p, edge_distance, min_area, penalty_weight)
        )

    def call(pred_mask):
        return jax.pure_callback(
            _host, jax.ShapeDtypeStruct((), jnp.float32), pred_mask
        )

    return call
