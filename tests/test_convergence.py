"""Integration: the full engine learns a synthetic contour-segmentation task.

Bright rectangles on noise; class 2 = the rectangle (the 'target contour'
class the reference scores, evaluate.py:114), class 1 elsewhere.  A tiny UNet
must reach high class-2 Dice within a few dozen steps — exercising model,
compound loss, RMSprop, BN statistics, and the eval Dice together.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_medical_image_contour_segmentation_tpu.engine.evaluate import make_eval_step
from unet_medical_image_contour_segmentation_tpu.engine.optim import RMSpropConfig
from unet_medical_image_contour_segmentation_tpu.engine.train import (
    init_train_state, make_train_step,
)
from unet_medical_image_contour_segmentation_tpu.losses.compound import LossConfig
from unet_medical_image_contour_segmentation_tpu.models.unet import unet_t


def _make_batch(rng, b=8, hw=64):
    imgs = rng.normal(0.2, 0.05, (b, hw, hw, 1)).astype(np.float32)
    masks = np.ones((b, hw, hw), np.int32)
    for i in range(b):
        y0, x0 = rng.integers(8, hw - 24, 2)
        h, w = rng.integers(12, 20, 2)
        imgs[i, y0 : y0 + h, x0 : x0 + w, 0] += 0.6
        masks[i, y0 : y0 + h, x0 : x0 + w] = 2
    return {"image": np.clip(imgs, 0, 1), "mask": masks}


def _dice_class2(pred, true):
    p = (pred == 2).astype(np.float64)
    t = (true == 2).astype(np.float64)
    inter = 2 * (p * t).sum()
    denom = p.sum() + t.sum()
    return inter / max(denom, 1e-9)


@pytest.mark.parametrize("layout", ["nhwc", "s2d"])
def test_learns_synthetic_contours(layout):
    lr = 1e-3
    rng = np.random.default_rng(0)
    model = unet_t(1, 3, layout=layout)
    state = init_train_state(model, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(
        model, LossConfig(n_classes=3), RMSpropConfig(learning_rate=lr),
    ), donate_argnums=(0,))

    # train loss reaches ~0 in <100 steps; the extra steps let the BN
    # running statistics (eval-mode normalization) catch up to the policy
    for _ in range(160):
        state, metrics = step(state, _make_batch(rng), lr)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) < 0.1

    eval_step = make_eval_step(model, 3)
    val = _make_batch(np.random.default_rng(99))
    pred = np.asarray(eval_step(state.params, state.bn_state, jnp.asarray(val["image"])))
    dice = _dice_class2(pred, val["mask"])
    assert dice > 0.7, f"class-2 dice after 160 steps: {dice:.3f}"
