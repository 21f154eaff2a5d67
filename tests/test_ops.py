"""Unit tests for core ops: conv/pool/BN/resize parity vs torch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_medical_image_contour_segmentation_tpu.ops import nn as ops_nn
from unet_medical_image_contour_segmentation_tpu.ops import resize as ops_resize

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

RTOL, ATOL = 1e-5, 1e-5


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


class TestConv:
    @pytest.mark.parametrize("k,pad", [(3, 1), (1, 0), (7, 3)])
    def test_conv2d_matches_torch(self, k, pad):
        x = _rand(2, 16, 16, 4)
        w = _rand(k, k, 4, 8, seed=1)
        ours = ops_nn.conv2d(jnp.asarray(x), jnp.asarray(w), padding=pad)
        theirs = F.conv2d(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(w).permute(3, 2, 0, 1),
            padding=pad,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=RTOL, atol=ATOL)

    def test_conv2d_bias(self):
        x = _rand(1, 8, 8, 3)
        w = _rand(1, 1, 3, 5, seed=1)
        b = _rand(5, seed=2)
        ours = ops_nn.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
        theirs = F.conv2d(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(w).permute(3, 2, 0, 1),
            torch.from_numpy(b),
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=RTOL, atol=ATOL)

    def test_conv_transpose2d_matches_torch(self):
        x = _rand(2, 7, 9, 6)
        w_t = _rand(6, 3, 2, 2, seed=1)  # torch layout (in, out, kh, kw)
        b = _rand(3, seed=2)
        w_ours = jnp.asarray(w_t.transpose(2, 3, 0, 1))  # HWIO
        ours = ops_nn.conv_transpose2d(jnp.asarray(x), w_ours, jnp.asarray(b), stride=2)
        theirs = F.conv_transpose2d(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(w_t),
            torch.from_numpy(b),
            stride=2,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=RTOL, atol=ATOL)


class TestPoolBN:
    @pytest.mark.parametrize("h,w", [(16, 16), (15, 17)])
    def test_maxpool(self, h, w):
        x = _rand(2, h, w, 3)
        ours = ops_nn.max_pool2d(jnp.asarray(x), 2)
        theirs = F.max_pool2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), 2
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=RTOL, atol=ATOL)

    @pytest.mark.parametrize("train", [True, False])
    def test_batch_norm(self, train):
        x = _rand(4, 8, 8, 5)
        scale, bias = _rand(5, seed=1), _rand(5, seed=2)
        rmean, rvar = _rand(5, seed=3), np.abs(_rand(5, seed=4)) + 0.5

        bn = torch.nn.BatchNorm2d(5)
        with torch.no_grad():
            bn.weight.copy_(torch.from_numpy(scale))
            bn.bias.copy_(torch.from_numpy(bias))
            bn.running_mean.copy_(torch.from_numpy(rmean))
            bn.running_var.copy_(torch.from_numpy(rvar))
        bn.train(train)
        theirs = bn(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().permute(0, 2, 3, 1).numpy()

        ours, (new_mean, new_var) = ops_nn.batch_norm(
            jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
            jnp.asarray(rmean), jnp.asarray(rvar), train=train,
        )
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-4)
        # running-stat updates must match torch exactly in train mode
        np.testing.assert_allclose(
            np.asarray(new_mean), bn.running_mean.numpy(), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(new_var), bn.running_var.numpy(), rtol=1e-4, atol=1e-5
        )


class TestResize:
    @pytest.mark.parametrize("align", [True, False])
    @pytest.mark.parametrize(
        "in_hw,out_hw",
        [((16, 16), (32, 32)), ((7, 9), (14, 18)), ((32, 32), (13, 29)), ((5, 5), (5, 5))],
    )
    def test_bilinear_matches_torch(self, align, in_hw, out_hw):
        x = _rand(2, *in_hw, 3)
        ours = ops_resize.bilinear_resize(jnp.asarray(x), *out_hw, align_corners=align)
        theirs = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=out_hw, mode="bilinear", align_corners=align,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-5)

    def test_upsample_x2(self):
        x = _rand(1, 12, 12, 4)
        ours = ops_resize.upsample_x2_align_corners(jnp.asarray(x))
        theirs = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            scale_factor=2, mode="bilinear", align_corners=True,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-5)
