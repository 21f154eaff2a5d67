"""Wide (width-only blocked) layout: op exactness + model parity vs NHWC.

The wide layout (ops/wide.py, models/wide_exec.py) must be numerically
exact against the dense NHWC path for every op and for full forwards/
gradients — same invariant the square s2d layout carries (test_s2d.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_medical_image_contour_segmentation_tpu.ops import wide as W
from unet_medical_image_contour_segmentation_tpu.ops.nn import (
    batch_norm, conv2d, conv_transpose2d, max_pool2d,
)
from unet_medical_image_contour_segmentation_tpu.ops.resize import (
    upsample_x2_align_corners,
)
from unet_medical_image_contour_segmentation_tpu.models.unet import (
    unet_s, unet_sa, unet_t,
)


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


class TestWideOps:
    @pytest.mark.parametrize(
        "k,cin,cout,bw",
        [(3, 16, 16, 8), (3, 1, 16, 8), (3, 32, 16, 4), (3, 64, 64, 2),
         (7, 2, 1, 8), (7, 2, 1, 2), (3, 16, 32, 8), (3, 8, 8, 16)],
    )
    def test_conv_exact(self, k, cin, cout, bw):
        x = jnp.asarray(_rand(2, 16, 32, cin, seed=1))
        w = jnp.asarray(_rand(k, k, cin, cout, seed=2))
        b = jnp.asarray(_rand(cout, seed=3))
        want = conv2d(x, w, b, padding=k // 2)
        got = W.unpack(W.conv_wide(W.pack(x, bw), w, bw, b), bw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-4)

    @pytest.mark.parametrize("bw", [8, 4, 2, 1])
    def test_pool_exact(self, bw):
        x = jnp.asarray(_rand(2, 16, 32, 16, seed=4))
        want = max_pool2d(x, 2)
        got = W.max_pool2_wide(W.pack(x, bw), bw)
        if bw > 1:
            got = W.unpack(got, bw // 2)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    @pytest.mark.parametrize("impl", ["dilated", "einsum"])
    @pytest.mark.parametrize("bw", [8, 4, 2, 1])
    def test_conv_transpose_exact(self, impl, bw):
        # Both formulations (r5-default dilated conv, r4 per-parity einsum)
        # must match the dense NHWC ConvT at every block width.
        fn = {"dilated": W.conv_transpose2_wide_dilated,
              "einsum": W.conv_transpose2_wide_einsum}[impl]
        x = jnp.asarray(_rand(2, 16, 32, 16, seed=5))
        w = jnp.asarray(_rand(2, 2, 16, 8, seed=6))
        b = jnp.asarray(_rand(8, seed=7))
        want = conv_transpose2d(x, w, b, stride=2)
        got = W.unpack(fn(W.pack(x, bw), w, bw, b), 2 * bw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("bw", [8, 2, 1])
    def test_upsample_exact(self, bw):
        x = jnp.asarray(_rand(2, 16, 24, 16, seed=8))
        want = upsample_x2_align_corners(x)
        got = W.unpack(W.upsample2_ac_wide(W.pack(x, bw), bw), 2 * bw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("train", [True, False])
    def test_batch_norm_exact(self, train):
        x = jnp.asarray(_rand(2, 16, 32, 16, seed=9))
        sc = jnp.asarray(_rand(16, seed=10) + 1.0)
        bi = jnp.asarray(_rand(16, seed=11))
        rm = jnp.asarray(_rand(16, seed=12) * 0.1)
        rv = jnp.abs(jnp.asarray(_rand(16, seed=13))) + 0.5
        want, (m1, v1) = batch_norm(x, sc, bi, rm, rv, train=train)
        got, (m2, v2) = W.batch_norm_wide(W.pack(x, 8), sc, bi, rm, rv, 8, train=train)
        np.testing.assert_allclose(np.asarray(W.unpack(got, 8)), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize(
        "bw,stride,cin,cout,k",
        [(8, 2, 1, 32, 3), (4, 2, 32, 64, 3), (2, 2, 64, 128, 3),
         (8, 2, 16, 16, 3), (4, 4, 32, 32, 3)],
    )
    def test_conv_strided_exact(self, bw, stride, cin, cout, k):
        x = jnp.asarray(_rand(2, 16, 32, cin, seed=30))
        w = jnp.asarray(_rand(k, k, cin, cout, seed=31))
        b = jnp.asarray(_rand(cout, seed=32))
        want = conv2d(x, w, b, stride=stride, padding=k // 2)
        got = W.unpack(W.conv_wide(W.pack(x, bw), w, bw, b, stride=stride),
                       max(bw // stride, 1))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-4)

    def test_split_concat_roundtrip(self):
        x = jnp.asarray(_rand(2, 8, 16, 48, seed=33))
        packed = W.pack(x, 4)
        parts = W.split_wide(packed, 4, [16, 32])
        np.testing.assert_array_equal(
            np.asarray(W.unpack(parts[0], 4)), np.asarray(x[..., :16])
        )
        np.testing.assert_array_equal(
            np.asarray(W.unpack(parts[1], 4)), np.asarray(x[..., 16:])
        )
        back = W.concat_wide(parts, 4, [16, 32])
        np.testing.assert_array_equal(np.asarray(back), np.asarray(packed))

    def test_pack_mask_roundtrip(self):
        m = jnp.asarray(np.random.default_rng(14).integers(0, 3, (2, 16, 32)))
        for blk in [("wide", 8), ("s2d", 4), ("wide", 1)]:
            packed = W.pack_mask(blk, m)
            np.testing.assert_array_equal(
                np.asarray(W.unpack_pred(blk, packed)), np.asarray(m)
            )


class TestWideModel:
    @pytest.mark.parametrize("builder", [unet_s, unet_sa, unet_t])
    @pytest.mark.parametrize("train", [True, False])
    @pytest.mark.parametrize("bilinear", [False, True])
    def test_model_wide_matches_nhwc(self, builder, train, bilinear):
        model_nhwc = builder(1, 3, bilinear=bilinear, layout="nhwc")
        model_wide = builder(1, 3, bilinear=bilinear, layout="wide")
        params, state = model_nhwc.init(jax.random.PRNGKey(0))
        x = jnp.asarray(_rand(2, 64, 64, 1, seed=17))

        want, ws = model_nhwc.apply(params, state, x, train=train)
        got, gs = model_wide.apply(params, state, x, train=train)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
        for a, b in zip(jax.tree.leaves(ws), jax.tree.leaves(gs)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_gradients_match(self):
        model_nhwc = unet_s(1, 3, layout="nhwc")
        model_wide = unet_s(1, 3, layout="wide")
        params, state = model_nhwc.init(jax.random.PRNGKey(1))
        x = jnp.asarray(_rand(1, 64, 64, 1, seed=18))

        def loss(model):
            def f(p):
                logits, _ = model.apply(p, state, x, train=True)
                return jnp.mean(jnp.square(logits))
            return f

        g1 = jax.grad(loss(model_nhwc))(params)
        g2 = jax.grad(loss(model_wide))(params)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=1e-5)

    def test_auto_prefers_wide(self):
        """auto layout routes %16 shapes to wide (and 67x75 to NHWC)."""
        model = unet_s(1, 3, layout="auto")
        params, state = model.init(jax.random.PRNGKey(2))
        assert model.supports_fused((1, 64, 64, 1))
        _, _, blk = model.apply_fused(params, state,
                                      jnp.zeros((1, 64, 64, 1)), train=False)
        assert blk == ("wide", 8)
        logits, _ = model.apply(params, state, jnp.zeros((1, 67, 75, 1)))
        assert logits.shape == (1, 67, 75, 3)

    def test_fused_wide_matches_apply(self):
        from unet_medical_image_contour_segmentation_tpu.losses.s2d_fused import (
            argmax_class_major,
        )

        model = unet_s(1, 3, layout="wide")
        params, state = model.init(jax.random.PRNGKey(3))
        x = jnp.asarray(_rand(2, 64, 64, 1, seed=19))
        logits_cm, _, blk = model.apply_fused(params, state, x, train=False)
        pred = W.unpack_pred(blk, argmax_class_major(logits_cm, 3))
        logits, _ = model.apply(params, state, x, train=False)
        np.testing.assert_array_equal(
            np.asarray(pred), np.asarray(jnp.argmax(logits, axis=-1))
        )

    def test_fused_loss_wide_matches_standard(self):
        from unet_medical_image_contour_segmentation_tpu.losses.compound import (
            LossConfig, compute_loss,
        )
        from unet_medical_image_contour_segmentation_tpu.losses.s2d_fused import (
            compute_loss_s2d_multiclass,
        )

        model = unet_s(1, 3, layout="wide")
        params, state = model.init(jax.random.PRNGKey(4))
        x = jnp.asarray(_rand(2, 64, 64, 1, seed=20))
        t = jnp.asarray(np.random.default_rng(21).integers(0, 3, (2, 64, 64)))
        cfg = LossConfig(n_classes=3)

        logits, _ = model.apply(params, state, x, train=True)
        want, _ = compute_loss(logits, t, cfg)
        logits_cm, _, blk = model.apply_fused(params, state, x, train=True)
        got, _ = compute_loss_s2d_multiclass(logits_cm, W.pack_mask(blk, t), cfg)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5, atol=1e-6)

    def test_unetpp_wide_matches_nhwc(self):
        from unet_medical_image_contour_segmentation_tpu.models.unet_nested import (
            unet_pp_s,
        )

        for bilinear in (False, True):
            for train in (True, False):
                nhwc = unet_pp_s(1, 3, bilinear=bilinear, layout="nhwc")
                wide = unet_pp_s(1, 3, bilinear=bilinear, layout="wide")
                params, state = nhwc.init(jax.random.PRNGKey(6))
                x = jnp.asarray(_rand(1, 64, 64, 1, seed=23))
                want, ws = nhwc.apply(params, state, x, train=train)
                got, gs = wide.apply(params, state, x, train=train)
                np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                           rtol=1e-4, atol=1e-4)
                for a, b in zip(jax.tree.leaves(ws), jax.tree.leaves(gs)):
                    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                               rtol=1e-4, atol=1e-5)

    def test_unetpp_deep_supervision_wide(self):
        from unet_medical_image_contour_segmentation_tpu.models.unet_nested import (
            unet_pp_s,
        )

        nhwc = unet_pp_s(1, 3, deep_supervision=True, layout="nhwc")
        wide = unet_pp_s(1, 3, deep_supervision=True, layout="wide")
        params, state = nhwc.init(jax.random.PRNGKey(7))
        x = jnp.asarray(_rand(1, 32, 32, 1, seed=24))
        want, _ = nhwc.apply(params, state, x, train=False)
        got, _ = wide.apply(params, state, x, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_unetpp_gradients_match(self):
        from unet_medical_image_contour_segmentation_tpu.models.unet_nested import (
            unet_pp_s,
        )

        nhwc = unet_pp_s(1, 3, layout="nhwc")
        wide = unet_pp_s(1, 3, layout="wide")
        params, state = nhwc.init(jax.random.PRNGKey(8))
        x = jnp.asarray(_rand(1, 64, 64, 1, seed=25))

        def loss(model):
            def f(p):
                logits, _ = model.apply(p, state, x, train=True)
                return jnp.mean(jnp.square(logits))
            return f

        g1 = jax.grad(loss(nhwc))(params)
        g2 = jax.grad(loss(wide))(params)
        # The layouts agree to ~6e-6 relative in float64; in f32 the nested
        # topology's BN-heavy accumulation chains leave ~0.7%-of-leaf-scale
        # reduction-order noise between ANY two layouts (nhwc<->s2d measures
        # the same), so compare each leaf's deviation against its own scale.
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.max(np.abs(a)) + 1e-12
            assert np.max(np.abs(a - b)) <= 2e-2 * scale + 1e-5

    def test_unetpp_auto_prefers_wide_and_folds(self):
        from unet_medical_image_contour_segmentation_tpu.losses.s2d_fused import (
            argmax_class_major,
        )
        from unet_medical_image_contour_segmentation_tpu.models.fold_bn import (
            fold_params,
        )
        from unet_medical_image_contour_segmentation_tpu.models.unet_nested import (
            unet_pp_s,
        )

        model = unet_pp_s(1, 3)  # auto layout
        params, state = model.init(jax.random.PRNGKey(9))
        state = jax.tree.map(
            lambda a: a + 0.1 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape) / a.size,
            state,
        )
        x = jnp.asarray(_rand(1, 64, 64, 1, seed=26))
        assert model.supports_fused(x.shape)
        want, _ = model.apply(params, state, x, train=False)

        logits_cm, _, blk = model.apply_fused(params, state, x, train=False)
        assert blk == ("wide", 8)
        pred = W.unpack_pred(blk, argmax_class_major(logits_cm, 3))
        np.testing.assert_array_equal(
            np.asarray(pred), np.asarray(jnp.argmax(want, axis=-1))
        )
        # generic BN folding covers the nested topology too
        folded = fold_params(params, state)
        logits_cm_f, _, blk_f = model.apply_fused(folded, None, x, train=False)
        pred_f = W.unpack_pred(blk_f, argmax_class_major(logits_cm_f, 3))
        np.testing.assert_array_equal(
            np.asarray(pred_f), np.asarray(jnp.argmax(want, axis=-1))
        )

    @pytest.mark.parametrize("train", [True, False])
    def test_yolo_wide_matches_nhwc(self, train):
        from unet_medical_image_contour_segmentation_tpu.models.yolov8_seg import (
            yolov8_seg_s,
        )

        nhwc = yolov8_seg_s(1, 3, layout="nhwc")
        wide = yolov8_seg_s(1, 3, layout="wide")
        params, state = nhwc.init(jax.random.PRNGKey(10))
        x = jnp.asarray(_rand(1, 64, 64, 1, seed=27))
        want, ws = nhwc.apply(params, state, x, train=train)
        got, gs = wide.apply(params, state, x, train=train)
        # train-mode BN+SiLU chains accumulate a little more f32 reduction-
        # order noise than the UNet family's BN+ReLU ones
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-3, atol=5e-4)
        for a, b in zip(jax.tree.leaves(ws), jax.tree.leaves(gs)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_yolo_fused_interface(self):
        from unet_medical_image_contour_segmentation_tpu.losses.s2d_fused import (
            argmax_class_major,
        )
        from unet_medical_image_contour_segmentation_tpu.models.yolov8_seg import (
            yolov8_seg_s,
        )

        model = yolov8_seg_s(1, 3)  # auto layout
        params, state = model.init(jax.random.PRNGKey(11))
        x = jnp.asarray(_rand(1, 64, 64, 1, seed=28))
        assert model.supports_fused(x.shape)
        assert not model.supports_fused((1, 60, 64, 1))
        logits_cm, _, blk = model.apply_fused(params, state, x, train=False)
        pred = W.unpack_pred(blk, argmax_class_major(logits_cm, 3))
        logits, _ = model.apply(params, state, x, train=False)
        np.testing.assert_array_equal(
            np.asarray(pred), np.asarray(jnp.argmax(logits, axis=-1))
        )

    def test_yolo_gradients_match(self):
        from unet_medical_image_contour_segmentation_tpu.models.yolov8_seg import (
            yolov8_seg_s,
        )

        nhwc = yolov8_seg_s(1, 3, layout="nhwc")
        wide = yolov8_seg_s(1, 3, layout="wide")
        params, state = nhwc.init(jax.random.PRNGKey(12))
        x = jnp.asarray(_rand(1, 64, 64, 1, seed=29))

        def loss(model):
            def f(p):
                logits, _ = model.apply(p, state, x, train=True)
                return jnp.mean(jnp.square(logits))
            return f

        g1 = jax.grad(loss(nhwc))(params)
        g2 = jax.grad(loss(wide))(params)
        # per-leaf scale tolerance (see test_unetpp_gradients_match)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.max(np.abs(a)) + 1e-12
            assert np.max(np.abs(a - b)) <= 2e-2 * scale + 1e-5

    def test_folded_params_wide(self):
        from unet_medical_image_contour_segmentation_tpu.models.fold_bn import (
            fold_unet_params,
        )
        from unet_medical_image_contour_segmentation_tpu.losses.s2d_fused import (
            argmax_class_major,
        )

        model = unet_s(1, 3, layout="wide")
        params, state = model.init(jax.random.PRNGKey(5))
        state = jax.tree.map(
            lambda a: a + 0.1 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape) / a.size,
            state,
        )
        x = jnp.asarray(_rand(2, 64, 64, 1, seed=22))
        want, _ = model.apply(params, state, x, train=False)
        folded = fold_unet_params(params, state)
        logits_cm, _, blk = model.apply_fused(folded, None, x, train=False)
        pred = W.unpack_pred(blk, argmax_class_major(logits_cm, 3))
        np.testing.assert_array_equal(
            np.asarray(pred), np.asarray(jnp.argmax(want, axis=-1))
        )


class TestHFold:
    """conv_wide's H->batch folding (ops/wide.py:H_FOLD_PLANE) is exact."""

    def test_folded_conv_matches_unfolded(self, monkeypatch):
        from unet_medical_image_contour_segmentation_tpu.ops import wide as W

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((2, 32, 8, 32), np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, 4, 8), np.float32) * 0.1)
        ref = W.conv_wide(x, w, 8)
        monkeypatch.setattr(W, "H_FOLD_PLANE", 64)
        monkeypatch.setattr(W, "_H_FOLD_MIN_ROWS", 4)
        assert W._h_fold_factor(32, 8, 1) > 1
        got = W.conv_wide(x, w, 8)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        # gradients agree up to f32 reassociation of the overlap-add
        g_ref = jax.grad(lambda t: jnp.sum(W.conv_wide(t, w, 8, h_fold=False) ** 2))(x)
        g_fold = jax.grad(lambda t: jnp.sum(W.conv_wide(t, w, 8) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g_fold), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_model_train_step_with_folding(self, monkeypatch):
        """Full wide train forward+grad with folding active on every level."""
        from unet_medical_image_contour_segmentation_tpu.models.unet import unet_t
        from unet_medical_image_contour_segmentation_tpu.ops import wide as W

        model = unet_t(1, 3)
        params, state = model.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.random((1, 64, 64), np.float32))

        def loss(p, fold_active):
            logits, _ = model.apply(p, state, x, train=True)
            return jnp.mean(logits.astype(jnp.float32) ** 2)

        ref_l, ref_g = jax.value_and_grad(lambda p: loss(p, False))(params)
        monkeypatch.setattr(W, "H_FOLD_PLANE", 256)
        monkeypatch.setattr(W, "_H_FOLD_MIN_ROWS", 8)
        got_l, got_g = jax.value_and_grad(lambda p: loss(p, True))(params)
        np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-6, atol=1e-7)
        for a, b in zip(jax.tree_util.tree_leaves(got_g),
                        jax.tree_util.tree_leaves(ref_g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestConvSplit:
    """conv_wide_split / conv1x1_wide_split == concat_wide + conv."""

    def test_conv_wide_split_matches_concat(self):
        from unet_medical_image_contour_segmentation_tpu.ops import wide as W

        rng = np.random.default_rng(0)
        bw, c1, c2 = 4, 32, 16
        a = jnp.asarray(rng.random((2, 16, 8, bw * c1), np.float32))
        b = jnp.asarray(rng.random((2, 16, 8, bw * c2), np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, c1 + c2, 8), np.float32) * 0.1)
        bias = jnp.asarray(rng.standard_normal(8, np.float32))

        ref = W.conv_wide(W.concat_wide([a, b], bw, [c1, c2]), w, bw, bias)
        got = W.conv_wide_split([a, b], [c1, c2], w, bw, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_conv1x1_wide_split_matches_concat(self):
        from unet_medical_image_contour_segmentation_tpu.ops import wide as W

        rng = np.random.default_rng(1)
        bw, c1, c2 = 2, 64, 64
        a = jnp.asarray(rng.random((1, 8, 8, bw * c1), np.float32))
        b = jnp.asarray(rng.random((1, 8, 8, bw * c2), np.float32))
        w = jnp.asarray(rng.standard_normal((1, 1, c1 + c2, 16), np.float32) * 0.1)
        bias = jnp.asarray(rng.standard_normal(16, np.float32))

        ref = W.conv1x1_wide(W.concat_wide([a, b], bw, [c1, c2]), w, bw, bias)
        got = W.conv1x1_wide_split([a, b], [c1, c2], w, bw, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_split_gradients_match(self):
        from unet_medical_image_contour_segmentation_tpu.ops import wide as W

        rng = np.random.default_rng(2)
        bw, c = 4, 32
        a = jnp.asarray(rng.random((1, 16, 4, bw * c), np.float32))
        b = jnp.asarray(rng.random((1, 16, 4, bw * c), np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, 2 * c, 8), np.float32) * 0.1)

        def loss_cat(t):
            return jnp.sum(W.conv_wide(W.concat_wide([t, b], bw, [c, c]), w, bw) ** 2)

        def loss_split(t):
            return jnp.sum(W.conv_wide_split([t, b], [c, c], w, bw) ** 2)

        g1 = jax.grad(loss_cat)(a)
        g2 = jax.grad(loss_split)(a)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                                   rtol=1e-4, atol=1e-5)

    def test_split_custom_vjp_grads_match_autodiff(self):
        """UMICS_SPLIT_CVJP path (r4 probe, kept opt-in): dx/dw from the
        explicit flipped-kernel backward == autodiff, to fp tolerance."""
        from unet_medical_image_contour_segmentation_tpu.ops import wide as W

        rng = np.random.default_rng(4)
        bw, c1, c2 = 8, 16, 16
        a = jnp.asarray(rng.random((2, 32, 4, bw * c1), np.float32))
        b = jnp.asarray(rng.random((2, 32, 4, bw * c2), np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, c1 + c2, 24), np.float32) * 0.1)

        def loss(a, b, w):
            y = W.conv_wide_split([a, b], [c1, c2], w, bw)
            return jnp.sum(y * jnp.sin(y))

        ref = jax.grad(loss, argnums=(0, 1, 2))(a, b, w)
        W.SPLIT_CUSTOM_VJP[0] = True
        try:
            got = jax.grad(loss, argnums=(0, 1, 2))(a, b, w)
        finally:
            W.SPLIT_CUSTOM_VJP[0] = False
        for g, r in zip(got, ref):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-4, atol=1e-5)

    def test_no_h_fold_context(self):
        from unet_medical_image_contour_segmentation_tpu.ops import wide as W

        assert W._h_fold_factor(1024, 128, 1) > 1
        with W.no_h_fold():
            assert W._h_fold_factor(1024, 128, 1) == 1
        assert W._h_fold_factor(1024, 128, 1) > 1

    def test_split_channel_mismatch_raises(self):
        from unet_medical_image_contour_segmentation_tpu.ops import wide as W

        rng = np.random.default_rng(3)
        a = jnp.asarray(rng.random((1, 8, 4, 4 * 16), np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, 32, 8), np.float32))
        with pytest.raises(AssertionError):
            W.conv_wide_split([a], [16], w, 4)  # 16 != kernel cin 32
