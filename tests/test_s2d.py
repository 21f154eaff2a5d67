"""Space-to-depth execution path: exactness vs the NHWC path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_medical_image_contour_segmentation_tpu.ops import s2d as S
from unet_medical_image_contour_segmentation_tpu.ops.nn import (
    batch_norm, conv2d, conv_transpose2d, max_pool2d,
)
from unet_medical_image_contour_segmentation_tpu.models.unet import unet_s, unet_sa


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


class TestS2dOps:
    def test_s2d_d2s_roundtrip(self):
        x = jnp.asarray(_rand(2, 16, 16, 3))
        for b in (1, 2, 4):
            np.testing.assert_array_equal(np.asarray(S.d2s(S.s2d(x, b), b)), np.asarray(x))

    @pytest.mark.parametrize("b", [2, 4])
    @pytest.mark.parametrize("k,cin,cout", [(3, 4, 8), (7, 2, 1), (3, 1, 16)])
    def test_conv_s2d_exact(self, b, k, cin, cout):
        x = jnp.asarray(_rand(2, 16, 16, cin, seed=1))
        w = jnp.asarray(_rand(k, k, cin, cout, seed=2)) * 0.1
        want = conv2d(x, w, padding=k // 2)
        got = S.d2s(S.conv_s2d(S.s2d(x, b), w, b), b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("b", [1, 2])
    def test_conv_transpose2_s2d_exact(self, b):
        x = jnp.asarray(_rand(2, 8, 8, 6, seed=3))
        w = jnp.asarray(_rand(2, 2, 6, 3, seed=4))
        bias = jnp.asarray(_rand(3, seed=5))
        want = conv_transpose2d(x, w, bias, stride=2)
        got = S.d2s(S.conv_transpose2_s2d(S.s2d(x, b), w, b, bias), 2 * b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("b", [2, 4])
    def test_max_pool2_s2d_exact(self, b):
        x = jnp.asarray(_rand(2, 16, 16, 5, seed=6))
        want = max_pool2d(x, 2)
        got = S.d2s(S.max_pool2_s2d(S.s2d(x, b), b), b // 2)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    @pytest.mark.parametrize("train", [True, False])
    def test_batch_norm_s2d_exact(self, train):
        x = jnp.asarray(_rand(2, 16, 16, 4, seed=7))
        scale, bias = jnp.asarray(_rand(4, seed=8)), jnp.asarray(_rand(4, seed=9))
        rmean = jnp.asarray(_rand(4, seed=10))
        rvar = jnp.asarray(np.abs(_rand(4, seed=11)) + 0.5)
        want, (wm, wv) = batch_norm(x, scale, bias, rmean, rvar, train=train)
        got, (gm, gv) = S.batch_norm_s2d(
            S.s2d(x, 4), scale, bias, rmean, rvar, 4, train=train
        )
        np.testing.assert_allclose(np.asarray(S.d2s(got, 4)), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gm), np.asarray(wm), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(wv), rtol=1e-5, atol=1e-6)

    def test_concat_s2d_exact(self):
        a = jnp.asarray(_rand(1, 8, 8, 3, seed=12))
        b_ = jnp.asarray(_rand(1, 8, 8, 5, seed=13))
        want = jnp.concatenate([a, b_], axis=-1)
        got = S.d2s(S.concat_s2d([S.s2d(a, 2), S.s2d(b_, 2)], 2, [3, 5]), 2)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_conv1x1_s2d_exact(self):
        x = jnp.asarray(_rand(1, 8, 8, 6, seed=14))
        w = jnp.asarray(_rand(1, 1, 6, 3, seed=15))
        bias = jnp.asarray(_rand(3, seed=16))
        want = conv2d(x, w, bias)
        got = S.d2s(S.conv1x1_s2d(S.s2d(x, 2), w, 2, bias), 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


class TestS2dModel:
    @pytest.mark.parametrize("builder", [unet_s, unet_sa])
    @pytest.mark.parametrize("train", [True, False])
    @pytest.mark.parametrize("bilinear", [False, True])
    def test_model_s2d_matches_nhwc(self, builder, train, bilinear):
        model_nhwc = builder(1, 3, bilinear=bilinear, layout="nhwc")
        model_s2d = builder(1, 3, bilinear=bilinear, layout="s2d")
        params, state = model_nhwc.init(jax.random.PRNGKey(0))
        x = jnp.asarray(_rand(2, 64, 64, 1, seed=17))

        want, ws = model_nhwc.apply(params, state, x, train=train)
        got, gs = model_s2d.apply(params, state, x, train=train)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)
        for a, b in zip(jax.tree.leaves(ws), jax.tree.leaves(gs)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    def test_gradients_match(self):
        model_nhwc = unet_s(1, 3, layout="nhwc")
        model_s2d = unet_s(1, 3, layout="s2d")
        params, state = model_nhwc.init(jax.random.PRNGKey(1))
        x = jnp.asarray(_rand(1, 64, 64, 1, seed=18))

        def loss(model):
            def f(p):
                logits, _ = model.apply(p, state, x, train=True)
                return jnp.mean(jnp.square(logits))
            return f

        g1 = jax.grad(loss(model_nhwc))(params)
        g2 = jax.grad(loss(model_s2d))(params)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5)

    def test_auto_layout_fallback_odd_size(self):
        """auto layout must fall back to NHWC for incompatible shapes."""
        model = unet_s(1, 3, layout="auto")
        params, state = model.init(jax.random.PRNGKey(2))
        x = jnp.asarray(_rand(1, 67, 75, 1, seed=19))
        logits, _ = model.apply(params, state, x, train=False)
        assert logits.shape == (1, 67, 75, 3)

    def test_s2d_layout_raises_on_incompatible_shape(self):
        model = unet_s(1, 3, bilinear=True, layout="s2d")
        params, state = model.init(jax.random.PRNGKey(3))
        x = jnp.zeros((1, 67, 75, 1))  # not divisible by 16 * block
        with pytest.raises(ValueError):
            model.apply(params, state, x)

    def test_upsample2_ac_s2d_matches_nhwc(self):
        from unet_medical_image_contour_segmentation_tpu.ops.resize import (
            upsample_x2_align_corners,
        )

        for h, w, c, b in [(32, 32, 16, 4), (16, 24, 8, 2), (8, 8, 128, 1)]:
            x = jnp.asarray(_rand(2, h, w, c, seed=40 + b))
            want = upsample_x2_align_corners(x)
            got = S.d2s(S.upsample2_ac_s2d(S.s2d(x, b), b), 2 * b)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
            )


class TestS2dFusedLoss:
    def test_fused_loss_matches_standard(self):
        from unet_medical_image_contour_segmentation_tpu.losses.compound import (
            LossConfig, compute_loss,
        )
        from unet_medical_image_contour_segmentation_tpu.losses.s2d_fused import (
            compute_loss_s2d_multiclass,
        )
        from unet_medical_image_contour_segmentation_tpu.models.s2d_exec import (
            apply_s2d, output_block,
        )
        from unet_medical_image_contour_segmentation_tpu.ops.s2d import s2d_int

        model = unet_s(1, 3, layout="s2d")
        params, state = model.init(jax.random.PRNGKey(4))
        rng = np.random.default_rng(20)
        x = jnp.asarray(rng.random((2, 64, 64, 1), np.float32))
        t = jnp.asarray(rng.integers(0, 3, (2, 64, 64)).astype(np.int32))
        cfg = LossConfig(n_classes=3)

        logits, _ = model.apply(params, state, x, train=True)
        want, wm = compute_loss(logits, t, cfg)

        logits_cm, _ = apply_s2d(model, params, state, x, train=True,
                                 d2s_output=False, class_major=True)
        b0 = output_block(model)
        got, gm = compute_loss_s2d_multiclass(logits_cm, s2d_int(t, b0), cfg)
        assert float(got) == pytest.approx(float(want), rel=1e-5)
        assert float(gm["ce"]) == pytest.approx(float(wm["ce"]), rel=1e-5)
        assert float(gm["dice"]) == pytest.approx(float(wm["dice"]), rel=1e-4)

    def test_fused_gradients_match(self):
        from unet_medical_image_contour_segmentation_tpu.engine.optim import RMSpropConfig
        from unet_medical_image_contour_segmentation_tpu.engine.train import (
            init_train_state, make_train_step,
        )
        from unet_medical_image_contour_segmentation_tpu.losses.compound import LossConfig

        rng = np.random.default_rng(21)
        batch = {
            "image": rng.random((2, 64, 64, 1), np.float32),
            "mask": rng.integers(0, 3, (2, 64, 64)).astype(np.int32),
        }
        cfg = RMSpropConfig(learning_rate=1e-4)

        def run(layout):
            model = unet_s(1, 3, layout=layout)
            state = init_train_state(model, jax.random.PRNGKey(5))
            step = jax.jit(make_train_step(model, LossConfig(n_classes=3), cfg))
            s, m = step(state, batch, 1e-4)
            return float(m["loss"]), float(m["grad_norm"])

        l1, g1 = run("nhwc")
        l2, g2 = run("s2d")   # engages the fused class-major loss
        assert l2 == pytest.approx(l1, rel=1e-5)
        assert g2 == pytest.approx(g1, rel=1e-3)

    def test_fused_argmax_matches(self):
        from unet_medical_image_contour_segmentation_tpu.engine.evaluate import make_eval_step

        rng = np.random.default_rng(22)
        x = jnp.asarray(rng.random((2, 64, 64, 1), np.float32))
        m_nhwc = unet_s(1, 3, layout="nhwc")
        m_s2d = unet_s(1, 3, layout="s2d")
        params, state = m_nhwc.init(jax.random.PRNGKey(6))
        p1 = make_eval_step(m_nhwc, 3)(params, state, x)
        p2 = make_eval_step(m_s2d, 3)(params, state, x)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


class TestPallasConv:
    """Interpret-mode exactness of the Pallas im2col kernel (CPU)."""

    @pytest.mark.parametrize("cin,cout", [(16, 16), (32, 16), (8, 4)])
    def test_forward_exact(self, cin, cout):
        from unet_medical_image_contour_segmentation_tpu.ops.pallas_conv import (
            conv_s2d_b4_im2col,
        )

        rng = np.random.default_rng(30)
        x = jnp.asarray(rng.standard_normal((2, 24, 24, cin)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32)) * 0.1
        want = conv2d(x, w, padding=1)
        got = S.d2s(conv_s2d_b4_im2col(S.s2d(x, 4), w), 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_gradients_exact(self):
        from unet_medical_image_contour_segmentation_tpu.ops.pallas_conv import (
            conv_s2d_b4_im2col,
        )
        from unet_medical_image_contour_segmentation_tpu.ops.s2d import conv_s2d_xla

        rng = np.random.default_rng(31)
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 16)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, 16, 8)).astype(np.float32)) * 0.1

        def f_ref(x_, w_):
            return jnp.sum(jnp.sin(conv_s2d_xla(S.s2d(x_, 4), w_, 4)))

        def f_pal(x_, w_):
            return jnp.sum(jnp.sin(conv_s2d_b4_im2col(S.s2d(x_, 4), w_)))

        g1 = jax.grad(f_ref, argnums=(0, 1))(x, w)
        g2 = jax.grad(f_pal, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                                   rtol=1e-4, atol=2e-4)

    def test_dispatch_in_conv_s2d(self, monkeypatch):
        """Opt-in Pallas dispatch matches the default XLA path."""
        rng = np.random.default_rng(32)
        x = jnp.asarray(rng.standard_normal((1, 16, 16, 256)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, 16, 16)).astype(np.float32)) * 0.1
        want = S.conv_s2d(x, w, 4)
        monkeypatch.setenv("UMICS_PALLAS", "1")
        got = S.conv_s2d(x, w, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


class TestUNetPlusPlusS2d:
    @pytest.mark.parametrize("train", [True, False])
    def test_matches_nhwc(self, train):
        from unet_medical_image_contour_segmentation_tpu.models.unet_nested import unet_pp_s

        nhwc = unet_pp_s(1, 3, layout="nhwc")
        s2d_m = unet_pp_s(1, 3, layout="s2d")
        params, state = nhwc.init(jax.random.PRNGKey(8))
        x = jnp.asarray(_rand(1, 64, 64, 1, seed=40))
        want, ws = nhwc.apply(params, state, x, train=train)
        got, gs = s2d_m.apply(params, state, x, train=train)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)
        for a, b in zip(jax.tree.leaves(ws), jax.tree.leaves(gs)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    def test_fused_interface(self):
        from unet_medical_image_contour_segmentation_tpu.losses.s2d_fused import (
            argmax_class_major,
        )
        from unet_medical_image_contour_segmentation_tpu.models.unet_nested import unet_pp_s
        from unet_medical_image_contour_segmentation_tpu.ops.s2d import d2s_int

        model = unet_pp_s(1, 3, layout="s2d")  # auto now prefers wide
        params, state = model.init(jax.random.PRNGKey(9))
        x = jnp.asarray(_rand(1, 64, 64, 1, seed=41))
        assert model.supports_fused(x.shape)
        logits_cm, _, (kind, b0) = model.apply_fused(params, state, x, train=False)
        assert kind == "s2d"
        pred = d2s_int(argmax_class_major(logits_cm, 3), b0)
        logits, _ = model.apply(params, state, x, train=False)
        np.testing.assert_array_equal(
            np.asarray(pred), np.asarray(jnp.argmax(logits, axis=-1))
        )


class TestBNFolding:
    def test_folded_eval_matches_live(self):
        from unet_medical_image_contour_segmentation_tpu.models.fold_bn import (
            fold_unet_params,
        )

        model = unet_s(1, 3, layout="s2d")
        params, state = model.init(jax.random.PRNGKey(10))
        # non-trivial BN stats
        state = jax.tree.map(
            lambda a: a + 0.1 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape) / a.size,
            state,
        )
        x = jnp.asarray(_rand(2, 64, 64, 1, seed=50))

        want, _ = model.apply(params, state, x, train=False)
        folded = fold_unet_params(params, state)
        logits_cm, _, (kind, b0) = model.apply_fused(folded, None, x, train=False)
        assert kind == "s2d"
        # convert class-major s2d lanes back for comparison
        g = b0 * b0
        got = logits_cm.reshape(*logits_cm.shape[:-1], 3, g)
        got = jnp.moveaxis(got, -2, -1).reshape(*logits_cm.shape[:-1], g * 3)
        got = S.d2s(got, b0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_predictor_folded_matches_unfolded(self):
        from unet_medical_image_contour_segmentation_tpu.engine.predict import Predictor

        model = unet_s(1, 3)
        params, state = model.init(jax.random.PRNGKey(11))
        x = _rand(2, 64, 64, 1, seed=51)
        p1 = Predictor(model, params, state, fold_bn=False).predict_array(x)
        p2 = Predictor(model, params, state, fold_bn=True).predict_array(x)
        np.testing.assert_array_equal(p1, p2)


class TestS2dFuzz:
    """Randomized shape sweep: s2d conv must equal NHWC conv everywhere."""

    @pytest.mark.parametrize("seed", range(6))
    def test_random_shapes(self, seed):
        rng = np.random.default_rng(100 + seed)
        b = int(rng.choice([2, 4]))
        k = int(rng.choice([3, 7]))
        cin = int(rng.choice([1, 3, 8, 16, 24]))
        cout = int(rng.choice([1, 4, 16]))
        gh, gw = rng.integers(2, 7, 2)
        h, w = int(gh * b), int(gw * b)
        x = jnp.asarray(rng.standard_normal((2, h, w, cin)).astype(np.float32))
        wgt = jnp.asarray(rng.standard_normal((k, k, cin, cout)).astype(np.float32)) * 0.1
        want = conv2d(x, wgt, padding=k // 2)
        got = S.d2s(S.conv_s2d(S.s2d(x, b), wgt, b), b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)
