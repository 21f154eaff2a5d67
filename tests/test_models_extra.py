"""UNet++ and spatial-parallel tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_medical_image_contour_segmentation_tpu.models.unet import get_model, unet_t
from unet_medical_image_contour_segmentation_tpu.models.unet_nested import (
    UNetPlusPlus, unet_pp_s,
)


class TestUNetPlusPlus:
    @pytest.mark.parametrize("bilinear", [False, True])
    def test_forward_shapes(self, bilinear):
        model = unet_pp_s(1, 1, bilinear=bilinear).with_options(widths=(8, 16, 32))
        params, state = model.init(jax.random.PRNGKey(0))
        x = jnp.zeros((2, 32, 32, 1))
        logits, new_state = model.apply(params, state, x, train=True)
        assert logits.shape == (2, 32, 32, 1)
        assert set(new_state) == set(state)

    def test_deep_supervision(self):
        model = UNetPlusPlus(1, 3, widths=(8, 16, 32), deep_supervision=True)
        params, state = model.init(jax.random.PRNGKey(1))
        x = jnp.zeros((1, 32, 32, 1))
        logits, _ = model.apply(params, state, x, train=False)
        assert logits.shape == (1, 32, 32, 3)

    def test_registry(self):
        m = get_model("unet_pp_s", n_channels=1, n_classes=1)
        assert m.name == "unet_pp_s" and m.widths[0] == 16
        m = get_model("unet_pp", n_channels=1, n_classes=1)
        assert m.widths[0] == 64

    def test_trains(self):
        from unet_medical_image_contour_segmentation_tpu.engine.optim import RMSpropConfig
        from unet_medical_image_contour_segmentation_tpu.engine.train import (
            init_train_state, make_train_step,
        )
        from unet_medical_image_contour_segmentation_tpu.losses.compound import LossConfig

        model = unet_pp_s(1, 1).with_options(widths=(8, 16, 32))
        state = init_train_state(model, jax.random.PRNGKey(2))
        step = jax.jit(make_train_step(
            model, LossConfig(n_classes=1, boundary_edge_width=8),
            RMSpropConfig(learning_rate=1e-3),
        ))
        rng = np.random.default_rng(0)
        batch = {
            "image": rng.random((2, 32, 32, 1), np.float32),
            "mask": rng.integers(0, 3, (2, 32, 32)).astype(np.int32),
        }
        losses = []
        for _ in range(4):
            state, m = step(state, batch, 1e-3)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestSpatialParallel:
    def test_gspmd_spatial_forward_matches_unsharded(self):
        from unet_medical_image_contour_segmentation_tpu.parallel import (
            make_spatial_forward, make_spatial_mesh,
        )

        if len(jax.devices()) < 4:
            pytest.skip("needs >=4 virtual devices")
        mesh = make_spatial_mesh(4)
        model = unet_t(1, 3)
        params, bn_state = model.init(jax.random.PRNGKey(0))
        image = np.random.default_rng(0).random((1, 128, 128, 1), np.float32)

        fwd = make_spatial_forward(model, mesh)
        got = fwd(params, bn_state, jnp.asarray(image))
        want, _ = model.apply(params, bn_state, jnp.asarray(image), train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_tiled_inference_matches_full_on_interior(self):
        from unet_medical_image_contour_segmentation_tpu.parallel import tiled_inference

        model = unet_t(1, 3)
        params, bn_state = model.init(jax.random.PRNGKey(1))
        rng = np.random.default_rng(2)
        # smooth image so class boundaries are not knife-edge everywhere
        base = rng.random((1, 24, 24, 1), np.float32)
        image = jnp.asarray(np.kron(base, np.ones((1, 8, 8, 1), np.float32)))  # 192x192

        tiled = tiled_inference(model, params, bn_state, image, tile=64, halo=48)
        logits, _ = model.apply(params, bn_state, image, train=False)
        full = jnp.argmax(logits, axis=-1)
        agree = float(jnp.mean((tiled == full).astype(jnp.float32)))
        assert tiled.shape == full.shape
        assert agree > 0.99, f"tiled/full agreement {agree}"


    def test_gspmd_spatial_train_step_matches_single_device(self):
        from unet_medical_image_contour_segmentation_tpu.engine.optim import RMSpropConfig
        from unet_medical_image_contour_segmentation_tpu.engine.train import (
            init_train_state, make_train_step,
        )
        from unet_medical_image_contour_segmentation_tpu.losses.compound import LossConfig
        from unet_medical_image_contour_segmentation_tpu.parallel import (
            make_spatial_mesh, make_spatial_train_step,
        )

        if len(jax.devices()) < 4:
            pytest.skip("needs >=4 virtual devices")
        model = unet_t(1, 3)
        loss_cfg = LossConfig(n_classes=3, boundary_edge_width=8)
        opt_cfg = RMSpropConfig(learning_rate=1e-3)
        state = init_train_state(model, jax.random.PRNGKey(0), opt_cfg)
        rng = np.random.default_rng(0)
        batch = {
            "image": jnp.asarray(rng.random((2, 64, 64, 1), np.float32)),
            "mask": jnp.asarray(rng.integers(0, 3, (2, 64, 64)).astype(np.int32)),
        }

        ref_step = jax.jit(make_train_step(model, loss_cfg, opt_cfg, 1.0))
        ref_state, ref_m = ref_step(state, batch, 1e-3)

        mesh = make_spatial_mesh(4)
        sp_step = make_spatial_train_step(model, loss_cfg, opt_cfg, mesh, 1.0)
        sp_state, sp_m = sp_step(state, batch, 1e-3)

        np.testing.assert_allclose(float(sp_m["loss"]), float(ref_m["loss"]),
                                   rtol=1e-5, atol=1e-6)
        # RMSprop's 1/sqrt(v) amplifies reduction-order noise at step 1,
        # so params get an absolute tolerance above the ~6e-5 observed drift.
        for a, b in zip(jax.tree_util.tree_leaves(sp_state.params),
                        jax.tree_util.tree_leaves(ref_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=2e-4)
        for a, b in zip(jax.tree_util.tree_leaves(sp_state.bn_state),
                        jax.tree_util.tree_leaves(ref_state.bn_state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_gspmd_dp_spatial_2d_mesh_train_step(self):
        from unet_medical_image_contour_segmentation_tpu.engine.optim import RMSpropConfig
        from unet_medical_image_contour_segmentation_tpu.engine.train import (
            init_train_state, make_train_step,
        )
        from unet_medical_image_contour_segmentation_tpu.losses.compound import LossConfig
        from unet_medical_image_contour_segmentation_tpu.parallel import (
            make_dp_spatial_mesh, make_spatial_train_step,
        )

        if len(jax.devices()) < 8:
            pytest.skip("needs >=8 virtual devices")
        model = unet_t(1, 3)
        loss_cfg = LossConfig(n_classes=3, boundary_edge_width=8)
        opt_cfg = RMSpropConfig(learning_rate=1e-3)
        state = init_train_state(model, jax.random.PRNGKey(1), opt_cfg)
        rng = np.random.default_rng(1)
        batch = {
            "image": jnp.asarray(rng.random((4, 64, 64, 1), np.float32)),
            "mask": jnp.asarray(rng.integers(0, 3, (4, 64, 64)).astype(np.int32)),
        }

        ref_step = jax.jit(make_train_step(model, loss_cfg, opt_cfg, 1.0))
        ref_state, ref_m = ref_step(state, batch, 1e-3)

        mesh = make_dp_spatial_mesh(4, 2)
        step = make_spatial_train_step(model, loss_cfg, opt_cfg, mesh, 1.0)
        got_state, got_m = step(state, batch, 1e-3)

        np.testing.assert_allclose(float(got_m["loss"]), float(ref_m["loss"]),
                                   rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(got_state.params),
                        jax.tree_util.tree_leaves(ref_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=2e-4)



class TestYOLOv8Seg:
    def test_forward_shapes(self):
        from unet_medical_image_contour_segmentation_tpu.models.yolov8_seg import (
            yolov8_seg_s,
        )

        model = yolov8_seg_s(1, 1, widths=(8, 16, 32, 64, 128), depths=(1, 1, 1, 1))
        params, state = model.init(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 64, 64, 1))
        logits, new_state = model.apply(params, state, x, train=True)
        assert logits.shape == (1, 64, 64, 1)
        assert set(new_state) == set(state)

    def test_registry_and_contract(self):
        m = get_model("yolov8_seg_s", n_channels=1, n_classes=1)
        assert m.n_channels == 1 and m.n_classes == 1
        assert m.widths == (32, 64, 128, 256, 512)

    def test_trains_binary_path(self):
        """The reference's YOLOv8 usage: binary compound loss (train.py:261)."""
        from unet_medical_image_contour_segmentation_tpu.engine.optim import RMSpropConfig
        from unet_medical_image_contour_segmentation_tpu.engine.train import (
            init_train_state, make_train_step,
        )
        from unet_medical_image_contour_segmentation_tpu.losses.compound import LossConfig
        from unet_medical_image_contour_segmentation_tpu.models.yolov8_seg import (
            yolov8_seg_s,
        )

        model = yolov8_seg_s(1, 1, widths=(8, 16, 32, 64, 128), depths=(1, 1, 1, 1))
        state = init_train_state(model, jax.random.PRNGKey(1))
        step = jax.jit(make_train_step(
            model, LossConfig(n_classes=1, boundary_edge_width=8),
            RMSpropConfig(learning_rate=1e-3),
        ))
        rng = np.random.default_rng(1)
        batch = {
            "image": rng.random((2, 64, 64, 1), np.float32),
            "mask": rng.integers(0, 3, (2, 64, 64)).astype(np.int32),
        }
        losses = []
        for _ in range(4):
            state, m = step(state, batch, 1e-3)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestFlopsAccounting:
    """bench.py's MFU fields rely on these counts."""

    def test_hlo_matches_analytic_for_unet(self):
        from unet_medical_image_contour_segmentation_tpu.models.unet import get_model
        from unet_medical_image_contour_segmentation_tpu.utils.flops import (
            hlo_forward_flops, unet_forward_flops,
        )

        m = get_model("unet_s", n_channels=1, n_classes=3)
        analytic = unet_forward_flops(m, 128, 128)
        hlo = hlo_forward_flops(m, 128, 128)
        assert hlo is not None
        # HLO counts convs identically; small delta from elementwise ops and
        # the transpose-conv convention.
        assert abs(hlo - analytic) / analytic < 0.05

    def test_hlo_covers_nested_and_yolo(self):
        from unet_medical_image_contour_segmentation_tpu.models.unet import get_model
        from unet_medical_image_contour_segmentation_tpu.utils.flops import (
            hlo_forward_flops,
        )

        pp = hlo_forward_flops(get_model("unet_pp_s", n_channels=1, n_classes=3),
                               128, 128)
        yolo = hlo_forward_flops(get_model("yolov8_seg_s", n_channels=1,
                                           n_classes=3), 128, 128)
        assert pp is not None and yolo is not None
        # UNet++'s nested skips cost more than double the plain unet_s
        from unet_medical_image_contour_segmentation_tpu.utils.flops import (
            unet_forward_flops,
        )
        us = unet_forward_flops(get_model("unet_s", n_channels=1, n_classes=3),
                                128, 128)
        assert pp > 2 * us
        assert yolo > 0
