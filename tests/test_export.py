"""StableHLO export tests: roundtrip, dynamic shapes, value parity."""

import numpy as np

import jax
import jax.numpy as jnp

from unet_medical_image_contour_segmentation_tpu.engine.export import (
    export_stablehlo, load_exported, sanity_check,
)
from unet_medical_image_contour_segmentation_tpu.models.unet import unet_t


def _model():
    model = unet_t(1, 3, bilinear=False)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    return model, params, bn_state


def test_static_export_roundtrip():
    model, params, bn_state = _model()
    data = export_stablehlo(model, params, bn_state, example_hw=(64, 64),
                            dynamic_batch=False, dynamic_hw=False,
                            platforms=("cpu",))
    assert isinstance(data, bytes) and len(data) > 1000
    assert sanity_check(data, model, params, bn_state, hw=(64, 64))


def test_dynamic_batch_and_hw_export():
    model, params, bn_state = _model()
    data = export_stablehlo(model, params, bn_state, platforms=("cpu",))
    exported = load_exported(data)
    for shape in [(1, 64, 64, 1), (3, 96, 128, 1)]:
        x = np.random.default_rng(1).random(shape, np.float32)
        got = exported.call(jnp.asarray(x))
        want, _ = model.apply(params, bn_state, jnp.asarray(x), train=False)
        assert got.shape == (*shape[:3], 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-3, atol=1e-4)


def test_bilinear_exports_dynamic_hw():
    model = unet_t(1, 3, bilinear=True)
    params, bn_state = model.init(jax.random.PRNGKey(2))
    data = export_stablehlo(model, params, bn_state, platforms=("cpu",))
    exported = load_exported(data)
    for shape in [(2, 64, 64, 1), (1, 96, 128, 1)]:
        x = np.random.default_rng(3).random(shape, np.float32)
        got = exported.call(jnp.asarray(x))
        want, _ = model.apply(params, bn_state, jnp.asarray(x), train=False)
        assert got.shape == (*shape[:3], 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-3, atol=1e-4)


def test_stablehlo_predictor_matches_live():
    from unet_medical_image_contour_segmentation_tpu.engine.predict import (
        Predictor, StableHLOPredictor,
    )

    model, params, bn_state = _model()
    data = export_stablehlo(model, params, bn_state, platforms=("cpu",))
    live = Predictor(model, params, bn_state)
    hlo = StableHLOPredictor(data)
    x = np.random.default_rng(4).random((2, 64, 64, 1), np.float32)
    np.testing.assert_array_equal(
        hlo.predict_array(x, out_hw=(100, 60)),
        live.predict_array(x, out_hw=(100, 60)),
    )


def test_stablehlo_predictor_tiled_matches_dense():
    """The exported-module tiled path == its own dense forward.

    unet_t's receptive field fits in halo 48; tile 64 + 2*48 = 160 satisfies
    the exported module's H/W divisibility (16)."""
    from unet_medical_image_contour_segmentation_tpu.engine.predict import (
        StableHLOPredictor,
    )

    model, params, bn_state = _model()
    data = export_stablehlo(model, params, bn_state, platforms=("cpu",))
    dense = StableHLOPredictor(data)  # default threshold: no tiling at 128²
    tiled = StableHLOPredictor(data, tile=64, tile_halo=48, tile_threshold=1)
    x = np.random.default_rng(6).random((1, 128, 128, 1), np.float32)
    np.testing.assert_array_equal(tiled.predict_array(x),
                                  dense.predict_array(x))


def test_zoo_dynamic_export():
    """UNet++ and YOLOv8-seg export with their own H/W divisors (16 / 32)."""
    from unet_medical_image_contour_segmentation_tpu.models.unet_nested import unet_pp_s
    from unet_medical_image_contour_segmentation_tpu.models.yolov8_seg import yolov8_seg_s

    for model, shapes in [
        (unet_pp_s(1, 3), [(1, 64, 64, 1), (2, 96, 128, 1)]),
        (yolov8_seg_s(1, 3), [(1, 64, 64, 1), (2, 96, 128, 1)]),
    ]:
        params, bn_state = model.init(jax.random.PRNGKey(4))
        data = export_stablehlo(model, params, bn_state, platforms=("cpu",))
        exported = load_exported(data)
        for shape in shapes:
            x = np.random.default_rng(5).random(shape, np.float32)
            got = exported.call(jnp.asarray(x))
            want, _ = model.apply(params, bn_state, jnp.asarray(x), train=False)
            assert got.shape == (*shape[:3], 3)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-3, atol=1e-4)


def test_int8_export_matches_live_int8():
    """Exported int8 program == the live int8 forward, logits bit-equal.

    Covers the UNet family and YOLOv8Seg walkers; dynamic batch (1 and 3)
    through the same artifact.  VERDICT r4 #3: the int8 serving win must be
    carriable by the deployment format."""
    from unet_medical_image_contour_segmentation_tpu.engine.export import (
        export_stablehlo_int8,
    )
    from unet_medical_image_contour_segmentation_tpu.models.quantize import (
        apply_wide_int8, fold_for_quantize, quantize_unet,
    )
    from unet_medical_image_contour_segmentation_tpu.models.unet import get_model

    rng = np.random.default_rng(7)
    for name in ("unet_t", "yolov8_seg_s"):
        model = get_model(name, n_channels=1, n_classes=3)
        params, bn_state = model.init(jax.random.PRNGKey(8))
        folded = fold_for_quantize(model, params, bn_state)
        calib = jnp.asarray(rng.random((2, 64, 64), np.float32))
        qparams = quantize_unet(model, folded, calib)
        data = export_stablehlo_int8(model, qparams, example_hw=(64, 64),
                                     platforms=("cpu",))
        exported = load_exported(data)
        for b in (1, 3):
            x = jnp.asarray(rng.random((b, 64, 64, 1), np.float32))
            got = np.asarray(exported.call(x))
            want, _ = apply_wide_int8(model, qparams, x)
            np.testing.assert_array_equal(got, np.asarray(want))


def test_int8_export_serves_via_stablehlo_predictor():
    """An int8 artifact loads and serves through StableHLOPredictor with no
    special flags, matching the live Predictor(quantize=True) argmax."""
    from unet_medical_image_contour_segmentation_tpu.engine.export import (
        export_stablehlo_int8,
    )
    from unet_medical_image_contour_segmentation_tpu.engine.predict import (
        Predictor, StableHLOPredictor,
    )
    from unet_medical_image_contour_segmentation_tpu.models.quantize import (
        fold_for_quantize, quantize_unet,
    )

    model, params, bn_state = _model()
    rng = np.random.default_rng(9)
    calib = rng.random((2, 64, 64), np.float32)
    folded = fold_for_quantize(model, params, bn_state)
    qparams = quantize_unet(model, folded, jnp.asarray(calib))
    data = export_stablehlo_int8(model, qparams, example_hw=(64, 64),
                                 platforms=("cpu",))
    live = Predictor(model, params, bn_state, quantize=True)
    live.calibrate(calib)
    hlo = StableHLOPredictor(data)
    x = rng.random((2, 64, 64, 1), np.float32)
    np.testing.assert_array_equal(hlo.predict_array(x),
                                  live.predict_array(x))
