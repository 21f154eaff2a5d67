"""ONNX export: emitted bytes parse back, execute correctly, carry the
reference's deployment contract (opset 11, dynamic batch/H/W, NCHW).

No onnx/onnxruntime in the environment, so validation drives the serialized
artifact through the repo's own parser + torch-backed interpreter
(engine/onnx_export.py) and compares with the live JAX forward — this checks
the protobuf encoding and the graph semantics together.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_medical_image_contour_segmentation_tpu.engine.onnx_export import (
    build_unet_onnx, export_onnx, parse_model, run_with_torch,
)
from unet_medical_image_contour_segmentation_tpu.models.unet import (
    unet_s, unet_sa, unet_t,
)

pytest.importorskip("torch")


def _emit(model, seed=0):
    params, state = model.init(jax.random.PRNGKey(seed))
    data = build_unet_onnx(
        jax.tree.map(np.asarray, params), jax.tree.map(np.asarray, state),
        n_channels=model.n_channels, n_classes=model.n_classes,
    )
    return data, params, state


@pytest.mark.parametrize(
    "model", [unet_t(1, 3), unet_t(1, 3, bilinear=True), unet_sa(1, 2)],
    ids=["convT", "bilinear", "attention"],
)
def test_serialized_graph_matches_jax(model):
    data, params, state = _emit(model)
    x = np.random.default_rng(1).standard_normal((2, 1, 64, 64)).astype(np.float32)
    got = run_with_torch(data, x)
    want, _ = model.apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)),
                          train=False)
    np.testing.assert_allclose(
        got, np.asarray(want).transpose(0, 3, 1, 2), rtol=1e-4, atol=1e-5
    )


def test_model_contract_fields():
    data, _, _ = _emit(unet_t(1, 3))
    m = parse_model(data)
    assert m["opset"] == 11
    assert m["ir_version"] == 6
    assert len(m["input"]) == 1 and len(m["output"]) == 1
    # dynamic dim_params ride in the input ValueInfo bytes
    assert b"batch" in m["input"][0]
    assert b"height" in m["input"][0] and b"width" in m["input"][0]
    assert all(n["op"] for n in m["nodes"])
    # every node input is produced earlier or is an initializer/graph input
    known = set(m["initializers"]) | {"input"}
    for n in m["nodes"]:
        for i in n["input"]:
            assert i in known, f"dangling input {i} of {n['op']}"
        known.update(n["output"])
    assert "output" in known


def test_dynamic_hw_through_interpreter():
    model = unet_t(1, 3)
    data, params, state = _emit(model, seed=3)
    for hw in [(64, 64), (96, 128)]:
        x = np.random.default_rng(2).standard_normal((1, 1, *hw)).astype(np.float32)
        got = run_with_torch(data, x)
        want, _ = model.apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)),
                              train=False)
        np.testing.assert_allclose(
            got, np.asarray(want).transpose(0, 3, 1, 2), rtol=1e-4, atol=1e-5
        )


def test_export_onnx_writes_file(tmp_path):
    model = unet_t(1, 3)
    params, state = model.init(jax.random.PRNGKey(0))
    path = tmp_path / "model.onnx"
    data = export_onnx(model, params, state, str(path))
    assert path.read_bytes() == data and len(data) > 1000


from unet_medical_image_contour_segmentation_tpu.engine.onnx_export import (
    build_unet_pp_onnx, build_yolov8_onnx,
)
from unet_medical_image_contour_segmentation_tpu.models.unet_nested import unet_pp_s
from unet_medical_image_contour_segmentation_tpu.models.yolov8_seg import yolov8_seg_s


@pytest.mark.parametrize(
    "model", [unet_pp_s(1, 3), unet_pp_s(1, 3, bilinear=True),
              unet_pp_s(1, 2, deep_supervision=True)],
    ids=["convT", "bilinear", "deep_supervision"],
)
def test_unet_pp_serialized_graph_matches_jax(model):
    params, state = model.init(jax.random.PRNGKey(5))
    data = build_unet_pp_onnx(
        jax.tree.map(np.asarray, params), jax.tree.map(np.asarray, state),
        n_channels=1, n_classes=model.n_classes, bilinear=model.bilinear,
    )
    x = np.random.default_rng(6).standard_normal((2, 1, 64, 64)).astype(np.float32)
    got = run_with_torch(data, x)
    want, _ = model.apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)),
                          train=False)
    np.testing.assert_allclose(
        got, np.asarray(want).transpose(0, 3, 1, 2), rtol=1e-4, atol=1e-5
    )


def test_yolov8_serialized_graph_matches_jax():
    model = yolov8_seg_s(1, 3)
    params, state = model.init(jax.random.PRNGKey(7))
    data = build_yolov8_onnx(
        jax.tree.map(np.asarray, params), jax.tree.map(np.asarray, state),
        n_channels=1, n_classes=3, depths=model.depths,
    )
    m = parse_model(data)
    assert m["opset"] == 11 and b"batch" in m["input"][0]
    # 96x64: dynamic H/W (multiples of 32) through the serialized graph
    x = np.random.default_rng(8).standard_normal((1, 1, 96, 64)).astype(np.float32)
    got = run_with_torch(data, x)
    want, _ = model.apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)),
                          train=False)
    np.testing.assert_allclose(
        got, np.asarray(want).transpose(0, 3, 1, 2), rtol=1e-4, atol=1e-5
    )
