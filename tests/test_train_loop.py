"""End-to-end train_model loop tests on a tiny synthetic on-disk dataset."""

import os

import numpy as np
import pytest
from PIL import Image

import jax

from unet_medical_image_contour_segmentation_tpu.config import TrainConfig
from unet_medical_image_contour_segmentation_tpu.engine.train import train_model


@pytest.fixture
def data_root(tmp_path):
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        (tmp_path / "imgs" / split).mkdir(parents=True)
        (tmp_path / "masks" / split).mkdir(parents=True)
        for i in range(2):
            img = rng.integers(0, 255, (64, 64), dtype=np.uint8)
            mask = rng.choice([0, 128, 255], (64, 64)).astype(np.uint8)
            Image.fromarray(img).save(tmp_path / "imgs" / split / f"case{i}.png")
            Image.fromarray(mask).save(tmp_path / "masks" / split / f"case{i}_mask.png")
    return tmp_path


def _cfg(data_root, tmp_path, **kw):
    defaults = dict(
        model="unet_t",
        data_root=str(data_root),
        scale=0.5,  # 64 -> 32 px
        epochs=2,
        batch_size=2,
        learning_rate=1e-4,
        amp=False,
        num_workers=2,
        dir_checkpoint=str(tmp_path / "ckpts"),
        predictions_dir=str(tmp_path / "preds"),
        checkpoint_every=1,
        checkpoint_after_frac=0.4,
        log_every=0,
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def test_train_model_end_to_end(data_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = _cfg(data_root, tmp_path)
    state = train_model(cfg)
    assert int(state.step) == 2 * ((2 * 4) // 2)  # 2 epochs x (2 imgs x 4 aug / b2)
    # checkpoint cadence: epochs > 0.8 and % 1 == 0 -> epoch 2 saved
    assert os.path.exists(tmp_path / "ckpts" / "checkpoint_epoch2.npz")
    assert os.path.exists(tmp_path / "model_epoch2.npz")
    # per-epoch prediction dumps (original + postprocessed)
    preds = os.listdir(tmp_path / "preds" / "epoch_1")
    assert any(p.endswith(".png") for p in preds)
    assert os.path.isdir(tmp_path / "preds" / "epoch_1" / "postprocessed")


def test_train_model_data_parallel(data_root, tmp_path, monkeypatch):
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 virtual devices")
    monkeypatch.chdir(tmp_path)
    cfg = _cfg(data_root, tmp_path, num_devices=2, epochs=1,
               save_val_predictions=False, save_checkpoint=False)
    state = train_model(cfg)
    assert int(state.step) == 4  # 8 samples / batch 2, one epoch


def test_train_model_dp_spatial(data_root, tmp_path, monkeypatch):
    """--spatial-shards: 2-D (data, spatial) GSPMD mesh end-to-end."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    monkeypatch.chdir(tmp_path)
    cfg = _cfg(data_root, tmp_path, num_devices=4, spatial_shards=2, epochs=1,
               save_val_predictions=False, save_checkpoint=False)
    state = train_model(cfg)
    assert int(state.step) == 4  # 8 samples / batch 2, one epoch


def test_train_model_resume_from_pth(data_root, tmp_path, monkeypatch, reference_path):
    """--load compat: resume from a reference-format .pth checkpoint."""
    import jax.numpy as jnp
    import torch

    from unet_medical_image_contour_segmentation_tpu.engine.checkpoint import load_weights
    from unet_medical_image_contour_segmentation_tpu.engine.optim import init_rmsprop
    from unet_medical_image_contour_segmentation_tpu.engine.train import TrainState
    from unet.unet_model import UNet_T

    monkeypatch.chdir(tmp_path)
    torch.manual_seed(0)
    sd = UNet_T(1, 3, False).state_dict()
    sd["mask_values"] = [0, 128, 255]
    torch.save(sd, tmp_path / "ref.pth")

    params, bn_state, mv = load_weights(str(tmp_path / "ref.pth"))
    assert mv == [0, 128, 255]
    params = jax.tree.map(jnp.asarray, params)
    state = TrainState(params, jax.tree.map(jnp.asarray, bn_state),
                       init_rmsprop(params), jnp.zeros((), jnp.int32))
    cfg = _cfg(data_root, tmp_path, epochs=1, save_val_predictions=False,
               save_checkpoint=False)
    out = train_model(cfg, state=state)
    assert int(out.step) == 4


def test_train_model_binary_path(data_root, tmp_path, monkeypatch):
    """n_classes=1: BCE+dice+boundary loss and the binary evaluate path."""
    monkeypatch.chdir(tmp_path)
    cfg = _cfg(data_root, tmp_path, classes=1, epochs=1,
               boundary_edge_width=8, save_checkpoint=False)
    state = train_model(cfg)
    assert int(state.step) == 4
    # binary prediction dumps exist ({0,255} value map)
    preds = [p for p in (tmp_path / "preds" / "epoch_1").iterdir() if p.suffix == ".png"]
    assert preds


def test_train_model_bilinear(data_root, tmp_path, monkeypatch):
    """bilinear=True exercises the align_corners=True upsample (NHWC path)."""
    monkeypatch.chdir(tmp_path)
    cfg = _cfg(data_root, tmp_path, bilinear=True, epochs=1,
               save_val_predictions=False, save_checkpoint=False)
    state = train_model(cfg)
    assert int(state.step) == 4


def test_train_model_batched_fetch_matches_per_step(data_root, tmp_path,
                                                    monkeypatch):
    """nan_check_every>1 drains metric fetches in windows but must produce
    the identical training trajectory and per-step metric log."""
    import json

    monkeypatch.chdir(tmp_path)
    params = {}
    for k, tag in ((1, "k1"), (3, "k3")):
        cfg = _cfg(data_root, tmp_path, nan_check_every=k, epochs=1,
                   save_val_predictions=False, save_checkpoint=False,
                   metrics_path=str(tmp_path / f"metrics_{tag}.jsonl"))
        params[tag] = train_model(cfg).params
    for a, b in zip(jax.tree.leaves(params["k1"]), jax.tree.leaves(params["k3"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # every step logged exactly once, in order, with equal losses
    logs = {}
    for tag in ("k1", "k3"):
        with open(tmp_path / f"metrics_{tag}.jsonl") as f:
            rows = [json.loads(ln) for ln in f]
        logs[tag] = [(r["step"], round(float(r["loss"]), 6))
                     for r in rows if r.get("kind") == "train_step"]
    assert logs["k1"] == logs["k3"] and len(logs["k1"]) == 4


def test_train_model_nan_aborts(data_root, tmp_path, monkeypatch):
    """A NaN loss aborts the loop within nan_check_every+1 steps."""
    monkeypatch.chdir(tmp_path)
    cfg = _cfg(data_root, tmp_path, learning_rate=float("nan"), epochs=1,
               nan_check_every=2, save_val_predictions=False,
               save_checkpoint=False)
    with pytest.raises(RuntimeError, match="NaN"):
        train_model(cfg)


def test_sharded_evaluate_matches_single_device(data_root, tmp_path):
    """evaluate() with a batch sharding + ragged padding == unsharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from unet_medical_image_contour_segmentation_tpu.data.dataset import BasicDataset
    from unet_medical_image_contour_segmentation_tpu.data.loader import DataLoader
    from unet_medical_image_contour_segmentation_tpu.engine.evaluate import evaluate
    from unet_medical_image_contour_segmentation_tpu.engine.train import init_train_state
    from unet_medical_image_contour_segmentation_tpu.models.unet import unet_t
    from unet_medical_image_contour_segmentation_tpu.parallel import make_data_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    model = unet_t(1, 3)
    state = init_train_state(model, jax.random.PRNGKey(5))
    ds = BasicDataset(data_root / "imgs" / "val", data_root / "masks" / "val",
                      scale=0.5)
    # batch 3 over 8 samples: ragged batches of 3/3/2, each padded to 4
    def loader():
        return DataLoader(ds, batch_size=3, shuffle=False)

    plain = evaluate(model, state.params, state.bn_state, loader(),
                     postprocess=False)
    mesh = make_data_mesh(4)
    sharded = evaluate(model, state.params, state.bn_state, loader(),
                       postprocess=False,
                       batch_sharding=NamedSharding(mesh, P("data")),
                       batch_pad=4)
    assert plain == sharded
