"""Packaging, compilation-cache, metric-backend, and disk-cache tests
(round-4 framework-hygiene items: VERDICT.md r3 §missing 1-3, §next 4-7)."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


# -- pyproject / console entry points -----------------------------------------

def test_pyproject_parses_and_scripts_resolve():
    import tomllib

    data = tomllib.loads((REPO / "pyproject.toml").read_text())
    scripts = data["project"]["scripts"]
    assert set(scripts) == {
        "umics-train", "umics-predict", "umics-seg-main", "umics-export",
    }
    import importlib

    for target in scripts.values():
        mod_name, _, fn_name = target.partition(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, fn_name)), target


def test_root_wrappers_delegate_to_package():
    """`python train.py --help` etc. keep working like the reference's
    top-level scripts after the cli/ move."""
    for script in ("train.py", "predict.py", "seg_main.py", "export_model.py"):
        r = subprocess.run(
            [sys.executable, str(REPO / script), "--help"],
            capture_output=True, text=True, timeout=120, cwd=REPO,
            env=dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=str(REPO)),
        )
        assert r.returncode == 0, (script, r.stderr[-1500:])
        assert "usage" in r.stdout.lower()


@pytest.mark.slow
def test_wheel_builds():
    """The project builds a wheel offline (pip install -e . equivalent)."""
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        r = subprocess.run(
            [sys.executable, "-m", "pip", "wheel", "--no-deps",
             "--no-build-isolation", "-w", td, str(REPO)],
            capture_output=True, text=True, timeout=600,
        )
        if r.returncode != 0 and "No module named" in r.stderr:
            pytest.skip("setuptools/wheel tooling unavailable in this image")
        assert r.returncode == 0, r.stderr[-2000:]
        wheels = [f for f in os.listdir(td) if f.endswith(".whl")]
        assert len(wheels) == 1, wheels


# -- persistent compilation cache ----------------------------------------------

def test_compilation_cache_populates(tmp_path, monkeypatch):
    """enable_compilation_cache points JAX at the dir and entries appear.

    Runs in a subprocess: the cache config must be applied before the dirs
    are baked into this process's already-initialized backend state.
    """
    code = f"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {str(REPO)!r})
from unet_medical_image_contour_segmentation_tpu.utils.compile_cache import (
    enable_compilation_cache,
)
path = enable_compilation_cache({str(tmp_path / "xla")!r})
assert path == {str(tmp_path / "xla")!r}, path
import jax.numpy as jnp
x = jax.jit(lambda a: a * 2 + 1)(jnp.arange(128.0))
x.block_until_ready()
entries = os.listdir(path)
assert entries, "cache directory stayed empty"
print("CACHED", len(entries))
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "CACHED" in r.stdout


def test_compilation_cache_disable_env(monkeypatch, tmp_path):
    from unet_medical_image_contour_segmentation_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    monkeypatch.setenv("UMICS_COMPILE_CACHE", "0")
    assert enable_compilation_cache(str(tmp_path / "never")) is None
    assert not (tmp_path / "never").exists()


# -- pluggable metric backend ----------------------------------------------------

def test_metric_logger_backend(tmp_path):
    from unet_medical_image_contour_segmentation_tpu.utils.metrics import MetricLogger

    seen = []
    mlog = MetricLogger(str(tmp_path / "m.jsonl"),
                        backends=[lambda kind, rec: seen.append((kind, rec))])
    mlog.log("train_step", step=1, loss=0.5)
    mlog.log("val", dice=0.9)
    mlog.close()
    assert [k for k, _ in seen] == ["train_step", "val"]
    assert seen[0][1]["loss"] == 0.5 and seen[1][1]["dice"] == 0.9
    # the JSONL file carries the same records
    import json

    lines = [json.loads(l) for l in (tmp_path / "m.jsonl").read_text().splitlines()]
    assert [l["kind"] for l in lines] == ["train_step", "val"]


def test_metric_logger_backend_failure_is_survivable(tmp_path):
    from unet_medical_image_contour_segmentation_tpu.utils.metrics import MetricLogger

    def boom(kind, rec):
        raise RuntimeError("tracker outage")

    ok = []
    mlog = MetricLogger(backends=[boom, lambda k, r: ok.append(k)])
    mlog.log("train_step", loss=1.0)  # must not raise
    assert ok == ["train_step"]


def test_metric_logger_backend_without_file():
    """Backends fire even when no JSONL path is configured."""
    from unet_medical_image_contour_segmentation_tpu.utils.metrics import MetricLogger

    seen = []
    mlog = MetricLogger(backends=[lambda k, r: seen.append(r)])
    mlog.log("epoch", n=3)
    assert seen and seen[0]["n"] == 3.0


# -- on-disk decoded-sample cache -------------------------------------------------

@pytest.fixture()
def tiny_dataset_dirs(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    (tmp_path / "imgs").mkdir()
    (tmp_path / "masks").mkdir()
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (40, 48), dtype=np.uint8)).save(
            tmp_path / "imgs" / f"a{i}.png")
        mask = rng.choice([0, 128, 255], (40, 48)).astype(np.uint8)
        Image.fromarray(mask).save(tmp_path / "masks" / f"a{i}_mask.png")
    return tmp_path / "imgs", tmp_path / "masks"


def test_disk_cache_exact_pixels(tiny_dataset_dirs, tmp_path):
    from unet_medical_image_contour_segmentation_tpu.data.dataset import BasicDataset

    imgs, masks = tiny_dataset_dirs
    plain = BasicDataset(imgs, masks, scale=0.5)
    cached = BasicDataset(imgs, masks, scale=0.5,
                          disk_cache_dir=tmp_path / "dcache")
    for idx in range(len(plain)):
        want = plain[idx]
        got_cold = cached[idx]   # decode + write cache
        np.testing.assert_array_equal(got_cold["image"], want["image"])
        np.testing.assert_array_equal(got_cold["mask"], want["mask"])
    assert list((tmp_path / "dcache").glob("*.npz"))
    # a second dataset instance (fresh process analogue) hits the disk cache
    warm = BasicDataset(imgs, masks, scale=0.5,
                        disk_cache_dir=tmp_path / "dcache")
    for idx in range(len(plain)):
        want = plain[idx]
        got = warm[idx]
        np.testing.assert_array_equal(got["image"], want["image"])
        np.testing.assert_array_equal(got["mask"], want["mask"])


def test_disk_cache_invalidated_by_mtime(tiny_dataset_dirs, tmp_path):
    from PIL import Image

    from unet_medical_image_contour_segmentation_tpu.data.dataset import BasicDataset

    imgs, masks = tiny_dataset_dirs
    ds = BasicDataset(imgs, masks, scale=1.0, augment=False,
                      disk_cache_dir=tmp_path / "dcache")
    idx = ds.ids.index("a0")  # listdir order is arbitrary
    _ = ds[idx]  # populate
    assert (tmp_path / "dcache" / "a0.r0.s1.npz").exists()
    # rewrite the source image with different pixels and a bumped mtime
    target = sorted(imgs.glob("a0.*"))[0]
    arr = np.zeros((40, 48), np.uint8)
    Image.fromarray(arr).save(target)
    os.utime(target, (os.path.getatime(target), os.path.getmtime(target) + 5))
    fresh = ds[idx]
    assert float(fresh["image"].max()) == 0.0  # stale entry was NOT served


def test_disk_cache_distinguishes_rotations_and_scale(tiny_dataset_dirs, tmp_path):
    from unet_medical_image_contour_segmentation_tpu.data.dataset import BasicDataset

    imgs, masks = tiny_dataset_dirs
    ds = BasicDataset(imgs, masks, scale=0.5, augment=True,
                      disk_cache_dir=tmp_path / "dcache")
    base = ds.ids.index("a0") * 4
    s0, s1 = ds[base], ds[base + 1]  # rotation 0 vs 90: shapes differ (expand)
    assert s0["image"].shape != s1["image"].shape
    files = sorted(p.name for p in (tmp_path / "dcache").glob("*.npz"))
    assert "a0.r0.s0.5.npz" in files and "a0.r1.s0.5.npz" in files
