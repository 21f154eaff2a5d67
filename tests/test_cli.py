"""Subprocess smoke tests for the shipped CLI entry points."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parent.parent

ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=2",
    PYTHONPATH=str(REPO),
)


def _run(args, cwd):
    return subprocess.run(
        [sys.executable, *args], cwd=cwd, env=ENV,
        capture_output=True, text=True, timeout=1200,
    )


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    """A random-weight UNet_T checkpoint on disk (.npz)."""
    tmp = tmp_path_factory.mktemp("ckpt")
    import jax

    sys.path.insert(0, str(REPO))
    from unet_medical_image_contour_segmentation_tpu.engine.checkpoint import save_checkpoint
    from unet_medical_image_contour_segmentation_tpu.models.unet import unet_t

    model = unet_t(1, 3)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    path = tmp / "model.npz"
    save_checkpoint(str(path), params, bn_state, mask_values=[0, 128, 255])
    return str(path)


def test_predict_cli(tmp_path, checkpoint):
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64), dtype=np.uint8)).save(
            tmp_path / f"img{i}.png"
        )
    r = _run(
        ["predict.py", "-m", checkpoint, "--arch", "unet_t",
         "-i", str(tmp_path), "-o", str(tmp_path / "out")],
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    outs = sorted(os.listdir(tmp_path / "out"))
    assert outs == ["img0.png", "img1.png"]
    vals = set(np.unique(np.asarray(Image.open(tmp_path / "out" / "img0.png"))))
    assert vals <= {0, 128, 255}


def test_train_cli(tmp_path, checkpoint):
    rng = np.random.default_rng(1)
    for split in ("train", "val"):
        (tmp_path / "imgs" / split).mkdir(parents=True)
        (tmp_path / "masks" / split).mkdir(parents=True)
        for i in range(2):
            Image.fromarray(rng.integers(0, 255, (64, 64), dtype=np.uint8)).save(
                tmp_path / "imgs" / split / f"c{i}.png")
            Image.fromarray(rng.choice([0, 128, 255], (64, 64)).astype(np.uint8)).save(
                tmp_path / "masks" / split / f"c{i}_mask.png")
    r = _run(
        [str(REPO / "train.py"), "--model", "unet_t", "--epochs", "1",
         "--batch-size", "2", "--scale", "0.5", "--data-root", str(tmp_path),
         "--load", checkpoint],
        cwd=tmp_path,  # writes model_epoch1.npz and predictions/ here
    )
    assert r.returncode == 0, (r.stderr or "")[-2000:]
    assert (tmp_path / "model_epoch1.npz").exists()


def test_seg_main_cli(tmp_path, checkpoint):
    rng = np.random.default_rng(2)
    raw_dir = tmp_path / "raws"
    raw_dir.mkdir()
    frame = rng.integers(20000, 40000, (96, 128), dtype=np.uint16)
    frame[30:70, 40:100] = 60000
    with open(raw_dir / "scan.raw", "wb") as f:
        f.write(frame.astype("<u2").tobytes())

    r = _run(
        [str(REPO / "seg_main.py"), "--input-raw", str(raw_dir),
         "-o", str(tmp_path / "results"), "--width", "128", "--height", "96",
         "-ww", "30000", "-wl", "35000", "-m", checkpoint,
         "--target-size", "64"],
        cwd=tmp_path,
    )
    # the random-weight model may find no contours in stage 5; stages 1-4
    # must still produce artifacts and the failure must be the documented one
    for stage in ["1_raw_png", "2_normalized_png", "3_pred_masks", "4_denormalized_masks"]:
        assert os.listdir(tmp_path / "results" / stage), f"{stage} empty"
    if r.returncode != 0:
        assert "stage 5" in (r.stderr + r.stdout) or "mask2polygon" in (r.stderr + r.stdout)


def test_export_cli(tmp_path, checkpoint):
    out = tmp_path / "model.stablehlo"
    r = _run(
        [str(REPO / "export_model.py"), "-m", checkpoint, "--arch", "unet_t",
         "-o", str(out)],
        cwd=tmp_path,
    )
    assert r.returncode == 0, (r.stderr or "")[-2000:]
    assert out.exists() and out.stat().st_size > 1000


class TestBenchSweep:
    def test_parse_config(self):
        import importlib.util
        from pathlib import Path

        spec = importlib.util.spec_from_file_location(
            "sweep", Path(__file__).parent.parent / "benchmarks" / "sweep.py"
        )
        sweep = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(sweep)

        name, argv = sweep.parse_config("unet_s")
        assert name == "unet_s" and argv == ["--model", "unet_s"]
        name, argv = sweep.parse_config("unet_s:bilinear")
        assert "--bilinear" in argv
        name, argv = sweep.parse_config("unet_s:hw=1024,batch=2")
        assert argv == ["--model", "unet_s", "--hw", "1024", "--batch", "2"]

    def test_render_table(self):
        import importlib.util
        from pathlib import Path

        spec = importlib.util.spec_from_file_location(
            "sweep", Path(__file__).parent.parent / "benchmarks" / "sweep.py"
        )
        sweep = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(sweep)

        md = sweep.render_table([
            {"config": "unet_s", "value": 440.0, "predict_slices_per_s": 778.0,
             "train_slices_per_s": 307.0, "vs_baseline": 676.0,
             "fwd_gflops_per_slice": 24.13, "train_mfu_pct": 11.3,
             "train_spread_pct": 4.0, "predict_spread_pct": 2.0,
             "predict_int8_slices_per_s": 1000.0},
        ])
        assert ("| unet_s | 440.0 | 778.0 / 307.0 | 1000.0 | ±2% "
                "| 676.0x | 24.13 | 11.3% |") in md
        # int8 column renders an em-dash when bench.py didn't measure it
        md_noq = sweep.render_table([
            {"config": "unet_s", "value": 440.0, "predict_slices_per_s": 778.0,
             "train_slices_per_s": 307.0, "vs_baseline": 676.0,
             "fwd_gflops_per_slice": 24.13, "train_mfu_pct": 11.3,
             "train_spread_pct": 4.0, "predict_spread_pct": 2.0},
        ])
        assert ("| unet_s | 440.0 | 778.0 / 307.0 | — | ±2% "
                "| 676.0x | 24.13 | 11.3% |") in md_noq
        # missing spread fields render as an em-dash, not a crash
        md2 = sweep.render_table([{"config": "x", "value": 1.0}])
        assert "| x | 1.0 " in md2 and "—" in md2

        lat = sweep.render_latency_table({"per_model": {
            "unet_s": {"tpu_ms": 2.55, "spread_pct": 4.0,
                       "ref_comment_ms": 5.0, "torch_cpu_ms": 428.0,
                       "tpu_int8_ms": 2.1},
            "unet_pp_s": {"tpu_ms": 6.1},
        }})
        assert "| unet_s | 2.55 | 2.1 | ±2% | 5.0 | 428.0 | 168x |" in lat
        assert "| unet_pp_s | 6.1 | — | — | — | — | — |" in lat

    def test_compose_table_preserves_sections(self):
        """Sweep rewrites must carry forward whatever this run didn't
        produce: the old latency section and all hand-written sections."""
        import importlib.util
        from pathlib import Path

        spec = importlib.util.spec_from_file_location(
            "sweep", Path(__file__).parent.parent / "benchmarks" / "sweep.py"
        )
        sweep = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(sweep)

        row = {"config": "unet_s", "value": 440.0}
        lat = {"per_model": {"unet_s": {"tpu_ms": 2.55}}}
        old = (sweep.render_table([row])
               + sweep.render_latency_table(lat)
               + "\n" + sweep.HAND_MARK
               + "\n\n## Tiled inference\n\nhand-written probe results\n")

        # rows only (--configs/--quick): old latency + hand sections survive
        out = sweep.compose_table(old, [dict(row, value=500.0)], None)
        assert "| unet_s | 500.0 " in out
        assert "## Single-slice latency" in out and "| 2.55 |" in out
        assert "hand-written probe results" in out

        # latency only (all throughput configs failed): old table survives
        out = sweep.compose_table(
            old, [], {"per_model": {"unet_s": {"tpu_ms": 9.9}}})
        assert "| unet_s | 440.0 " in out
        assert "| 9.9 |" in out and "| 2.55 |" not in out
        assert "hand-written probe results" in out

        # full run: both regenerate, hand sections still survive, once
        out = sweep.compose_table(old, [dict(row, value=500.0)],
                                  {"per_model": {"unet_s": {"tpu_ms": 9.9}}})
        assert "| unet_s | 500.0 " in out and "| 9.9 |" in out
        assert out.count(sweep.HAND_MARK) == 1
        assert "hand-written probe results" in out
        # no previous file at all
        out = sweep.compose_table("", [row], None)
        assert "| unet_s | 440.0 " in out

    def test_compose_table_merges_partial_runs(self):
        """--configs re-benches SOME configs; the others' rows carry
        forward (in their old position) instead of being deleted."""
        import importlib.util
        from pathlib import Path

        spec = importlib.util.spec_from_file_location(
            "sweep", Path(__file__).parent.parent / "benchmarks" / "sweep.py"
        )
        sweep = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(sweep)

        old = sweep.render_table([
            {"config": "unet_t", "value": 1000.0},
            {"config": "unet_s", "value": 580.0},
            {"config": "unet", "value": 123.0},
        ])
        out = sweep.compose_table(
            old, [{"config": "unet_s", "value": 600.0},
                  {"config": "brand_new", "value": 5.0}], None)
        assert "| unet_t | 1000.0 " in out      # carried forward
        assert "| unet | 123.0 " in out         # carried forward
        assert "| unet_s | 600.0 " in out       # updated in place
        assert "| unet_s | 580.0 " not in out
        assert "| brand_new | 5.0 " in out      # appended
        lines = [l for l in out.splitlines() if l.startswith("|")
                 and not l.startswith("|---") and not l.startswith("| config")]
        assert [l.split("|")[1].strip() for l in lines] == [
            "unet_t", "unet_s", "unet", "brand_new"]
        # stale-format old rows (different column count) are dropped, not
        # merged into a ragged table
        stale = old.replace("| unet | 123.0 | — / — | — | — | — | — | — |",
                            "| unet | 123.0 | old |")
        out = sweep.compose_table(stale, [{"config": "unet_s",
                                           "value": 600.0}], None)
        assert "| unet | 123.0 | old |" not in out
