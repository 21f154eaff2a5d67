"""Edge-case coverage: schedule branches, loader behavior, tool CLIs."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from unet_medical_image_contour_segmentation_tpu.data.loader import DataLoader
from unet_medical_image_contour_segmentation_tpu.engine.optim import warm_restarts_lr
from unet_medical_image_contour_segmentation_tpu.losses.boundary import boundary_loss

REPO = Path(__file__).resolve().parent.parent


class _FakeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((2, 2), i, np.float32)}


class TestLoader:
    def test_drop_last(self):
        dl = DataLoader(_FakeDataset(7), batch_size=2, drop_last=True)
        batches = list(dl)
        assert len(dl) == 3 and len(batches) == 3
        assert all(b["x"].shape[0] == 2 for b in batches)

    def test_keeps_partial_batch(self):
        dl = DataLoader(_FakeDataset(7), batch_size=2, drop_last=False)
        batches = list(dl)
        assert len(batches) == 4 and batches[-1]["x"].shape[0] == 1

    def test_shuffle_deterministic_per_seed(self):
        def order(seed):
            dl = DataLoader(_FakeDataset(8), batch_size=8, shuffle=True, seed=seed)
            return [int(v) for v in next(iter(dl))["x"][:, 0, 0]]

        assert order(1) == order(1)
        assert order(1) != order(2)


class TestScheduleBranches:
    def test_t_mult_1(self):
        torch = pytest.importorskip("torch")

        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.RMSprop([p], lr=1e-3)
        sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
            opt, T_0=3, T_mult=1, eta_min=1e-6
        )
        for t in [0.0, 1.0, 2.5, 3.0, 7.5]:
            sched.step(t)
            got = float(warm_restarts_lr(t, 1e-3, T_0=3, T_mult=1, eta_min=1e-6))
            assert got == pytest.approx(opt.param_groups[0]["lr"], rel=1e-5)


class TestBoundaryEdgeCases:
    def test_edge_width_zero(self, reference_path):
        torch = pytest.importorskip("torch")
        from utils.boundary_loss import boundary_loss as ref_boundary

        pred = np.random.default_rng(0).standard_normal((1, 32, 32)).astype(np.float32) * 20
        target = np.zeros((1, 32, 32), np.float32)
        expect = ref_boundary(torch.from_numpy(pred), torch.from_numpy(target),
                              edge_width=0, edge_weight=5.0).item()
        got = float(boundary_loss(jnp.asarray(pred), jnp.asarray(target),
                                  edge_width=0, edge_weight=5.0))
        assert got == pytest.approx(expect, rel=1e-4, abs=1e-5)

    def test_whole_image_edge(self):
        """edge_width >= H/2: interior empty -> only the edge term contributes."""
        pred = jnp.ones((1, 16, 16)) * 20
        target = jnp.zeros((1, 16, 16))
        out = float(boundary_loss(pred, target, edge_width=8, edge_weight=3.0))
        assert np.isfinite(out)


class TestToolCLIs:
    @pytest.mark.parametrize("module", [
        "unet_medical_image_contour_segmentation_tpu.pipeline.raw2png",
        "unet_medical_image_contour_segmentation_tpu.pipeline.raw_normalize",
        "unet_medical_image_contour_segmentation_tpu.pipeline.mask2polygon",
        "unet_medical_image_contour_segmentation_tpu.utils.version_info",
    ])
    def test_module_invocable(self, module):
        r = subprocess.run(
            [sys.executable, "-m", module, "--help"],
            cwd=REPO, capture_output=True, text=True, timeout=300,
            env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin",
                 "JAX_PLATFORMS": "cpu", "HOME": "/root"},
        )
        # version_info has no argparse; it must simply run
        assert r.returncode == 0, r.stderr[-500:]


class TestSampleCache:
    def _write_set(self, root):
        from PIL import Image

        rng = np.random.default_rng(3)
        (root / "imgs").mkdir()
        (root / "masks").mkdir()
        for i in range(2):
            img = rng.integers(0, 255, (40, 32), dtype=np.uint8)
            mask = rng.choice([0, 128, 255], (40, 32)).astype(np.uint8)
            Image.fromarray(img).save(root / "imgs" / f"s{i}.png")
            Image.fromarray(mask).save(root / "masks" / f"s{i}_mask.png")

    def test_cached_equals_uncached_and_respects_budget(self, tmp_path):
        from unet_medical_image_contour_segmentation_tpu.data.dataset import (
            BasicDataset,
        )

        self._write_set(tmp_path)
        plain = BasicDataset(tmp_path / "imgs", tmp_path / "masks", scale=0.5)
        cached = BasicDataset(tmp_path / "imgs", tmp_path / "masks", scale=0.5,
                              cache_bytes=10**9)
        for idx in range(len(plain)):
            a, b = plain[idx], cached[idx]
            np.testing.assert_array_equal(a["image"], b["image"])
            np.testing.assert_array_equal(a["mask"], b["mask"])
        # second pass is served from the cache (identical objects)
        assert cached[3] is cached[3]
        assert len(cached._cache) == len(plain)

        one = cached[0]["image"].nbytes + cached[0]["mask"].nbytes
        tight = BasicDataset(tmp_path / "imgs", tmp_path / "masks", scale=0.5,
                             cache_bytes=one)  # room for exactly one sample
        for idx in range(len(tight)):
            tight[idx]
        assert len(tight._cache) == 1
        assert tight._cache_used <= one


class TestProfilingUtils:
    def test_step_timer_excludes_warmup(self):
        import time as _t

        from unet_medical_image_contour_segmentation_tpu.utils.profiling import (
            StepTimer,
        )

        t = StepTimer(warmup=2)
        assert t.items_per_sec is None
        t.step(4)          # warmup step 1
        t.step(4)          # warmup step 2: clock starts, items reset
        assert t.items_per_sec is None
        _t.sleep(0.05)
        t.step(4)
        rate = t.items_per_sec
        assert rate is not None and 0 < rate < 4 / 0.05 + 1

    def test_trace_context_writes_profile(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from unet_medical_image_contour_segmentation_tpu.utils.profiling import (
            trace,
        )

        with trace(str(tmp_path / "tr")):
            jnp.sum(jnp.ones((8, 8))).block_until_ready()
        produced = list((tmp_path / "tr").rglob("*"))
        assert produced, "trace produced no profile files"
        with trace(str(tmp_path / "off"), enabled=False):
            pass
        assert not (tmp_path / "off").exists()

    def test_device_memory_stats_shape(self):
        import jax

        from unet_medical_image_contour_segmentation_tpu.utils.profiling import (
            device_memory_stats,
        )

        stats = device_memory_stats()
        assert set(stats) == {str(d) for d in jax.devices()}
        assert all(isinstance(v, dict) for v in stats.values())


def test_plot_img_and_mask_builds_expected_subplots(monkeypatch):
    """One subplot per class + the input image (reference utils.py:4-13)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from unet_medical_image_contour_segmentation_tpu.utils.viz import (
        plot_img_and_mask,
    )

    shown = []
    monkeypatch.setattr(plt, "show", lambda: shown.append(1))
    img = np.zeros((16, 16), np.float32)
    mask = np.zeros((16, 16), np.int32)
    mask[4:8, 4:8] = 2
    plot_img_and_mask(img, mask)
    fig = plt.gcf()
    assert len(fig.axes) == 4 and shown  # input + classes {0,1,2}
    plt.close("all")
