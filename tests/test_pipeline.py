"""Pipeline tests: per-stage parity vs reference tools + synthetic end-to-end run."""

import json
import os

import numpy as np
import pytest
from PIL import Image

import jax

from unet_medical_image_contour_segmentation_tpu.pipeline.letterbox import (
    PngDenormalizer, PngNormalizer, denormalize_image, normalize_image,
)
from unet_medical_image_contour_segmentation_tpu.pipeline.post_process import postprocess_mask
from unet_medical_image_contour_segmentation_tpu.pipeline.raw2png import (
    RawToPngConverter, apply_windowing,
)
from unet_medical_image_contour_segmentation_tpu.pipeline.raw_normalize import (
    RawNormalizer, nearest_resize_reference,
)


def _write_raw(path, arr: np.ndarray):
    with open(path, "wb") as f:
        f.write(arr.astype("<u2").tobytes())


class TestRaw2Png:
    def test_windowing_matches_reference(self, reference_path, tmp_path):
        from utils.raw2png import RawToPngConverter as RefConverter

        rng = np.random.default_rng(0)
        img = rng.integers(0, 65535, (64, 80), dtype=np.uint16)
        raw = tmp_path / "scan.raw"
        _write_raw(raw, img)

        ref = RefConverter(str(raw), str(tmp_path / "ref"), width=80, height=64,
                           window_length=30000, window_width=20000)
        ref.convert()
        ours = RawToPngConverter(str(raw), str(tmp_path / "ours"), width=80, height=64,
                                 window_length=30000, window_width=20000)
        ours.convert()

        a = np.asarray(Image.open(tmp_path / "ref" / "scan.png"))
        b = np.asarray(Image.open(tmp_path / "ours" / "scan.png"))
        np.testing.assert_array_equal(a, b)

    def test_windowing_function(self):
        img = np.array([[0, 20000, 40000, 65535]], dtype=np.uint16)
        out = apply_windowing(img, window_length=30000, window_width=20000)
        assert out.dtype == np.uint8
        assert out[0, 0] == 0 and out[0, 3] == 255


class TestLetterbox:
    @pytest.mark.parametrize("size", [(100, 60), (60, 100), (512, 512), (777, 333)])
    def test_normalize_matches_reference(self, reference_path, size, tmp_path):
        from utils.png_normalize import PngNormalizer as RefNormalizer

        rng = np.random.default_rng(1)
        img = Image.fromarray(rng.integers(0, 255, size[::-1], dtype=np.uint8))
        (tmp_path / "in").mkdir()
        img.save(tmp_path / "in" / "a.png")

        RefNormalizer(str(tmp_path / "in"), str(tmp_path / "ref")).normalize()
        PngNormalizer(str(tmp_path / "in"), str(tmp_path / "ours")).normalize()

        a = np.asarray(Image.open(tmp_path / "ref" / "a.png"))
        b = np.asarray(Image.open(tmp_path / "ours" / "a.png"))
        np.testing.assert_array_equal(a, b)
        ja = json.load(open(tmp_path / "ref" / "original_sizes.json"))
        jb = json.load(open(tmp_path / "ours" / "original_sizes.json"))
        assert ja == jb

    @pytest.mark.parametrize("size", [(100, 60), (60, 100), (321, 457)])
    def test_denormalize_matches_reference(self, reference_path, size, tmp_path):
        from utils.png_denormalize import PngDenormalizer as RefDenormalizer

        rng = np.random.default_rng(2)
        norm = Image.fromarray(rng.integers(0, 255, (512, 512), dtype=np.uint8))
        (tmp_path / "in").mkdir()
        norm.save(tmp_path / "in" / "a.png")
        sizes = {"a.png": {"width": size[0], "height": size[1]}}
        with open(tmp_path / "in" / "original_sizes.json", "w") as f:
            json.dump(sizes, f)

        RefDenormalizer(str(tmp_path / "in"), str(tmp_path / "ref"),
                        str(tmp_path / "in" / "original_sizes.json")).denormalize()
        PngDenormalizer(str(tmp_path / "in"), str(tmp_path / "ours"),
                        str(tmp_path / "in" / "original_sizes.json")).denormalize()
        a = np.asarray(Image.open(tmp_path / "ref" / "a.png"))
        b = np.asarray(Image.open(tmp_path / "ours" / "a.png"))
        np.testing.assert_array_equal(a, b)

    def test_roundtrip(self):
        img = Image.fromarray(np.full((60, 100), 200, dtype=np.uint8))
        normalized = normalize_image(img)
        assert normalized.size == (512, 512)
        restored = denormalize_image(normalized, 100, 60)
        assert restored.size == (100, 60)


class TestRawNormalize:
    def test_nearest_resize_matches_reference_loop(self):
        rng = np.random.default_rng(3)
        img = rng.random((37, 53)).astype(np.float32)
        scale = 512 / 53
        new_h, new_w = int(37 * scale), 512
        fast = nearest_resize_reference(img, new_h, new_w, scale)
        # the reference's double loop, evaluated directly
        slow = np.zeros((new_h, new_w), np.float32)
        for y in range(new_h):
            for x in range(new_w):
                slow[y, x] = img[min(int(y / scale), 36), min(int(x / scale), 52)]
        np.testing.assert_array_equal(fast, slow)

    def test_raw_normalizer(self, tmp_path):
        rng = np.random.default_rng(4)
        img = rng.integers(0, 65535, (48, 64), dtype=np.uint16)
        _write_raw(tmp_path / "x.raw", img)
        res = RawNormalizer(str(tmp_path), str(tmp_path / "out"),
                            width=64, height=48).normalize()
        assert res["processed"] == 1
        arr = np.load(tmp_path / "out" / "x.npy")
        assert arr.shape == (384, 512)
        assert 0 <= arr.min() and arr.max() <= 1
        sizes = json.load(open(tmp_path / "out" / "original_sizes.json"))
        assert sizes["x.raw"] == {"width": 64, "height": 48}


class TestPostProcess:
    def test_matches_reference(self, reference_path):
        from utils.post_process import postprocess_mask as ref_post

        rng = np.random.default_rng(5)
        mask = np.zeros((256, 256), np.uint8)
        mask[20:200, 20:200] = 2          # big foreground with a hole
        mask[80:120, 80:120] = 1          # internal background -> filled
        mask[10:14, 230:234] = 2          # tiny noise blob -> removed
        mask[mask == 0] = rng.integers(0, 2, (mask == 0).sum())

        expect = ref_post(mask.copy(), min_area=1000)
        got = postprocess_mask(mask.copy(), min_area=1000)
        np.testing.assert_array_equal(got, expect)


class TestEndToEnd:
    def test_full_pipeline_synthetic_raw(self, tmp_path):
        """RAW bytes -> 5 stages -> labelme JSON + overlay, random weights."""
        import jax.numpy as jnp

        from unet_medical_image_contour_segmentation_tpu.config import PipelineConfig
        from unet_medical_image_contour_segmentation_tpu.engine.predict import Predictor
        from unet_medical_image_contour_segmentation_tpu.models.unet import unet_t
        from unet_medical_image_contour_segmentation_tpu.pipeline.seg_main import run_pipeline

        w, h = 160, 128
        rng = np.random.default_rng(6)
        frame = rng.integers(20000, 40000, (h, w), dtype=np.uint16)
        frame[40:90, 50:120] = 60000  # a bright blob to segment
        raw_dir = tmp_path / "raws"
        raw_dir.mkdir()
        _write_raw(raw_dir / "scan1.raw", frame)

        model = unet_t(1, 3)
        params, bn_state = model.init(jax.random.PRNGKey(0))

        class BlobPredictor(Predictor):
            # random weights won't produce contours; threshold the input
            # instead so the pipeline plumbing is fully exercised.
            def _predict_device(self, images):
                g = images[..., 0] if images.ndim == 4 else images
                return (g > 0.7).astype(np.int32) * 2

            def predict_array(self, images, out_hw=None):
                return np.asarray(self._predict_device(images))

        cfg = PipelineConfig(
            input_raw=str(raw_dir),
            output_root=str(tmp_path / "results"),
            width=w, height=h,
            window_width=30000, window_length=35000,
            model="unused",
        )
        out_dir = run_pipeline(cfg, predictor=BlobPredictor(model, params, bn_state))

        for stage in ["1_raw_png", "2_normalized_png", "3_pred_masks",
                      "4_denormalized_masks", "5_json_results"]:
            assert os.listdir(tmp_path / "results" / stage), f"{stage} empty"

        data = json.load(open(os.path.join(out_dir, "scan1.json")))
        assert data["version"] == "1.0.2.799"
        assert data["imageWidth"] == w and data["imageHeight"] == h
        assert data["shapes"] and data["shapes"][0]["shape_type"] == "polygon"
        assert os.path.exists(os.path.join(out_dir, "scan1_contour_overlay.png"))

    def test_pipeline_int8_scales_roundtrip(self, tmp_path):
        """cfg.int8: run A calibrates + persists the scales JSON, run B loads
        it; stage-3 masks are identical across the two serving processes."""
        from unet_medical_image_contour_segmentation_tpu.config import PipelineConfig
        from unet_medical_image_contour_segmentation_tpu.engine.checkpoint import (
            save_checkpoint,
        )
        from unet_medical_image_contour_segmentation_tpu.models.unet import unet_t
        from unet_medical_image_contour_segmentation_tpu.pipeline.seg_main import (
            run_pipeline,
        )

        w, h = 96, 80
        rng = np.random.default_rng(9)
        frame = rng.integers(20000, 40000, (h, w), dtype=np.uint16)
        frame[20:60, 30:80] = 60000
        raw_dir = tmp_path / "raws"
        raw_dir.mkdir()
        _write_raw(raw_dir / "scan1.raw", frame)

        model = unet_t(1, 3)
        params, bn_state = model.init(jax.random.PRNGKey(1))
        ckpt = tmp_path / "m.npz"
        save_checkpoint(str(ckpt), params, bn_state, mask_values=[0, 128, 255])

        scales = tmp_path / "scales.json"
        masks = []
        for run in ("a", "b"):
            cfg = PipelineConfig(
                input_raw=str(raw_dir), output_root=str(tmp_path / f"res_{run}"),
                width=w, height=h, window_width=30000, window_length=35000,
                model=str(ckpt), target_size=64,
                int8=True, int8_scales=str(scales),
            )
            try:
                run_pipeline(cfg)
            except RuntimeError as e:
                # random weights may find no contours in stage 5
                assert "stage 5" in str(e)
            assert scales.exists(), "calibration JSON not persisted"
            mdir = tmp_path / f"res_{run}" / "3_pred_masks"
            files = sorted(os.listdir(mdir))
            assert files
            masks.append([np.asarray(Image.open(mdir / f)) for f in files])
        for a, b in zip(*masks):
            np.testing.assert_array_equal(a, b)


class TestPredictor:
    def test_predict_paths_batches_and_saves(self, tmp_path):
        from unet_medical_image_contour_segmentation_tpu.engine.predict import (
            Predictor, mask_to_image,
        )
        from unet_medical_image_contour_segmentation_tpu.models.unet import unet_t

        rng = np.random.default_rng(7)
        files = []
        for i in range(3):
            p = tmp_path / f"img{i}.png"
            Image.fromarray(rng.integers(0, 255, (64, 64), dtype=np.uint8)).save(p)
            files.append(str(p))

        model = unet_t(1, 3)
        params, bn_state = model.init(jax.random.PRNGKey(1))
        predictor = Predictor(model, params, bn_state, batch_size=2)
        results = predictor.predict_paths(files, output_dir=str(tmp_path / "out"),
                                          postprocess=False)
        assert len(results) == 3
        for i in range(3):
            out = tmp_path / "out" / f"img{i}.png"
            assert out.exists()
            vals = set(np.unique(np.asarray(Image.open(out))))
            assert vals <= {0, 128, 255}

    def test_data_parallel_predictor_matches_single_device(self):
        """num_devices=4: sharded-batch serving == single device, exactly —
        including a ragged batch (6 % 4 != 0, padded and cropped back)."""
        from unet_medical_image_contour_segmentation_tpu.engine.predict import (
            Predictor,
        )
        from unet_medical_image_contour_segmentation_tpu.models.unet import unet_t

        model = unet_t(1, 3)
        params, bn_state = model.init(jax.random.PRNGKey(2))
        single = Predictor(model, params, bn_state)
        multi = Predictor(model, params, bn_state, num_devices=4)
        x = np.random.default_rng(8).random((6, 64, 64, 1), np.float32)
        np.testing.assert_array_equal(multi.predict_array(x),
                                      single.predict_array(x))
        # tiled path under the mesh (threshold forces tiling at 128²)
        s_t = Predictor(model, params, bn_state, tile=64, tile_halo=48,
                        tile_threshold=1)
        m_t = Predictor(model, params, bn_state, tile=64, tile_halo=48,
                        tile_threshold=1, num_devices=2)
        y = np.random.default_rng(9).random((3, 128, 128, 1), np.float32)
        np.testing.assert_array_equal(m_t.predict_array(y),
                                      s_t.predict_array(y))

    def test_binary_predictor_matches_eval_forward(self):
        """classes=1: Predictor uses sigmoid > 0.5 (the evaluate-path
        semantics; the reference predict CLI is multiclass-only) — dense and
        tiled paths agree with eval_forward."""
        from unet_medical_image_contour_segmentation_tpu.engine.evaluate import (
            eval_forward,
        )
        from unet_medical_image_contour_segmentation_tpu.engine.predict import (
            Predictor,
        )
        from unet_medical_image_contour_segmentation_tpu.models.unet import unet_t

        model = unet_t(1, 1)
        params, bn_state = model.init(jax.random.PRNGKey(13))
        x = np.random.default_rng(15).random((2, 96, 96, 1), np.float32)
        want = np.asarray(eval_forward(model, 1, params, bn_state,
                                       jax.numpy.asarray(x[..., 0])))
        dense = Predictor(model, params, bn_state, fold_bn=False)
        np.testing.assert_array_equal(dense.predict_array(x), want)
        assert set(np.unique(want)) <= {0, 1}
        tiled = Predictor(model, params, bn_state, fold_bn=False,
                          tile=64, tile_halo=48, tile_threshold=1)
        np.testing.assert_array_equal(tiled.predict_array(x), want)

    def test_mask_to_image_value_map(self):
        from unet_medical_image_contour_segmentation_tpu.engine.predict import mask_to_image

        m = np.array([[0, 1], [2, 0]])
        img = np.asarray(mask_to_image(m))
        np.testing.assert_array_equal(img, [[0, 128], [255, 0]])

    def test_predict_resizes_to_original(self):
        from unet_medical_image_contour_segmentation_tpu.engine.predict import Predictor
        from unet_medical_image_contour_segmentation_tpu.models.unet import unet_t

        model = unet_t(1, 3)
        params, bn_state = model.init(jax.random.PRNGKey(2))
        predictor = Predictor(model, params, bn_state)
        img = Image.fromarray(np.zeros((100, 60), dtype=np.uint8))
        mask = predictor.predict_image(img, postprocess=False)
        assert mask.shape == (100, 60)


class TestTiledPredictor:
    def test_tiled_matches_dense_at_real_halo(self):
        """unet_s, 1024x1024, tile 512 / halo 96: tiling is EXACT vs dense."""
        from unet_medical_image_contour_segmentation_tpu.engine.predict import Predictor
        from unet_medical_image_contour_segmentation_tpu.models.unet import unet_s

        model = unet_s(1, 3)
        params, bn_state = model.init(jax.random.PRNGKey(3))
        rng = np.random.default_rng(4)
        images = rng.random((1, 1024, 1024, 1), np.float32)

        dense = Predictor(model, params, bn_state, tile_threshold=0)
        tiled = Predictor(model, params, bn_state, tile=512, tile_halo=96,
                          tile_threshold=512 * 512)  # force tiling at 1024^2
        d = dense.predict_array(images)
        t = tiled.predict_array(images)
        assert t.shape == d.shape == (1, 1024, 1024)
        np.testing.assert_array_equal(t, d)

    def test_tiling_triggers_and_handles_ragged_sizes(self):
        """Non-multiple-of-tile sizes pad+crop correctly; small stays dense."""
        from unet_medical_image_contour_segmentation_tpu.engine.predict import Predictor
        from unet_medical_image_contour_segmentation_tpu.models.unet import unet_t

        model = unet_t(1, 3)
        params, bn_state = model.init(jax.random.PRNGKey(5))
        p = Predictor(model, params, bn_state, tile=64, tile_halo=48,
                      tile_threshold=96 * 96)
        rng = np.random.default_rng(6)
        img = rng.random((1, 160, 224, 1), np.float32)  # not tile multiples
        out = p.predict_array(img)
        assert out.shape == (1, 160, 224)
        dense = Predictor(model, params, bn_state, tile_threshold=0)
        np.testing.assert_array_equal(out, dense.predict_array(img))

    def test_auto_tile_selection_rule(self):
        """tile=None picks the largest candidate whose grid has >= 8 tiles
        (the r5 measured rule: 1024 at 4096², 512 at 2048²)."""
        from unet_medical_image_contour_segmentation_tpu.engine.predict import Predictor
        from unet_medical_image_contour_segmentation_tpu.models.unet import unet_t

        model = unet_t(1, 3)
        params, bn_state = model.init(jax.random.PRNGKey(5))
        p = Predictor(model, params, bn_state)
        assert p.tile is None  # auto is the default
        assert p._auto_tile(4096, 4096) == 1024  # 16 tiles of 1024
        assert p._auto_tile(3072, 3072) == 1024  # 9 tiles
        assert p._auto_tile(2048, 2048) == 512   # 4 tiles of 1024 -> drop
        assert p._auto_tile(1600, 1600) == 512   # smallest tiling inputs
        assert p._auto_tile(1024, 8192) == 1024  # rectangular: 8 tiles

    def test_auto_tile_end_to_end_exact(self):
        """The auto-selected tile feeds the same exact grid program: shrink
        the candidate set so CPU-sized inputs exercise BOTH choices."""
        from unet_medical_image_contour_segmentation_tpu.engine.predict import Predictor
        from unet_medical_image_contour_segmentation_tpu.models.unet import unet_t

        model = unet_t(1, 3)
        params, bn_state = model.init(jax.random.PRNGKey(5))
        dense = Predictor(model, params, bn_state, tile_threshold=0)
        auto = Predictor(model, params, bn_state, tile_halo=48,
                         tile_threshold=1)
        auto.AUTO_TILES = (64, 96)
        rng = np.random.default_rng(7)
        big = rng.random((1, 288, 288, 1), np.float32)  # 9 tiles of 96
        assert auto._auto_tile(288, 288) == 96
        np.testing.assert_array_equal(auto.predict_array(big),
                                      dense.predict_array(big))
        small = rng.random((1, 160, 224, 1), np.float32)  # 6 of 96 -> 64
        assert auto._auto_tile(160, 224) == 64
        np.testing.assert_array_equal(auto.predict_array(small),
                                      dense.predict_array(small))

    @pytest.mark.parametrize("hw", [(97, 131), (65, 193), (64, 64)])
    def test_tiling_exact_at_awkward_sizes(self, hw):
        """Odd/prime-ish sizes (pad on both axes, partial edge tiles)."""
        from unet_medical_image_contour_segmentation_tpu.engine.predict import Predictor
        from unet_medical_image_contour_segmentation_tpu.models.unet import unet_t

        model = unet_t(1, 3)
        params, bn_state = model.init(jax.random.PRNGKey(5))
        tiled = Predictor(model, params, bn_state, tile=64, tile_halo=48,
                          tile_threshold=1)
        dense = Predictor(model, params, bn_state, tile_threshold=0)
        img = np.random.default_rng(hw[0]).random((2, *hw, 1), np.float32)
        np.testing.assert_array_equal(tiled.predict_array(img),
                                      dense.predict_array(img))

    def test_predictor_concurrent_use_is_consistent(self):
        """Two threads sharing one Predictor (jit-cache races) agree with a
        serial run — the per-instance step cache must tolerate concurrent
        builds."""
        from concurrent.futures import ThreadPoolExecutor

        from unet_medical_image_contour_segmentation_tpu.engine.predict import Predictor
        from unet_medical_image_contour_segmentation_tpu.models.unet import unet_t

        model = unet_t(1, 3)
        params, bn_state = model.init(jax.random.PRNGKey(6))
        p = Predictor(model, params, bn_state)
        rng = np.random.default_rng(12)
        batches = [rng.random((2, 48 + 16 * (i % 3), 64, 1), np.float32)
                   for i in range(8)]
        serial = [p.predict_array(b) for b in batches]
        fresh = Predictor(model, params, bn_state)  # cold cache
        with ThreadPoolExecutor(max_workers=4) as ex:
            concurrent = list(ex.map(fresh.predict_array, batches))
        for a, b in zip(serial, concurrent):
            np.testing.assert_array_equal(a, b)

    def test_device_grid_matches_host_stitched(self):
        """The one-program device tiling (default) is bit-identical to the
        per-tile host-stitched path (tile_on_device=False), including ragged
        grids, multi-image batches, and 4-channel inputs."""
        from unet_medical_image_contour_segmentation_tpu.engine.predict import Predictor
        from unet_medical_image_contour_segmentation_tpu.models.unet import unet_t

        model = unet_t(4, 3)
        params, bn_state = model.init(jax.random.PRNGKey(11))
        rng = np.random.default_rng(13)
        for shape in [(1, 160, 224, 4), (2, 128, 128, 4)]:
            img = rng.random(shape, np.float32)
            dev = Predictor(model, params, bn_state, tile=64, tile_halo=48,
                            tile_threshold=1)
            host = Predictor(model, params, bn_state, tile=64, tile_halo=48,
                             tile_threshold=1)
            host.tile_on_device = False
            np.testing.assert_array_equal(dev.predict_array(img),
                                          host.predict_array(img))

    def test_device_grid_tile_batch_variants(self):
        """tpb=1 (pure scan) and tpb > grid (all tiles in one step, padded
        with duplicates) both match the dense forward."""
        from unet_medical_image_contour_segmentation_tpu.engine.predict import Predictor
        from unet_medical_image_contour_segmentation_tpu.models.unet import unet_t

        model = unet_t(1, 3)
        params, bn_state = model.init(jax.random.PRNGKey(12))
        img = np.random.default_rng(14).random((1, 130, 190, 1), np.float32)
        dense = Predictor(model, params, bn_state, tile_threshold=0)
        want = dense.predict_array(img)
        for tpb in (1, 3, 64):
            p = Predictor(model, params, bn_state, tile=64, tile_halo=48,
                          tile_threshold=1)
            p.tile_batch = tpb
            np.testing.assert_array_equal(p.predict_array(img), want)

    def test_predict_paths_uses_tiling(self, tmp_path):
        from PIL import Image as PILImage

        from unet_medical_image_contour_segmentation_tpu.engine.predict import Predictor
        from unet_medical_image_contour_segmentation_tpu.models.unet import unet_t

        rng = np.random.default_rng(8)
        p = tmp_path / "big.png"
        PILImage.fromarray(rng.integers(0, 255, (192, 192), dtype=np.uint8)).save(p)
        model = unet_t(1, 3)
        params, bn_state = model.init(jax.random.PRNGKey(7))
        pred = Predictor(model, params, bn_state, tile=64, tile_halo=48,
                         tile_threshold=128 * 128)
        calls = []
        orig = pred._tiled_predict
        pred._tiled_predict = lambda imgs: (calls.append(1), orig(imgs))[1]
        results = pred.predict_paths([str(p)], output_dir=str(tmp_path / "o"),
                                     postprocess=False)
        assert calls, "tiled path was not taken"
        assert (tmp_path / "o" / "big.png").exists()
        assert results[str(p)].shape == (192, 192)


class TestUint8Transfer:
    """Raw-uint8 upload + device-side normalization (predict_array docstring).

    Contract: argmax parity with host preprocessing — the device /255 can
    differ from numpy's by 1 f32 ulp on TPU.  On the CPU test backend the
    divisions agree bitwise, so these asserts are exact.
    """

    def _setup(self, seed=7):
        from unet_medical_image_contour_segmentation_tpu.engine.predict import Predictor
        from unet_medical_image_contour_segmentation_tpu.models.unet import unet_t

        model = unet_t(1, 3)
        params, bn_state = model.init(jax.random.PRNGKey(seed))
        return Predictor, model, params, bn_state

    def test_dense_uint8_matches_host_normalized(self):
        Predictor, model, params, bn = self._setup()
        rng = np.random.default_rng(20)
        raw = rng.integers(0, 256, (2, 96, 96, 1), dtype=np.uint8)
        host = raw.astype(np.float32) / np.float32(255.0)
        p = Predictor(model, params, bn, tile_threshold=0)
        np.testing.assert_array_equal(p.predict_array(raw),
                                      p.predict_array(host))

    def test_low_value_images_stay_unscaled(self):
        """preprocess's per-image rule: all pixels <= 1 means NO /255."""
        Predictor, model, params, bn = self._setup()
        rng = np.random.default_rng(21)
        raw = rng.integers(0, 2, (2, 96, 96, 1), dtype=np.uint8)
        host = raw.astype(np.float32)  # unscaled: division by 1.0 is exact
        p = Predictor(model, params, bn, tile_threshold=0)
        np.testing.assert_array_equal(p.predict_array(raw),
                                      p.predict_array(host))

    def test_per_image_rule_in_one_batch(self):
        """One batch mixing a full-range and an all-{0,1} image normalizes
        each by ITS own max, exactly as per-image host preprocessing."""
        Predictor, model, params, bn = self._setup()
        rng = np.random.default_rng(22)
        a = rng.integers(0, 256, (96, 96, 1), dtype=np.uint8)
        b = rng.integers(0, 2, (96, 96, 1), dtype=np.uint8)
        raw = np.stack([a, b])
        host = np.stack([a.astype(np.float32) / np.float32(255.0),
                         b.astype(np.float32)])
        p = Predictor(model, params, bn, tile_threshold=0)
        np.testing.assert_array_equal(p.predict_array(raw),
                                      p.predict_array(host))

    def test_tiled_uint8_matches_dense_uint8(self):
        """The device-grid program's in-window normalization (uint8 padded
        buffer, per-image divisor) matches the dense uint8 step bit-for-bit
        (both divide with the same jnp op)."""
        Predictor, model, params, bn = self._setup()
        rng = np.random.default_rng(23)
        img = rng.integers(0, 256, (1, 160, 224, 1), dtype=np.uint8)
        tiled = Predictor(model, params, bn, tile=64, tile_halo=48,
                          tile_threshold=1)
        dense = Predictor(model, params, bn, tile_threshold=0)
        np.testing.assert_array_equal(tiled.predict_array(img),
                                      dense.predict_array(img))

    def test_predict_paths_fast_transfer_matches(self, tmp_path):
        Predictor, model, params, bn = self._setup()
        rng = np.random.default_rng(24)
        for name in ("a.png", "b.png"):
            Image.fromarray(
                rng.integers(0, 256, (96, 96), dtype=np.uint8)
            ).save(tmp_path / name)
        p = Predictor(model, params, bn, tile_threshold=0)
        paths = [str(tmp_path / "a.png"), str(tmp_path / "b.png")]
        slow = p.predict_paths(paths, save=False, postprocess=False)
        fast = p.predict_paths(paths, save=False, postprocess=False,
                               fast_transfer=True)
        for k in paths:
            np.testing.assert_array_equal(fast[k], slow[k])

    def test_quantize_calibrates_from_uint8(self):
        """uint8 first batch host-normalizes for calibration; the quantized
        forward then serves the raw-uint8 upload path."""
        from unet_medical_image_contour_segmentation_tpu.models.unet import unet_s

        from unet_medical_image_contour_segmentation_tpu.engine.predict import (
            Predictor,
        )

        model = unet_s(1, 3)
        params, bn = model.init(jax.random.PRNGKey(9))
        rng = np.random.default_rng(25)
        raw = rng.integers(0, 256, (2, 64, 64, 1), dtype=np.uint8)
        q = Predictor(model, params, bn, tile_threshold=0, quantize=True)
        out = q.predict_array(raw)  # auto-calibrates from the uint8 batch
        assert out.shape == (2, 64, 64)
        host = raw.astype(np.float32) / np.float32(255.0)
        qf = Predictor(model, params, bn, tile_threshold=0, quantize=True)
        agree = (qf.predict_array(host) == out).mean()
        assert agree > 0.999, agree
