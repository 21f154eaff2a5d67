from .letterbox import PngDenormalizer, PngNormalizer, denormalize_image, letterbox_geometry, normalize_image
from .mask2polygon import MaskProcessor, build_labelme_json, mask_to_polygons
from .post_process import postprocess_mask, remove_internal_regions
from .raw2png import RawToPngConverter, apply_windowing, read_16bit_raw
from .raw_normalize import RawNormalizer
from .seg_main import create_work_dirs, run_pipeline

__all__ = [
    "PngDenormalizer",
    "PngNormalizer",
    "denormalize_image",
    "letterbox_geometry",
    "normalize_image",
    "MaskProcessor",
    "build_labelme_json",
    "mask_to_polygons",
    "postprocess_mask",
    "remove_internal_regions",
    "RawToPngConverter",
    "apply_windowing",
    "read_16bit_raw",
    "RawNormalizer",
    "create_work_dirs",
    "run_pipeline",
]
