"""Test config: force an 8-virtual-device CPU platform before JAX initializes.

This is the standard way to exercise pjit/shard_map multi-device semantics
without TPU pods (SURVEY.md §4).  Must run before anything imports jax.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize pre-registers the TPU PJRT plugin and pins
# jax_platforms; override back to CPU before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Repo root on sys.path so `import unet_medical_image_contour_segmentation_tpu`
# works without installation.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


@pytest.fixture(scope="session")
def reference_path():
    """Path to the read-only reference repo; skips if unavailable.

    Used only as a golden-parity oracle — reference modules are imported, never
    copied.
    """
    if not reference_available():
        pytest.skip("reference repo not mounted")
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    return REFERENCE_DIR
