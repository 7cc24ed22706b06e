"""Test configuration: force CPU backend with a virtual 8-device mesh.

Mirrors the reference's test strategy (SURVEY.md §4): multi-device sharding is
validated on a faked host-platform mesh, exactly as the driver's
``dryrun_multichip`` does.  Must run before jax is imported anywhere.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# The image's sitecustomize imports jax and registers the TPU plugin before
# this file runs, so env vars alone are too late — force the CPU platform
# through the config API (it takes effect at backend init, which hasn't
# happened yet).
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the metric pipelines compile a conv pyramid
# per image-shape bucket; caching makes test reruns fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _gradient_image(width: int = 64, height: int = 64) -> np.ndarray:
    """Synthetic gradient fixture, equivalent to the reference's in-memory
    test images (reference: src/eval/helpers.rs:327-335)."""
    y, x = np.mgrid[0:height, 0:width]
    r = (x * 255 // max(width - 1, 1)).astype(np.uint8)
    g = (y * 255 // max(height - 1, 1)).astype(np.uint8)
    b = ((x + y) * 255 // max(width + height - 2, 1)).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


@pytest.fixture
def gradient_image():
    return _gradient_image()


@pytest.fixture
def gradient_image_factory():
    return _gradient_image
