"""Test configuration: run everything on a fake 8-device CPU mesh.

Must set the XLA flags before jax is imported anywhere (the standard JAX analogue of
a fake distributed backend — see SURVEY.md §4).
"""

import os

# Hard overrides: this machine's sitecustomize registers the axon TPU plugin and
# pins JAX_PLATFORMS=axon at interpreter start, so setdefault is not enough and the
# in-process config update below is what actually selects the CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Persistent compilation cache: repeat suite runs (and the CLI subprocess test)
# skip recompilation.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def checker_texture():
    """A deterministic 64x48 RGBA checkerboard-ish gradient texture."""
    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(1, w - 1)).astype(np.uint8)
    g = (yy * 255 // max(1, h - 1)).astype(np.uint8)
    b = (((xx // 8 + yy // 8) % 2) * 255).astype(np.uint8)
    a = np.full((h, w), 255, np.uint8)
    return np.stack([r, g, b, a], axis=-1)
