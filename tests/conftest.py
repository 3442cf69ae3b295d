"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding tests run anywhere (the analog of the reference's
ability to run with any backend disabled, main.cpp:289-302)."""

import os

# The container's sitecustomize may initialize a TPU backend at interpreter
# start; reset JAX onto a virtual 8-device CPU backend for the tests.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.clear_backends()
except Exception:  # pragma: no cover - fallback for newer jax
    import jax._src.xla_bridge as _xb
    _xb._clear_backends()
if jax.config.jax_num_cpu_devices < 8:
    jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the suite is compile-bound (each renderer
# variant compiles multi-engine frame fns); repeat runs hit the cache.
jax.config.update("jax_compilation_cache_dir", "/tmp/rayaccel_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest

from rayaccel_tpu.scene.loader import make_test_scene
from rayaccel_tpu.scene.compile import compile_scene


@pytest.fixture(scope="session")
def test_scene_data():
    return make_test_scene()


@pytest.fixture(scope="session")
def test_scene(test_scene_data):
    return compile_scene(test_scene_data)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
