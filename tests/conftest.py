"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding tests run anywhere (the analog of the reference's
ability to run with any backend disabled, main.cpp:289-302)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

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
