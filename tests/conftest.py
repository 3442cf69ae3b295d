"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding tests run anywhere (the analog of the reference's
ability to run with any backend disabled, main.cpp:289-302)."""

import os
import sys

# The container's sitecustomize initializes the axon TPU backend at
# interpreter start, so env tweaks inside conftest come too late: re-exec
# pytest with a clean CPU environment (8 virtual devices) when needed.
if os.environ.get("RAYACCEL_TEST_EXEC") != "1":
    env = dict(os.environ)
    env["RAYACCEL_TEST_EXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

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
