"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax initialises its backends, so this executes at
conftest import time (pytest loads conftest before test modules).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep compilation deterministic and quiet in tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The env var alone is not enough here: the hosting environment pins
# JAX_PLATFORMS via sitecustomize, so pin the config explicitly before any
# backend initialises.  Backends are lazy, so this is safe even if a pytest
# plugin already imported jax.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled-program memory between test modules.

    The XLA CPU compiler segfaults after ~dozens of large program
    compilations in one process (reproduced on the slow e2e suite, jax
    backend_compile_and_load); dropping the executable cache between modules
    keeps the process under the threshold.
    """
    yield
    jax.clear_caches()
