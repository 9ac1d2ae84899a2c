"""Test config: force the CPU backend with an 8-device virtual mesh so
sharding/pjit logic is exercised without TPU hardware (SURVEY §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon bootstrap (sitecustomize) force-sets jax_platforms="axon,cpu"
# AFTER env parsing, which silently routes every test op through the TPU
# tunnel. Override it back to cpu before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1247)


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference snapshot not mounted")
    return REFERENCE_DIR
