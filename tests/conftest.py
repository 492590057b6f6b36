"""Test env: force CPU backend with 8 virtual devices so sharding tests run
without TPU hardware. Must run before jax import."""

import os

# POSFEAT_TPU_TESTS=1 opts into the real TPU backend (throughput tests);
# default is the deterministic 8-device virtual CPU mesh.
_USE_TPU = os.environ.get("POSFEAT_TPU_TESTS") == "1"

if not _USE_TPU:
    # hard override: the container env pins JAX_PLATFORMS=axon (real TPU
    # via relay); tests must run on the virtual CPU mesh.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _USE_TPU:
    # The axon sitecustomize's register() sets jax_platforms="axon,cpu"
    # PROGRAMMATICALLY at interpreter start, which overrides the env var —
    # without this, every test would compile through the remote TPU relay
    # (minutes per program). Setting the config before any backend init
    # wins.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from posfeat_tpu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


@pytest.fixture
def rng():
    return np.random.RandomState(0)
