"""Test harness: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize eagerly registers and initializes the axon TPU
backend before pytest starts, so setting env vars alone is not enough — we
re-point jax at CPU and reset the already-initialized backend registry.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# sitecustomize may have imported jax with JAX_PLATFORMS=axon already in the
# env; backends are not initialized yet at this point, so re-pointing the
# config at CPU here still takes effect. Nothing may call jax.devices()
# before this line.
jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu" and len(jax.devices()) == 8, (
    "tests require an 8-device virtual CPU mesh; got "
    f"{jax.default_backend()} x{len(jax.devices())}")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(42)
