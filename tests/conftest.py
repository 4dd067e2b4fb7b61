"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is only used by bench.py; tests exercise the exact same
jitted code paths on CPU (the analogue of the reference's CPU OpenCL debug
backend, settings_default.json debug block).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The image's sitecustomize force-registers the axon TPU plugin, overriding
# JAX_PLATFORMS from the environment — override it back via the config API.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def assets():
    """Path to the read-only reference asset tree (scenes, env maps)."""
    path = "/root/reference/assets"
    if not os.path.isdir(path):
        pytest.skip("reference assets not available")
    return path
