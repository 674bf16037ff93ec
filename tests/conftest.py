"""Test configuration: run all tests on a virtual 8-device CPU mesh.

The container's sitecustomize force-registers a remote TPU backend
(jax_platforms="axon,cpu"); tests must run on local CPU with 8 fake devices
(the same environment the driver uses for the multichip dry-run), so we
re-point jax at the CPU platform before any backend is instantiated.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"


@pytest.fixture
def rng():
    return np.random.default_rng(0xB10)


def cpu_subprocess_env(repo: str) -> dict:
    """Env for CLI subprocess tests: plain CPU jax, independent of the
    remote-TPU relay. The parent's PYTHONPATH carries the relay's
    sitecustomize directory — inheriting it makes the child register the
    remote backend and (when the relay is down) hang in its reconnect
    loop, so the child gets ONLY the repo on its path plus an explicit
    CPU platform selection."""
    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    env["JAX_PLATFORMS"] = "cpu"
    for k in list(env):
        if "AXON" in k or k.startswith("TPU_") or k == "PJRT_LIBRARY_PATH":
            env.pop(k)
    return env
