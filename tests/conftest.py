"""Test configuration: run everything on a virtual 8-device CPU mesh so the
sharded paths are exercised without TPU hardware (SURVEY.md §4.4).

Note: this environment registers an `axon` TPU PJRT plugin at interpreter
start (sitecustomize) which overrides JAX_PLATFORMS from the environment, so
the CPU override must go through jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Escape hatch: QLDPC_TEST_TPU=1 keeps the session's real TPU backend so the
# TPU-only tests (hw-PRNG sampler, Pallas kernels) actually execute; default
# is the virtual 8-device CPU mesh.
if os.environ.get("QLDPC_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
