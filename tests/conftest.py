"""Test configuration: force an 8-device virtual CPU platform.

Per SURVEY §4, distributed logic is exercised on a virtual CPU mesh so
DP/psum paths run without a TPU pod.  The host image registers a TPU ('axon')
backend via sitecustomize in every process, so we must override the platform
through jax.config (env vars alone are too late — jax is already imported).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses we spawn

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
