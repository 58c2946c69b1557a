"""Test harness: force an 8-virtual-device CPU mesh.

SURVEY §4 tier 4: the TPU analog of a fake distributed backend is XLA's
host-platform device-count flag — sharding/collective tests run against 8
virtual CPU devices, no TPU or pod required. The axon TPU plugin in this
image pins JAX_PLATFORMS=axon at interpreter start, so the CPU override
must go through jax.config (env vars alone are not honored).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
