"""Test environment: 8 virtual CPU devices, Pallas in interpret mode.

The "no real TPU" test analogue called out in SURVEY.md §4: kernels run
under the Pallas interpreter and the parallel layer runs on an 8-device
virtual CPU mesh (--xla_force_host_platform_device_count), so the whole
suite is hermetic and runs anywhere. The sandbox's sitecustomize imports
jax at interpreter start, so the platform override must go through
jax.config (env vars are too late by conftest time).
"""
import os

# No persistent compile cache for CPU test runs (the shared dir holds
# TPU-AOT entries whose machine-feature stamps spam warnings on load).
os.environ["HTOG_NO_COMPILE_CACHE"] = "1"

# Must precede first backend initialization.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) == 8, "expected 8 virtual CPU devices"
    return devs
