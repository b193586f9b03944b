"""Test configuration: force CPU backend with 8 virtual devices so sharding /
ring-attention logic is unit-testable on one host (SURVEY.md §4.7)."""

import os

# Must run before jax is imported anywhere. Force CPU: the session image pins
# jax_platforms to the real TPU chip ('axon') even over JAX_PLATFORMS=cpu, so
# we also update jax.config below. Override with V2PE_TEST_PLATFORM.
_platform = os.environ.get("V2PE_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def jax8():
    import jax

    assert jax.device_count() >= 8, jax.devices()
    return jax
