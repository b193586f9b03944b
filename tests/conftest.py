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

# Persistent XLA compilation cache: the suite's wall clock is dominated by
# single-core XLA-CPU compiles, and the cache works for the CPU backend
# (measured: repeat compile+run 1.49s -> 0.44s). First (cold) run pays full
# price; every per-commit rerun hits the cache. V2PE_TEST_NO_CACHE=1 opts out.
if not os.environ.get("V2PE_TEST_NO_CACHE"):
    _cache_dir = os.environ.get(
        "V2PE_TEST_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     ".cache", "xla_pytest"),
    )
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def jax8():
    import jax

    assert jax.device_count() >= 8, jax.devices()
    return jax


def _rss_mb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


@pytest.fixture(scope="module", autouse=True)
def _drop_compile_caches():
    """Free compiled-executable memory between test modules.

    The full suite JIT-compiles hundreds of programs on the CPU backend;
    the accumulated executables eventually segfault the process partway
    through (reproduced deterministically at ~195 tests). Clearing jax's
    caches at module boundaries keeps RSS bounded."""
    yield
    jax.clear_caches()
    log = os.environ.get("V2PE_TEST_RSS_LOG")
    if log:
        with open(log, "a") as f:
            f.write(f"{_rss_mb():.0f}\n")
