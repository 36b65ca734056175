"""Test harness: force a local 8-device virtual CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (SURVEY §4 item 4).

Note: this session's sitecustomize pre-imports jax and presets
JAX_PLATFORMS=axon (the remote-TPU tunnel), so env vars are too late here —
we must go through jax.config. Unit tests must be local and fast; bench.py
uses the real chip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: repeated pytest runs skip recompiles.
# KEYED BY HOST CPU FINGERPRINT: XLA:CPU AOT-caches machine code compiled
# for the exact CPU feature set, and jax's cache key does NOT include it —
# an entry written on a different host loads with a "could lead to
# execution errors such as SIGILL" warning and can silently miscompute
# (observed: a foreign +prefer-no-gather entry flipped
# test_reference_scenario_topology_sequence nondeterministically).
def _cpu_fingerprint() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]


_cache_dir = os.path.join(
    os.path.dirname(__file__), ".jax_cache", _cpu_fingerprint()
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on local CPU, got " + jax.default_backend()
    )
    assert jax.device_count() == 8
