"""Test harness: force a local 8-device virtual CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (SURVEY §4 item 4).

Note: this session's sitecustomize pre-imports jax and presets
JAX_PLATFORMS=axon (the remote-TPU tunnel), so env vars are too late here —
we must go through jax.config. Unit tests must be local and fast; bench.py
uses the real chip.
"""

import hashlib
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)


def _cpu_fingerprint() -> str:
    """CPU identity + flags hash. XLA:CPU AOT results embed the compiling
    host's exact feature set (including model-keyed LLVM tuning flags like
    +prefer-no-gather), and jax's cache key does NOT include it — entries
    from a different host load with a `cpu_aot_loader` machine-feature
    warning ("could lead to execution errors such as SIGILL"). Keying the
    cache dir by host keeps every entry native to the machine that runs it.
    (Round-3 note: a test flake originally blamed on such reloads was in
    fact zero-copy buffer aliasing in the native oracle, fixed in
    sph_tpu/native/golden.py — but foreign-host AOT reuse remains unsound,
    hence the fingerprint.)"""
    ident = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":")[0].strip()
                if key in ("vendor_id", "cpu family", "model",
                           "model name", "stepping", "microcode", "flags"):
                    ident.append(line.strip())
                if line.strip() == "" and ident:
                    break   # first logical CPU block is enough
    except OSError:
        import platform

        ident = [platform.processor()]
    return hashlib.sha1("\n".join(ident).encode()).hexdigest()[:12]


# Persistent compilation cache (host-keyed): repeated pytest runs skip the
# ~25 min of cold compiles (dominated by the k=8 pure-XLA dense twin).
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
