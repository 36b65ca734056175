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

from sph_tpu.utils.compile_cache import setup_persistent_cache  # noqa: E402

# Persistent compilation cache (host-keyed — see compile_cache.py for why
# AOT entries must never cross hosts; round-3 note: a test flake originally
# blamed on such reloads was in fact zero-copy buffer aliasing in the
# native oracle, fixed in sph_tpu/native/golden.py — but foreign-host AOT
# reuse remains unsound, hence the fingerprint). Repeated pytest runs skip
# the ~25 min of cold compiles (dominated by the k=8 pure-XLA dense twin).
# Shared with __graft_entry__.dryrun_multichip so either warms the other.
_cache_dir = setup_persistent_cache(
    os.path.join(os.path.dirname(__file__), ".jax_cache")
)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on local CPU, got " + jax.default_backend()
    )
    assert jax.device_count() == 8
