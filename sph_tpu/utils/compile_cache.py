"""Host-keyed persistent XLA compilation cache setup.

Shared by tests/conftest.py and the driver's `dryrun_multichip`
(__graft_entry__.py). XLA:CPU AOT results embed the compiling host's
exact CPU feature set (model-keyed LLVM tuning flags like
+prefer-no-gather) and jax's cache key does NOT include it — entries
compiled on a different host reload with a `cpu_aot_loader`
machine-feature warning ("could lead to execution errors such as
SIGILL"). Keying the cache directory by a CPU-identity fingerprint keeps
every entry native to the machine that runs it, while letting repeat
invocations on the SAME machine (driver re-runs, judge re-runs, pytest)
skip the cold compiles that dominate wall time on small CPU hosts.
"""

from __future__ import annotations

import hashlib
import os


def host_fingerprint() -> str:
    """Hash of the first logical CPU's identity block in /proc/cpuinfo."""
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


def cache_dir(base: str) -> str:
    """The host-keyed cache directory under `base` (not created here —
    jax creates it lazily on first cache write)."""
    return os.path.join(base, host_fingerprint())


def setup_persistent_cache(base: str,
                           min_compile_secs: float = 1.0) -> str:
    """Point jax's persistent compilation cache at the host-keyed dir
    under `base`. Returns the directory. Must run after `import jax`
    but is safe at any point before/after backend initialization."""
    import jax

    d = cache_dir(base)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )
    return d
