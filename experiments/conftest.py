"""Same harness as tests/conftest.py: local 8-device virtual CPU mesh +
host-keyed persistent compile cache, so the demoted experiments stay
runnable with `python -m pytest experiments/ -q` without being part of
the shipped suite."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

from sph_tpu.utils.compile_cache import setup_persistent_cache  # noqa: E402

setup_persistent_cache(
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tests", ".jax_cache")
)
