"""Profiling utilities smoke test (SURVEY §5.1)."""

import numpy as np


def test_step_breakdown_reports_phases(tmp_path):
    from sph_tpu.sph.dense import make_dense_spec, pack
    from sph_tpu.sph.scenes import dam_break_2d
    from sph_tpu.utils.profiling import step_breakdown

    state, params = dam_break_2d(n_target=200)
    params = params.replace(dense_k=4, cell_factor=1.2)
    spec = make_dense_spec(params, k=4, cell_factor=1.2)
    d = pack(state, params, spec)
    bd = step_breakdown(d, params, spec, n=1, sub=2)
    for key in ("grid_build_ms", "density_ms", "force_ms", "integrate_ms",
                "rebin_ms", "total_ms"):
        assert key in bd and np.isfinite(bd[key]) and bd[key] >= 0


def test_trace_writes_profile(tmp_path):
    import jax.numpy as jnp

    from sph_tpu.utils.profiling import trace

    with trace(str(tmp_path)):
        _ = jnp.sum(jnp.ones((128, 128)) * 2.0)
    # A trace directory with at least one artifact appears.
    import os

    found = any(files for _, _, files in os.walk(tmp_path))
    assert found
