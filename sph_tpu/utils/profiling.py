"""Tracing / profiling utilities (SURVEY §5.1).

The reference has no profiling hooks at all (its only perf knob is
Application.targetFrameRate, ParticleSystemController.cs:213). Here:

- `trace(path)`: context manager around `jax.profiler` emitting a TensorBoard
  trace of whatever runs inside.
- `step_breakdown(...)`: per-phase wall times of the dense fluid step —
  grid/occupancy build, density pass, force pass, integrate, rebin — the
  exact "ms/step split: grid build vs force sum" the BASELINE metric asks
  for. Phases are timed by running each jitted piece to completion (a small
  scalar fetch forces execution; plain block_until_ready is unreliable
  through the axon relay).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace scope: view with TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _timed(fn, *args, n=5):
    red = jax.jit(lambda o: jnp.sum(jax.tree_util.tree_leaves(o)[0][..., :1]))
    out = fn(*args)
    _ = float(red(out))
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    _ = float(red(out))
    return (time.perf_counter() - t0) / n * 1000.0, out


def step_breakdown(dstate, params, spec, n=5) -> dict:
    """Per-phase ms for one dense fluid step at the current state."""
    from sph_tpu.ops.pallas.fluid import (
        accel_pallas,
        density_pallas,
        tile_occupancy,
    )
    from sph_tpu.sph.dense import _integrate, rebin, rebin_vmax
    from sph_tpu.sph.model import eos_pressure

    out = {}
    out["grid_build_ms"], _ = _timed(
        jax.jit(lambda d: tile_occupancy(d.occ, spec)), dstate, n=n
    )
    out["density_ms"], rho = _timed(
        jax.jit(lambda d: density_pallas(d.px, d.py, d.pz, d.occ, params, spec)),
        dstate, n=n,
    )
    rho = jnp.where(dstate.occ > 0.5, jnp.maximum(rho, 1e-6),
                    params.rest_density)
    prs = jnp.where(dstate.occ > 0.5, eos_pressure(rho, params), 0.0)
    d2 = dstate.replace_fields(rho=rho, prs=prs)
    out["force_ms"], acc = _timed(
        jax.jit(lambda d: accel_pallas(d, d.prs / (d.rho * d.rho), params, spec)),
        d2, n=n,
    )
    vmax = rebin_vmax(params, spec)
    out["integrate_ms"], moved = _timed(
        jax.jit(lambda d: _integrate(d, acc[0], acc[1], acc[2], params, vmax)),
        d2, n=n,
    )
    if params.use_pallas:
        from sph_tpu.ops.pallas.rebin import rebin_pallas as _rebin
    else:
        _rebin = rebin
    out["rebin_ms"], _ = _timed(
        jax.jit(lambda d: _rebin(d, moved[0], moved[1], moved[2], moved[3],
                                 moved[4], moved[5], params, spec)),
        d2, n=n,
    )
    out["rebin_amortized_ms"] = out["rebin_ms"] / max(params.rebin_every, 1)
    out["total_ms"] = (
        out["grid_build_ms"] + out["density_ms"] + out["force_ms"]
        + out["integrate_ms"] + out["rebin_amortized_ms"]
    )
    return {k: round(v, 3) for k, v in out.items()}
