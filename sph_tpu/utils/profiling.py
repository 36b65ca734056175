"""Tracing / profiling utilities (SURVEY §5.1).

The reference has no profiling hooks at all (its only perf knob is
Application.targetFrameRate, ParticleSystemController.cs:213). Here:

- `trace(path)`: context manager around `jax.profiler` emitting a TensorBoard
  trace of whatever runs inside.
- `step_breakdown(...)`: per-phase wall times of the dense fluid step —
  grid/occupancy build, density pass, force pass, integrate, rebin — the
  exact "ms/step split: grid build vs force sum" the BASELINE metric asks
  for. Each phase is timed as a state→state map iterated `sub` times inside
  one `lax.scan` dispatch: the axon relay's per-dispatch overhead
  (~27-30 ms/call, tools/probe_sub.py) would otherwise dwarf every phase,
  and `block_until_ready` can return early through the tunnel — a small
  scalar fetch forces execution instead.
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


def _scan_timed(body, x, sub=30, rounds=4):
    """Best ms per body application, `sub` chained applications per
    dispatch (amortizes the relay's per-dispatch overhead to <1 ms)."""
    f = jax.jit(lambda x: jax.lax.scan(
        lambda c, _: (body(c), None), x, None, length=sub)[0])
    out = f(x)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1]))
    best = 1e9
    for _i in range(rounds):
        t0 = time.perf_counter()
        out = f(x)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1]))
        best = min(best, (time.perf_counter() - t0) / sub * 1000.0)
    return best, out


def step_breakdown(dstate, params, spec, n=4, sub=30) -> dict:
    """Per-phase ms for one dense fluid step at the current state. Phases
    are timed independently (each as a fixed-point-ish state map), so the
    sum can differ slightly from the fused full step."""
    from sph_tpu.ops.pallas.fluid import (
        accel_pallas,
        density_pallas,
        tile_occupancy,
    )
    from sph_tpu.sph.dense import _integrate, dense_step, rebin, rebin_vmax
    from sph_tpu.sph.model import eos_pressure

    vmax = rebin_vmax(params, spec)
    occ_t = tile_occupancy(dstate.occ, spec)

    def ph_occ(d):
        t = tile_occupancy(d.occ, spec)
        return d.replace_fields(rho=d.rho + 1e-30 * jnp.sum(t))

    def ph_density(d):
        rho = density_pallas(d.px, d.py, d.pz, d.occ, params, spec,
                             occ_t=occ_t)
        rho = jnp.where(d.occ > 0.5, jnp.maximum(rho, 1e-6),
                        params.rest_density)
        prs = jnp.where(d.occ > 0.5, eos_pressure(rho, params), 0.0)
        return d.replace_fields(rho=rho, prs=prs)

    def ph_force(d):
        ax, ay, az = accel_pallas(d, d.prs / (d.rho * d.rho), params, spec,
                                  occ_t=occ_t)
        return d.replace_fields(vx=d.vx + 1e-30 * ax, vy=d.vy + 1e-30 * ay,
                                vz=d.vz + 1e-30 * az)

    def ph_integrate(d):
        z = jnp.zeros_like(d.px)
        px, py, pz, vx, vy, vz, _ncl = _integrate(
            d, z, z, z, params, vmax)
        return d.replace_fields(px=px, py=py, pz=pz)

    def ph_rebin(d):
        if params.use_pallas:
            from sph_tpu.ops.pallas.rebin import rebin_pallas as _rb
        else:
            _rb = rebin
        return _rb(d, d.px, d.py, d.pz, d.vx, d.vy, d.vz, params, spec)

    out = {}
    d2 = ph_density(dstate)
    out["grid_build_ms"], _ = _scan_timed(ph_occ, dstate, sub, n)
    out["density_ms"], _ = _scan_timed(ph_density, dstate, sub, n)
    out["force_ms"], _ = _scan_timed(ph_force, d2, sub, n)
    out["integrate_ms"], _ = _scan_timed(ph_integrate, d2, sub, n)
    out["rebin_ms"], _ = _scan_timed(ph_rebin, d2, sub, n)
    out["rebin_amortized_ms"] = out["rebin_ms"] / max(params.rebin_every, 1)
    out["full_step_ms"], _ = _scan_timed(
        lambda d: dense_step(d, params, spec), dstate, sub, n)
    out["total_ms"] = out["full_step_ms"]
    out = {k: round(v, 3) for k, v in out.items()}
    out.update(_roofline(out, dstate, spec))
    return out


# v5e single-chip ceilings used to contextualize achieved rates: HBM
# ~819 GB/s (matches the 500-800 GB/s streaming measured through this
# relay), VPU f32 ≈ 6.8 TFLOP/s (8×128 lanes × 2 ALUs × 2 flops/FMA ×
# ~1.67 GHz — the pair sweeps are VPU-bound; the MXU's 197 bf16 TFLOP/s
# is not the relevant ceiling for them).
_HBM_GBPS = 819.0
_VPU_GFLOPS = 6800.0


def _roofline(ms: dict, dstate, spec) -> dict:
    """Analytic flop/byte counts per phase (same formulas the kernels
    declare via pl.CostEstimate) → achieved GFLOP/s, GB/s and % of the
    v5e ceilings. 'fast' then means 'near a hardware roof', not merely
    'above the 60M ps/s target' (VERDICT r3 #9)."""
    from sph_tpu.ops.pallas.fluid import _n_swept

    N0, K, C = dstate.occ.shape
    lanes = N0 * K * C
    sw = _n_swept(spec)
    nz = 2 if spec.stencil0 else 1
    # (flops/lane, bytes/lane) per phase. Pair passes: the CostEstimate
    # formulas (3 inputs × 3 blocks × nz reads + outputs); integrate: ~40
    # flops over 13 field r/w; rebin: 3 stages × (3 candidate reads + 1
    # write) of 7 fields; occupancy: one occ read, /sc write.
    est = {
        "grid_build": (1, 4 * (1 + 1 / 64)),
        "density": (16 * sw, 4 * (3 * 3 * nz + 1 + 2 * 1)),
        "force": (40 * sw + 2 * sw * 8, 4 * (3 * 8 * nz + 3 + 2 * 3)),
        "integrate": (40, 4 * 13 * 2),
        "rebin": (3 * 7 * 10, 4 * 3 * 7 * (3 + 1)),
    }
    out = {}
    for phase, (fl, by) in est.items():
        t = ms.get(f"{phase}_ms", 0.0)
        if t <= 0:
            continue
        gflops = lanes * fl / (t * 1e-3) / 1e9
        gbps = lanes * by / (t * 1e-3) / 1e9
        out[f"{phase}_gflops"] = round(gflops, 1)
        out[f"{phase}_gbps"] = round(gbps, 1)
        out[f"{phase}_pct_roof"] = round(
            100.0 * max(gflops / _VPU_GFLOPS, gbps / _HBM_GBPS), 1)
    return out
