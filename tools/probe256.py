"""Per-phase cost probe at 256k: time each phase inside a lax.scan (one
dispatch per measurement, scalar fetch) so relay dispatch overhead
amortizes away — unlike utils.profiling.step_breakdown, whose per-call
timings through the axon relay are dominated by dispatch.

NOTE: the relay overhead was remeasured at ~27-30 ms/call (round 3,
tools/probe_sub.py) — at SUB=60 that's ~0.5 ms of residual tax per
phase-step; do NOT size new probes off the old ~5 ms estimate
(CLAUDE.md mandates ≥45 substeps/dispatch).

Usage: python tools/probe256.py [n_target]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from sph_tpu.ops.pallas.fluid import accel_pallas, density_pallas, tile_occupancy
from sph_tpu.ops.pallas.rebin import rebin_pallas
from sph_tpu.sph.dense import (
    _integrate, make_dense_spec, make_dense_step, pack, rebin_vmax,
)
from sph_tpu.sph.model import eos_pressure
from sph_tpu.sph.scenes import dam_break_3d

N = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
SUB = 60   # >=45 substeps/dispatch (27-30 ms relay overhead)
state, params = dam_break_3d(n_target=N)
params = params.replace(cell_factor=1.25, dense_k=8, rebin_every=6,
                        use_pallas=True)
spec = make_dense_spec(params, k=8, cell_factor=1.25)
d = pack(state, params, spec)
step = make_dense_step(params, spec, substeps=SUB, donate=False)
d = step(d)  # settle + warm
print("N =", d.px.size, "K,C =", d.px.shape, "sc =", flush=True)


def scan_of(body, x):
    f = jax.jit(lambda x: jax.lax.scan(
        lambda c, _: (body(c), None), x, None, length=SUB)[0])
    out = f(x)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1]))
    best = 1e9
    for _i in range(6):
        t0 = time.perf_counter()
        out = f(x)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1]))
        best = min(best, (time.perf_counter() - t0) / SUB * 1000)
    return best


occ_t = tile_occupancy(d.occ, spec)
vmax = rebin_vmax(params, spec)


def dens(dd):
    rho = density_pallas(dd.px, dd.py, dd.pz, dd.occ, params, spec,
                         occ_t=occ_t)
    rho = jnp.where(dd.occ > 0.5, jnp.maximum(rho, 1e-6),
                    params.rest_density)
    return dd.replace_fields(rho=rho)


def dens_prs(dd):
    dd = dens(dd)
    return dd.replace_fields(
        prs=jnp.where(dd.occ > 0.5, eos_pressure(dd.rho, params), 0.0))


def force(dd):
    ax, ay, az = accel_pallas(dd, dd.prs / (dd.rho * dd.rho), params, spec,
                              occ_t=occ_t)
    return dd.replace_fields(vx=dd.vx + 1e-9 * ax, vy=dd.vy + 1e-9 * ay,
                             vz=dd.vz + 1e-9 * az)


def occ_pass(dd):
    t = tile_occupancy(dd.occ, spec)
    return dd.replace_fields(rho=dd.rho + 1e-30 * t.sum())


def integ(dd):
    ax = ay = az = jnp.zeros_like(dd.px)
    px, py, pz, vx, vy, vz, ncl = _integrate(dd, ax, ay, az, params, vmax)
    return dd.replace_fields(px=px, py=py, pz=pz, vx=vx, vy=vy, vz=vz)


def rb(dd):
    return rebin_pallas(dd, dd.px, dd.py, dd.pz, dd.vx, dd.vy, dd.vz,
                        params, spec)


full = scan_of(lambda dd: __import__("sph_tpu.sph.dense", fromlist=["x"])
               .dense_step(dd, params, spec), d)
print(f"full step          : {full:7.3f} ms/step", flush=True)
for name, body in [("density", dens), ("density+eos", dens_prs),
                   ("force(only)", force), ("tile_occupancy", occ_pass),
                   ("integrate", integ), ("rebin(every)", rb)]:
    if name == "force(only)":
        x = dens_prs(d)
    else:
        x = d
    t = scan_of(body, x)
    print(f"{name:19s}: {t:7.3f} ms/step", flush=True)
