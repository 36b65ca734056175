"""Resident-window engagement + speed at a settled bonded colony.

Times run_steps (classic per-step pack) vs run_steps_resident on the same
state, and reports the resident gate's verdict on the first step so a
silently-always-classic window is visible.

Usage: python tools/probe_resident.py [n] [rest_length] [k]

rest_length < 2.0 (the contact reach) builds a COMPRESSED colony — the
high-occupancy regime resident stepping targets (slots/N → ~1, contacts
firing everywhere, BASELINE 'resident' analysis / VERDICT r4 weak #5).
Default 2.96 (the reference genome) reproduces the settled-regime loss.
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from sph_tpu.engine.colony import bonded_colony
from sph_tpu.engine.config import reference_genome
from sph_tpu.engine.step import run_steps
from experiments.resident import (
    drift_margin,
    make_contact_spec,
    pack_resident,
    resident_gate,
    run_steps_resident,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 102400
REST = float(sys.argv[2]) if len(sys.argv) > 2 else 2.96
K = int(sys.argv[3]) if len(sys.argv) > 3 else 2
SUB = 60
g0 = reference_genome()
gen = type(g0)((dataclasses.replace(
    g0.modes[0], adhesion_rest_length=REST),))
state, params, genome = bonded_colony(
    N, genome=gen, neighbor_mode="dense", grid_dim=48, grid_cell_size=4.0,
    cell_capacity=16, max_splits_per_step=64, dense_k=K, use_pallas=True,
)
gd = genome.to_device()
spec = make_contact_spec(params, k=params.dense_k,
                         cell_factor=params.dense_cell_factor)

gate = jax.jit(lambda s: resident_gate(s, params, gd, params.dt))(state)
cache = jax.jit(lambda s: pack_resident(s, gd, spec))(state)
print(f"n={N} bonds={int(jnp.sum(state.bonds.active))} "
      f"gate={bool(gate)} pack_overflow={int(cache.overflow)} "
      f"margin={drift_margin(params, spec):.4f}", flush=True)


def timed(fn, label):
    f = jax.jit(lambda s: fn(s, params, gd, SUB))
    out = f(state)
    _ = float(jnp.sum(out.pos[0]))
    best = 1e9
    for _i in range(5):
        t0 = time.perf_counter()
        out = f(state)
        _ = float(jnp.sum(out.pos[0]))
        best = min(best, (time.perf_counter() - t0) / SUB * 1000)
    print(f"{label:10s}: {best:7.3f} ms/step "
          f"({1000.0 / best:7.1f} steps/s)", flush=True)
    return out


a = timed(run_steps, "classic")
b = timed(run_steps_resident, "resident")
na = int(a.active_count)
dp = float(jnp.abs(a.pos[:na] - b.pos[:na]).max())
dv = float(jnp.abs(a.vel[:na] - b.vel[:na]).max())
print(f"equivalence over {SUB} steps: max|dpos|={dp:.3e} max|dvel|={dv:.3e} "
      f"act {na}=={int(b.active_count)} "
      f"bonds {int(jnp.sum(a.bonds.active))}=={int(jnp.sum(b.bonds.active))}",
      flush=True)
