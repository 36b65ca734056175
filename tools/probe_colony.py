"""Colony-step phase probe at bench scale: scan-timed per-phase ms for the
contact/biology regime (same technique as tools/probe256.py — each phase is
a state→state map iterated inside one lax.scan dispatch so the ~27-30 ms
relay dispatch overhead amortizes away).

Usage: python tools/probe_colony.py [n]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from sph_tpu.biology.bonds import filter_bonds, update_bond_zones
from sph_tpu.biology.division import process_pending_splits, queue_splits
from sph_tpu.engine.colony import bonded_colony
from sph_tpu.engine.step import step
from sph_tpu.physics.adhesion import apply_adhesion
from sph_tpu.physics.contact_dense import contact_forces_dense
from sph_tpu.physics.integrate import update_motion, update_rotation

N = int(sys.argv[1]) if len(sys.argv) > 1 else 102400
SUB = 60
state, params, genome = bonded_colony(
    N, neighbor_mode="dense", grid_dim=48, grid_cell_size=4.0,
    cell_capacity=16, max_splits_per_step=64, dense_k=2, use_pallas=True,
)
gd = genome.to_device()


def scan_of(body, x, rounds=5):
    f = jax.jit(lambda x: jax.lax.scan(
        lambda c, _: (body(c), None), x, None, length=SUB)[0])
    out = f(x)
    _ = float(jnp.sum(out.pos[0]))
    best = 1e9
    for _i in range(rounds):
        t0 = time.perf_counter()
        out = f(x)
        _ = float(jnp.sum(out.pos[0]))
        best = min(best, (time.perf_counter() - t0) / SUB * 1000)
    return best


def ph_contact(st):
    f, t, _o = contact_forces_dense(st, params)
    return st.replace_fields(vel=st.vel + 1e-30 * f,
                             ang_vel=st.ang_vel + 1e-30 * t)


def ph_adhesion(st):
    return apply_adhesion(st, params, gd)


def ph_integrate(st):
    return update_rotation(update_motion(st, params), params)


def ph_division(st):
    st = process_pending_splits(st, params, gd)
    return queue_splits(st, params, gd)


def ph_zones(st):
    return st.replace_fields(bonds=update_bond_zones(st, params, gd))


def ph_filter(st):
    return st.replace_fields(bonds=filter_bonds(st))


def ph_full(st):
    return step(st, params, gd)


print(f"n={N} bonds={int(jnp.sum(state.bonds.active))} "
      f"cap={state.bonds.capacity}", flush=True)
for name, body in [("full step", ph_full), ("contact", ph_contact),
                   ("adhesion", ph_adhesion), ("integrate", ph_integrate),
                   ("division", ph_division), ("bond_zones", ph_zones),
                   ("filter_bonds", ph_filter)]:
    t = scan_of(body, state)
    print(f"{name:14s}: {t:7.3f} ms/step", flush=True)
