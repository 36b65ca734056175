"""Planned-adhesion colony step: where do the ms go at bench scale?

The plain-path split (tools/probe_colony.py) can't see the production
path: bench's run_steps carries a BondPlan through the scan and the
adhesion pass accumulates through the frozen order + hybrid stale side
path. This probe scan-times, at the same colony:

  - run_steps (the production planned path, plan carried in the scan)
  - step with a FIXED plan (no per-step plan_changed_count / rebuild cond)
  - apply_adhesion with the fixed plan alone
  - plan_changed_count alone
  - build_bond_plan alone (the rebuild cost the scan pays on drift)

Usage: python tools/probe_planned.py [n] [sub]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from sph_tpu.engine.colony import bonded_colony
from sph_tpu.engine.step import run_steps, step
from sph_tpu.physics.adhesion import (
    apply_adhesion,
    build_bond_plan,
    plan_changed_count,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
SUB = int(sys.argv[2]) if len(sys.argv) > 2 else 30

state, params, genome = bonded_colony(
    N, neighbor_mode="dense", grid_dim=48, grid_cell_size=4.0,
    cell_capacity=16, max_splits_per_step=64, dense_k=2, use_pallas=True,
)
gd = genome.to_device()
plan = jax.jit(lambda s: build_bond_plan(s.bonds, s.capacity))(state)
print(f"n={N} bonds={int(jnp.sum(state.bonds.active))} "
      f"cap={state.bonds.capacity}", flush=True)


def scan_of(body, x, rounds=4):
    f = jax.jit(lambda x: jax.lax.scan(
        lambda c, _: (body(c), None), x, None, length=SUB)[0])
    out = f(x)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    best = 1e9
    for _i in range(rounds):
        t0 = time.perf_counter()
        out = f(x)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, (time.perf_counter() - t0) / SUB * 1000)
    return best


def timed(label, body, x=state):
    t = scan_of(body, x)
    print(f"{label:26s}: {t:7.3f} ms/step", flush=True)


# Production path: run_steps carries (state, plan) and rebuilds on drift.
f = jax.jit(lambda s: run_steps(s, params, gd, SUB))
out = f(state)
_ = float(jnp.sum(out.pos[0]))
best = 1e9
for _i in range(4):
    t0 = time.perf_counter()
    out = f(state)
    _ = float(jnp.sum(out.pos[0]))
    best = min(best, (time.perf_counter() - t0) / SUB * 1000)
print(f"{'run_steps (production)':26s}: {best:7.3f} ms/step", flush=True)

timed("step fixed-plan", lambda st: step(st, params, gd, bond_plan=plan))
timed("adhesion fixed-plan",
      lambda st: apply_adhesion(st, params, gd, plan=plan))
timed("plan_changed_count",
      lambda st: st.replace_fields(
          vel=st.vel + 1e-30 * plan_changed_count(st.bonds, plan)))
timed("build_bond_plan",
      lambda st: st.replace_fields(
          vel=st.vel.at[0, 0].add(
              1e-30 * build_bond_plan(st.bonds, st.capacity).perm[0])))
