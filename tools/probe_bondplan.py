"""Pin the planned-adhesion crossover (VERDICT r4 weak #4 / next #5).

Sweeps colony sizes so the bond-table CAPACITY (the static shape
`use_bond_plan` keys on, engine/step.py) crosses 8k -> 512k, and times the
FULL colony step with adhesion_plan forced "off" (plain segment_sum
accumulate) vs "on" (frozen-window planned accumulate + hybrid stale
side path) — scan-timed on the real chip so the ~27-30 ms relay dispatch
overhead amortizes (CLAUDE.md).

The decision is per-step cost including the plan's amortized rebuild:
run_steps rebuilds only on drift (division steps), and this settled-colony
probe has none, matching the regime where the threshold matters (the bench
ladder's settled colonies; growing colonies pay the hybrid side path
either way).

Usage: python tools/probe_bondplan.py [sub] [rounds]
Writes one JSON line per size: {n, bonds, bond_capacity, ms_plain, ms_plan}.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from sph_tpu.engine.colony import bonded_colony
from sph_tpu.engine.step import run_steps

SUB = int(sys.argv[1]) if len(sys.argv) > 1 else 45
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
# Colony sizes chosen so steady-state bond counts straddle the old 65536
# guess: ~1.67 bonds/cell settled (BASELINE: 16,329 @ 10k cells).
SIZES = [10_000, 20_000, 40_000, 80_000, 102_400, 160_000, 320_000, 640_000]

print(json.dumps({"backend": jax.default_backend(), "sub": SUB}), flush=True)

for n in SIZES:
    state, params, genome = bonded_colony(
        n, neighbor_mode="dense", dense_k=2, use_pallas=True,
    )
    gd = genome.to_device()
    nb = int(jnp.sum(state.bonds.active))
    row = {"n": n, "bonds": nb, "bond_capacity": int(state.bonds.capacity)}
    for mode in ("off", "on"):
        p = params.replace(adhesion_plan=mode)
        f = jax.jit(lambda st: run_steps(st, p, gd, SUB))
        out = f(state)
        _ = float(jnp.sum(out.pos[0]))          # warm + fetch one scalar
        best = 1e9
        for _i in range(ROUNDS):
            t0 = time.perf_counter()
            out = f(state)
            _ = float(jnp.sum(out.pos[0]))
            best = min(best, (time.perf_counter() - t0) / SUB * 1000)
        row["ms_plain" if mode == "off" else "ms_plan"] = round(best, 3)
    row["plan_wins"] = row["ms_plan"] < row["ms_plain"]
    print(json.dumps(row), flush=True)
