"""Measure the colony contact sweep on TPU across YB (row-block height)
values with the per-x-chunk skip in place. Monkeypatches _pick_yb."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import sph_tpu.ops.pallas.contact as PC
from sph_tpu.engine.colony import bonded_colony
from sph_tpu.engine.step import step as full_step

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
    from sph_tpu.physics.contact_dense import contact_forces_dense
    f, t, _o = contact_forces_dense(st, params)
    return st.replace_fields(vel=st.vel + 1e-30 * f,
                             ang_vel=st.ang_vel + 1e-30 * t)


def ph_full(st):
    return full_step(st, params, gd)


orig = PC._pick_yb
for yb in (8, 16, 24):
    PC._pick_yb = lambda spec, nf, ncomp, yb=yb: yb
    tc = scan_of(ph_contact, state)
    tf = scan_of(ph_full, state)
    print(f"YB={yb:2d}: contact {tc:7.3f} ms  full {tf:7.3f} ms "
          f"({1000.0 / tf:6.1f} steps/s)", flush=True)
PC._pick_yb = orig
