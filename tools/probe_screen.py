"""Isolate the contact-sweep screen cost at a settled 100k colony.

Times contact_forces_dense under combinations of (screen on/off,
pair math real/zero) by monkeypatching, to split the 'contact' phase into
pack + screen + (skipped) sweep + unpack.

Usage: python tools/probe_screen.py [n]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import sph_tpu.physics.contact_dense as cd
from sph_tpu.engine.colony import bonded_colony

N = int(sys.argv[1]) if len(sys.argv) > 1 else 102400
SUB = 60
state, params, genome = bonded_colony(
    N, neighbor_mode="dense", grid_dim=48, grid_cell_size=4.0,
    cell_capacity=16, max_splits_per_step=64, dense_k=2, use_pallas=True,
)


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


def contact_body(st):
    f, t, _o = cd.contact_forces_dense(st, params)
    return st.replace_fields(vel=st.vel + 1e-30 * f,
                             ang_vel=st.ang_vel + 1e-30 * t)


def pack_only(st):
    spec = cd.make_contact_spec(params, k=params.dense_k,
                                cell_factor=params.dense_cell_factor)
    fields, occ, slot_of, overflow = cd._pack_args(st, spec)
    fold = fields[0][0, 0, 0] + occ[0, 0, 0]
    return st.replace_fields(vel=st.vel + 1e-30 * fold)


real_pair = cd.contact_pair_terms
real_screen = cd.contact_screen


def zero_pair(params, *a):
    z = jnp.zeros_like(a[0])
    return z, z, z, z, z, z


def neg_screen(params, cx, cy, cz, crad, qx, qy, qz, qrad):
    return jnp.full_like(cx, -1.0)


label = [
    ("full (screen+pair)", real_screen, real_pair),
    ("screen, zero pair", real_screen, zero_pair),
    ("forced-skip (const -1)", neg_screen, real_pair),
    ("no screen (None)", None, real_pair),
]
print(f"n={N}", flush=True)
t = scan_of(pack_only, state)
print(f"{'pack only':24s}: {t:7.3f} ms/step", flush=True)
for name, scr, pr in label:
    cd.contact_pair_terms = pr
    if scr is None:
        # Route around the screen: patch contact_screen to None sentinel is
        # not possible (it's called via lambda); instead patch
        # contact_forces_dense's screen closure by patching contact_screen
        # with a marker the sweep treats as disabled. Simpler: temporarily
        # patch the pallas entry to ignore screen_fn.
        import sph_tpu.ops.pallas.contact as pc

        orig = pc.contact_sweep_pallas

        def no_screen(fields, occ, spec, pair_fn, ncomp=6, screen_fn=None):
            return orig(fields, occ, spec, pair_fn, ncomp=ncomp,
                        screen_fn=None)

        pc.contact_sweep_pallas = no_screen
        # contact_forces_dense imports inside the function, so the patch
        # takes effect for new traces.
        t = scan_of(contact_body, state)
        pc.contact_sweep_pallas = orig
    else:
        cd.contact_screen = scr
        t = scan_of(contact_body, state)
        cd.contact_screen = real_screen
    cd.contact_pair_terms = real_pair
    print(f"{name:24s}: {t:7.3f} ms/step", flush=True)
