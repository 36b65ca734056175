"""Contact-pass sub-phase split at a 1M bonded colony: where do the
~82 ms go? (round-4; scan-timed like tools/probe_colony.py).

Phases: cell-id+payload sort, rank/slot bookkeeping (incl. the slot_of
scatter), expand placement, Pallas sweep, gather_back, full contact.

Usage: python tools/probe_contact1m.py [n]
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from sph_tpu.engine.colony import bonded_colony
from sph_tpu.ops.pallas.expand import expand_rows
from sph_tpu.physics.contact_dense import (
    FIELD_FILLS, OCC_FILL, _cell_ids, _rank_and_slots, _sort_with_payload,
    contact_forces_dense, gather_back, make_contact_spec,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
SUB = 20
state, params, genome = bonded_colony(
    N, neighbor_mode="dense", grid_dim=48, grid_cell_size=4.0,
    cell_capacity=16, max_splits_per_step=64, dense_k=2, use_pallas=True,
)
spec = make_contact_spec(params, k=params.dense_k,
                         cell_factor=params.dense_cell_factor)
print(f"n={N} spec={spec.shape()} slots={spec.slots} k={spec.k}",
      flush=True)
fills = FIELD_FILLS + (OCC_FILL,)


def timed(body, x, rounds=4):
    f = jax.jit(lambda x: jax.lax.scan(
        lambda c, _: (body(c), None), x, None, length=SUB)[0])
    out = f(x)
    _ = jax.block_until_ready(out)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1]))
    best = 1e9
    for _i in range(rounds):
        t0 = time.perf_counter()
        out = f(x)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1]))
        best = min(best, (time.perf_counter() - t0) / SUB * 1000)
    return best


# Pre-materialize the sorted columns once for downstream phase timings.
@jax.jit
def presort(st):
    cols, flat, fits, overflow, slot_of, _env = _sort_with_payload(st, spec)
    return jnp.stack(cols, axis=1), flat, fits, slot_of


rows, flat, fits, slot_of = presort(state)
rows = jax.block_until_ready(rows)

def ph_sort(st):
    cols, flat, fits, overflow, slot_of, _env = _sort_with_payload(st, spec)
    return st.replace_fields(pos=st.pos + 1e-30 * (
        cols[0][:, None] * 0 + flat[:, None].astype(jnp.float32) * 0
        + slot_of[:, None].astype(jnp.float32) * 0))

def ph_cid_sort_only(st):
    cid = _cell_ids(st, spec)
    out = jax.lax.sort(
        [cid, jnp.arange(st.capacity, dtype=jnp.int32),
         st.pos[:, 0], st.pos[:, 1], st.pos[:, 2],
         st.vel[:, 0], st.vel[:, 1], st.vel[:, 2],
         st.ang_vel[:, 0], st.ang_vel[:, 1], st.ang_vel[:, 2],
         st.radius, jnp.ones(st.capacity, jnp.float32)],
        num_keys=1, is_stable=True)
    return st.replace_fields(pos=st.pos + 1e-30 * out[2][:, None])

def ph_expand(args):
    rows, flat, fits = args
    out, _ = expand_rows(rows, flat, fits, fills, spec.slots)
    return (rows + 1e-30 * out[0, :rows.shape[0], None], flat, fits)

def ph_contact_full(st):
    f, t, _o = contact_forces_dense(st, params)
    return st.replace_fields(vel=st.vel + 1e-30 * f)

def ph_sweep_and_gather(st):
    # full contact minus the pack: not separable without surgery; instead
    # time full and subtract the pack phases.
    return st

print(f"contact full  : {timed(ph_contact_full, state):8.3f} ms", flush=True)
print(f"pack sort+rank: {timed(ph_sort, state):8.3f} ms", flush=True)
print(f"  cid+sort    : {timed(ph_cid_sort_only, state):8.3f} ms", flush=True)
print(f"expand place  : {timed(ph_expand, (rows, flat, fits)):8.3f} ms",
      flush=True)
