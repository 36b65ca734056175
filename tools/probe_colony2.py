"""Sub-phase probe inside the two hottest colony passes at 100k:
contact (pack / sweep / unpack) and filter_bonds (segment scatters vs row
gathers). Scan-timed like tools/probe_colony.py."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from sph_tpu.engine.colony import bonded_colony
from sph_tpu.physics.contact_dense import (
    _pack_args, contact_pair_terms, make_contact_spec,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 102400
SUB = 60
state, params, genome = bonded_colony(
    N, neighbor_mode="dense", grid_dim=48, grid_cell_size=4.0,
    cell_capacity=16, max_splits_per_step=64, dense_k=2, use_pallas=True,
)
spec = make_contact_spec(params, k=params.dense_k,
                         cell_factor=params.dense_cell_factor)
print("spec:", spec.shape(), "slots:", spec.slots, flush=True)


def scan_of(body, x, rounds=5):
    f = jax.jit(lambda x: jax.lax.scan(
        lambda c, _: (body(c), None), x, None, length=SUB)[0])
    out = f(x)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1]))
    best = 1e9
    for _i in range(rounds):
        t0 = time.perf_counter()
        out = f(x)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1]))
        best = min(best, (time.perf_counter() - t0) / SUB * 1000)
    return best


# --- contact sub-phases (state -> state maps) ---
def ph_pack(st):
    fields, occ, slot_of, ov = _pack_args(st, spec)
    return st.replace_fields(vel=st.vel + 1e-30 * occ.reshape(-1)[0])


def ph_pack_sweep(st):
    fields, occ, slot_of, ov = _pack_args(st, spec)
    from sph_tpu.ops.pallas.contact import contact_sweep_pallas
    pair = lambda *a: contact_pair_terms(params, *a)  # noqa: E731
    comps = contact_sweep_pallas(fields, occ, spec, pair, ncomp=6)
    return st.replace_fields(vel=st.vel + 1e-30 * comps[0].reshape(-1)[0])


def ph_full_contact(st):
    from sph_tpu.physics.contact_dense import contact_forces_dense
    f, t, o = contact_forces_dense(st, params, spec)
    return st.replace_fields(vel=st.vel + 1e-30 * f)


print(f"contact pack       : {scan_of(ph_pack, state):7.3f} ms", flush=True)
print(f"contact pack+sweep : {scan_of(ph_pack_sweep, state):7.3f} ms",
      flush=True)
print(f"contact full       : {scan_of(ph_full_contact, state):7.3f} ms",
      flush=True)


# --- filter_bonds sub-phases ---
b = state.bonds
B = b.capacity
NN = state.capacity
print(f"bond cap B={B}", flush=True)


def ph_fb_dist(st):
    bb = st.bonds
    ia = jnp.clip(bb.slot_a, 0, NN - 1)
    ib = jnp.clip(bb.slot_b, 0, NN - 1)
    ptbl = jnp.concatenate(
        [st.pos, jnp.zeros((NN, 5), jnp.float32)], axis=1)
    dist = jnp.linalg.norm(ptbl[ib][:, :3] - ptbl[ia][:, :3], axis=-1)
    return st.replace_fields(vel=st.vel + 1e-30 * dist[0])


def ph_fb_segments(st):
    bb = st.bonds
    ia = jnp.clip(bb.slot_a, 0, NN - 1)
    ib = jnp.clip(bb.slot_b, 0, NN - 1)
    elig = bb.active
    ns = NN * 3
    n_keys = 2 * ns + 1
    key_a = jnp.where(elig, ia * 3 + bb.zone_a, n_keys - 1)
    key_b = jnp.where(elig, ns + ib * 3 + bb.zone_b, n_keys - 1)
    keys = jnp.concatenate([key_a, key_b])
    d2 = jnp.concatenate([bb.rest_length_cache
                          if hasattr(bb, 'rest_length_cache')
                          else jnp.zeros(B), jnp.zeros(B)]) \
        if False else jnp.concatenate(
            [jnp.abs(st.pos[ia][:, 0]), jnp.abs(st.pos[ib][:, 0])])
    m = jax.ops.segment_min(d2, keys, num_segments=n_keys)
    return st.replace_fields(vel=st.vel + 1e-30 * m[0])


def ph_fb_gather(st):
    bb = st.bonds
    ia = jnp.clip(bb.slot_a, 0, NN - 1)
    ib = jnp.clip(bb.slot_b, 0, NN - 1)
    elig = bb.active
    ns = NN * 3
    n_keys = 2 * ns + 1
    key_a = jnp.where(elig, ia * 3 + bb.zone_a, n_keys - 1)
    key_b = jnp.where(elig, ns + ib * 3 + bb.zone_b, n_keys - 1)
    keys = jnp.concatenate([key_a, key_b])
    stats = jnp.zeros((n_keys, 8), jnp.float32) + st.pos[0, 0]
    g = stats[keys]
    return st.replace_fields(vel=st.vel + 1e-30 * g[0, 0])


def ph_fb_full(st):
    from sph_tpu.biology.bonds import filter_bonds
    return st.replace_fields(bonds=filter_bonds(st))


print(f"fb dist gathers    : {scan_of(ph_fb_dist, state):7.3f} ms",
      flush=True)
print(f"fb one segment_min : {scan_of(ph_fb_segments, state):7.3f} ms",
      flush=True)
print(f"fb one row gather  : {scan_of(ph_fb_gather, state):7.3f} ms",
      flush=True)
print(f"fb full            : {scan_of(ph_fb_full, state):7.3f} ms",
      flush=True)
