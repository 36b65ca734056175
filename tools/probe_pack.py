"""Pack-cost decomposition for the dense contact layout at a 100k colony.

The kernel-floor probe showed the sweep kernel itself costs ~2 ms — the
remaining ~7 ms of the contact phase is _pack_args. Variants (all outputs
folded into the carry so nothing DCEs):

  pack (shipped)   : argsort + rank + 1 wide gather + 11 column scatters
  argsort only     : cid + argsort + rank
  gather only      : + the [N,11] wide-row gather
  row scatter      : one [N,11] row scatter into [slots+1, 11], then
                     column slices reshaped to [Z,Y,L]
  no-init scatter  : column scatters into zeros-shaped buffers reused from
                     the carry (tests whether the jnp.full init is the cost)

Usage: python tools/probe_pack.py [n]
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
spec = cd.make_contact_spec(params, k=params.dense_k,
                            cell_factor=params.dense_cell_factor)
print(f"n={N} slots={spec.slots} shape={spec.shape()}", flush=True)


def scan_of(body, rounds=5):
    f = jax.jit(lambda x: jax.lax.scan(
        lambda c, _: (body(c), None), x, None, length=SUB)[0])
    out = f(state)
    _ = float(jnp.sum(out.pos[0]))
    best = 1e9
    for _i in range(rounds):
        t0 = time.perf_counter()
        out = f(state)
        _ = float(jnp.sum(out.pos[0]))
        best = min(best, (time.perf_counter() - t0) / SUB * 1000)
    return best


def fold(st, arrays):
    s = jnp.float32(0)
    for a in arrays:
        s = s + jnp.sum(a[..., :1].astype(jnp.float32)) * 1e-30
    return st.replace_fields(vel=st.vel + s)


def ph_pack_full(st):
    fields, occ, slot_of, ovf = cd._pack_args(st, spec)
    return fold(st, list(fields) + [occ, slot_of[None]])


def _sort_part(st):
    Ncap = st.capacity
    alive = jnp.arange(Ncap) < st.active_count
    org = jnp.asarray(spec.origin, jnp.float32)
    dims = jnp.asarray((spec.nx, spec.ny, spec.nz), jnp.int32)
    cc = jnp.clip(((st.pos - org) / spec.cell).astype(jnp.int32),
                  1, dims - 2)
    ix, iy, iz = cc[:, 0], cc[:, 1], cc[:, 2]
    cid = (iz * spec.ny + iy) * spec.nx_pad + ix
    cid = jnp.where(alive, cid,
                    jnp.int32(spec.nz * spec.ny * spec.nx_pad))
    order = jnp.argsort(cid)
    cid_s = cid[order]
    i = jnp.arange(Ncap)
    is_start = jnp.concatenate([jnp.ones(1, bool), cid_s[1:] != cid_s[:-1]])
    starts = jax.lax.cummax(jnp.where(is_start, i, 0))
    rank = i - starts
    fits = alive[order] & (rank < spec.k)
    flat = jnp.where(fits, cid_s * spec.k + rank, spec.slots)
    return order, flat, fits


def ph_argsort(st):
    order, flat, fits = _sort_part(st)
    return fold(st, [order[None].astype(jnp.float32),
                     flat[None].astype(jnp.float32)])


def ph_gather(st):
    order, flat, fits = _sort_part(st)
    Ncap = st.capacity
    tbl = jnp.concatenate(
        [st.pos, st.vel, st.ang_vel, st.radius[:, None],
         jnp.ones((Ncap, 1), jnp.float32)], axis=1)
    sorted_rows = tbl[order]
    return fold(st, [sorted_rows, flat[None].astype(jnp.float32)])


def ph_row_scatter(st):
    order, flat, fits = _sort_part(st)
    Ncap = st.capacity
    tbl = jnp.concatenate(
        [st.pos, st.vel, st.ang_vel, st.radius[:, None],
         jnp.ones((Ncap, 1), jnp.float32)], axis=1)
    sorted_rows = tbl[order]
    fills = jnp.asarray(cd.FIELD_FILLS + (cd.OCC_FILL,), jnp.float32)
    base = jnp.broadcast_to(fills, (spec.slots + 1, 11))
    rows = jnp.where(fits[:, None], sorted_rows, fills)
    table = base.at[flat].set(rows)
    outs = [table[:spec.slots, c].reshape(spec.shape()) for c in range(11)]
    return fold(st, outs)


print(f"{'pack (shipped)':16s}: {scan_of(ph_pack_full):7.3f} ms/step",
      flush=True)
print(f"{'argsort+rank':16s}: {scan_of(ph_argsort):7.3f} ms/step",
      flush=True)
print(f"{'+ wide gather':16s}: {scan_of(ph_gather):7.3f} ms/step",
      flush=True)
print(f"{'row scatter':16s}: {scan_of(ph_row_scatter):7.3f} ms/step",
      flush=True)


def ph_stacked_scatter(st):
    """ONE scatter into [11, slots+1] (fields on sublanes, slots on lanes):
    each descriptor writes an 11-row column — 2 sublane-tile RMWs instead
    of 11 independent 1-lane scatters."""
    order, flat, fits = _sort_part(st)
    Ncap = st.capacity
    tbl = jnp.concatenate(
        [st.pos, st.vel, st.ang_vel, st.radius[:, None],
         jnp.ones((Ncap, 1), jnp.float32)], axis=1)
    sorted_rows = tbl[order]
    fills = jnp.asarray(cd.FIELD_FILLS + (cd.OCC_FILL,), jnp.float32)
    base = jnp.broadcast_to(fills[:, None], (11, spec.slots + 1))
    rows = jnp.where(fits[:, None], sorted_rows, fills).T   # [11, N]
    table = base.at[:, flat].set(rows)
    outs = [table[c, :spec.slots].reshape(spec.shape()) for c in range(11)]
    return fold(st, outs)


def ph_init_only(st):
    outs = [jnp.full(spec.slots + 1, f, jnp.float32) + st.vel[0, 0] * 0
           for f in cd.FIELD_FILLS + (cd.OCC_FILL,)]
    return fold(st, outs)


print(f"{'stacked scatter':16s}: {scan_of(ph_stacked_scatter):7.3f} ms/step",
      flush=True)
print(f"{'init writes only':16s}: {scan_of(ph_init_only):7.3f} ms/step",
      flush=True)


def _rows16(st, order, fits):
    Ncap = st.capacity
    tbl = jnp.concatenate(
        [st.pos, st.vel, st.ang_vel, st.radius[:, None],
         jnp.ones((Ncap, 1), jnp.float32),
         jnp.zeros((Ncap, 5), jnp.float32)], axis=1)     # [N, 16]
    fills = jnp.asarray(
        cd.FIELD_FILLS + (cd.OCC_FILL,) + (0.0,) * 5, jnp.float32)
    return jnp.where(fits[:, None], tbl[order], fills), fills


def ph_row16_scatter(st):
    """ONE row scatter of 64-byte (16-lane, vreg-register-aligned) rows."""
    order, flat, fits = _sort_part(st)
    rows, fills = _rows16(st, order, fits)
    base = jnp.broadcast_to(fills, (spec.slots + 1, 16))
    table = base.at[flat].set(rows)
    outs = [table[:spec.slots, c].reshape(spec.shape()) for c in range(11)]
    return fold(st, outs)


def ph_row16_unique(st):
    """64B rows + unique_indices (drops routed to private scratch rows)."""
    order, flat, fits = _sort_part(st)
    Ncap = st.capacity
    rows, fills = _rows16(st, order, fits)
    flat_u = jnp.where(fits, flat, spec.slots + jnp.arange(Ncap))
    base = jnp.broadcast_to(fills, (spec.slots + Ncap, 16))
    table = base.at[flat_u].set(rows, unique_indices=True,
                                indices_are_sorted=False)
    outs = [table[:spec.slots, c].reshape(spec.shape()) for c in range(11)]
    return fold(st, outs)


def ph_col_unique(st):
    """Shipped column scatters, but declared unique (drop bucket moved to
    per-particle scratch so the declaration is true)."""
    order, flat, fits = _sort_part(st)
    Ncap = st.capacity
    tbl = jnp.concatenate(
        [st.pos, st.vel, st.ang_vel, st.radius[:, None],
         jnp.ones((Ncap, 1), jnp.float32)], axis=1)
    sorted_rows = tbl[order]
    flat_u = jnp.where(fits, flat, spec.slots + jnp.arange(Ncap))
    fills = cd.FIELD_FILLS + (cd.OCC_FILL,)

    def scatter(c):
        fill = fills[c]
        out = jnp.full(spec.slots + Ncap, fill, jnp.float32).at[flat_u].set(
            jnp.where(fits, sorted_rows[:, c], fill), unique_indices=True
        )
        return out[:spec.slots].reshape(spec.shape())

    return fold(st, [scatter(c) for c in range(11)])


print(f"{'row16 scatter':16s}: {scan_of(ph_row16_scatter):7.3f} ms/step",
      flush=True)
print(f"{'row16 unique':16s}: {scan_of(ph_row16_unique):7.3f} ms/step",
      flush=True)
print(f"{'col unique':16s}: {scan_of(ph_col_unique):7.3f} ms/step",
      flush=True)


def ph_sortpayload(st):
    """lax.sort carrying the 11 payload columns through the sort network
    instead of sorting (key, idx) then row-gathering."""
    Ncap = st.capacity
    alive = jnp.arange(Ncap) < st.active_count
    org = jnp.asarray(spec.origin, jnp.float32)
    dims = jnp.asarray((spec.nx, spec.ny, spec.nz), jnp.int32)
    cc = jnp.clip(((st.pos - org) / spec.cell).astype(jnp.int32),
                  1, dims - 2)
    cid = (cc[:, 2] * spec.ny + cc[:, 1]) * spec.nx_pad + cc[:, 0]
    cid = jnp.where(alive, cid,
                    jnp.int32(spec.nz * spec.ny * spec.nx_pad))
    cols = [st.pos[:, 0], st.pos[:, 1], st.pos[:, 2],
            st.vel[:, 0], st.vel[:, 1], st.vel[:, 2],
            st.ang_vel[:, 0], st.ang_vel[:, 1], st.ang_vel[:, 2],
            st.radius, jnp.ones(Ncap, jnp.float32)]
    out = jax.lax.sort([cid] + cols, num_keys=1, is_stable=True)
    return fold(st, [o[None].astype(jnp.float32) for o in out])


print(f"{'sort w/ payload':16s}: {scan_of(ph_sortpayload):7.3f} ms/step",
      flush=True)
