"""Adhesion-pass sub-phase probe: where do the ~8 ms at a 100k bonded
colony go — the two wide-row endpoint gathers, the per-bond constraint
math, or the segment-sum scatter?

Each candidate is timed as a scan-chained state->state map (same relay
amortization as tools/probe_colony.py). The variants isolate one stage by
replacing the others with shape-identical dummies:

  gathers   : tbl[idx_a], tbl[idx_b] only, folded by a cheap sum
  math      : gathers replaced by static rows (same flops, no descriptors)
  segsum    : segment_sum of precomputed rows only
  segsum_sorted : same rows, ids pre-sorted host-side, indices_are_sorted
  full      : apply_adhesion as shipped

Usage: python tools/probe_adhesion.py [n]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from sph_tpu.engine.colony import bonded_colony
from sph_tpu.physics.adhesion import apply_adhesion, bond_deltas

N = int(sys.argv[1]) if len(sys.argv) > 1 else 102400
SUB = 60
state, params, genome = bonded_colony(
    N, neighbor_mode="dense", grid_dim=48, grid_cell_size=4.0,
    cell_capacity=16, max_splits_per_step=64, dense_k=2, use_pallas=True,
)
gd = genome.to_device()
b = state.bonds
B = b.capacity
cap = state.capacity
print(f"n={N} bonds={int(jnp.sum(b.active))} cap={B}", flush=True)

idx_a = jnp.clip(b.slot_a, 0, cap - 1)
idx_b = jnp.clip(b.slot_b, 0, cap - 1)
valid = b.active & (b.slot_a >= 0) & (b.slot_b >= 0)
seg_all = jnp.concatenate([jnp.where(valid, idx_a, cap),
                           jnp.where(valid, idx_b, cap)])
seg_sorted = jnp.sort(seg_all)
rows7 = jnp.ones((2 * B, 7), jnp.float32)


def scan_of(body, x, rounds=5):
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


def ph_full(st):
    return apply_adhesion(st, params, gd)


def ph_gathers(st):
    tbl = jnp.concatenate(
        [st.pos, st.vel, st.rot, st.mass[:, None],
         jnp.zeros((cap, 1), jnp.float32)], axis=1)
    ga, gb_ = tbl[idx_a], tbl[idx_b]
    fold = jnp.sum(ga, axis=0) + jnp.sum(gb_, axis=0)
    return st.replace_fields(vel=st.vel + 1e-30 * fold[:3])


def ph_segsum(st):
    r = rows7 + st.vel[0, 0]
    acc = jax.ops.segment_sum(r, seg_all, num_segments=cap + 1)[:cap]
    return st.replace_fields(vel=st.vel + 1e-30 * acc[:, :3])


def ph_segsum_sorted(st):
    r = rows7 + st.vel[0, 0]
    acc = jax.ops.segment_sum(
        r, seg_sorted, num_segments=cap + 1, indices_are_sorted=True
    )[:cap]
    return st.replace_fields(vel=st.vel + 1e-30 * acc[:, :3])


def ph_cumsum_diff(st):
    """Sorted-segment reduction as cumsum + boundary gather (N descriptors
    instead of 2B scatter descriptors)."""
    r = rows7 + st.vel[0, 0]
    cs = jnp.cumsum(r, axis=0)
    # boundary index per segment: last row with seg <= s, via searchsorted
    ends = jnp.searchsorted(seg_sorted, jnp.arange(cap), side="right")
    z = jnp.zeros((1, 7), jnp.float32)
    cs0 = jnp.concatenate([z, cs], axis=0)
    starts = jnp.searchsorted(seg_sorted, jnp.arange(cap), side="left")
    acc = cs0[ends] - cs0[starts]
    return st.replace_fields(vel=st.vel + 1e-30 * acc[:, :3])


def ph_math(st):
    """bond_deltas with gathers bypassed: run it on a state whose tables are
    tiny? Not separable without editing the fn — instead time deltas-only."""
    dv, dq = bond_deltas(st, params, gd)
    return st.replace_fields(vel=st.vel + 1e-30 * dv)


for name, body in [("full apply", ph_full), ("bond_deltas", ph_math),
                   ("gathers only", ph_gathers),
                   ("segsum only", ph_segsum),
                   ("segsum sorted", ph_segsum_sorted),
                   ("cumsum-diff", ph_cumsum_diff)]:
    t = scan_of(body, state)
    print(f"{name:14s}: {t:7.3f} ms/step", flush=True)


# --- Round-3 reduction candidates (sorted-order formulations) ---
perm = jnp.argsort(seg_all)
seg_s = seg_all[perm]
# Segment-run boundaries: last row index of each particle's run (cap rows
# with no bonds read the previous segment's total times 0 via the count
# mask). Host-side here; in the engine these live in the gated aux state.
last_of = jnp.searchsorted(seg_s, jnp.arange(cap), side="right") - 1
has_any = (jnp.searchsorted(seg_s, jnp.arange(cap), side="right")
           > jnp.searchsorted(seg_s, jnp.arange(cap), side="left"))
flags = jnp.concatenate(
    [jnp.ones(1, bool), seg_s[1:] != seg_s[:-1]])


def ph_perm_gather(st):
    r = rows7 + st.vel[0, 0]
    rs = r[perm]
    return st.replace_fields(vel=st.vel + 1e-30 * jnp.sum(rs, 0)[:3])


def ph_segscan(st):
    """Segmented inclusive scan (associative_scan over (flag, value)) +
    one N-row boundary gather — replaces the 2B-descriptor scatter."""
    r = rows7 + st.vel[0, 0]
    rs = r[perm]

    def comb(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb[:, None], vb, va + vb)

    _, cs = jax.lax.associative_scan(comb, (flags, rs))
    acc = cs[jnp.clip(last_of, 0, 2 * B - 1)]
    acc = jnp.where(has_any[:, None], acc, 0.0)
    return st.replace_fields(vel=st.vel + 1e-30 * acc[:, :3])


def ph_segscan_full(st):
    """segscan + the perm gather it needs per step (rows are produced in
    bond order)."""
    r = rows7 + st.vel[0, 0]
    rs = r[perm]

    def comb(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb[:, None], vb, va + vb)

    _, cs = jax.lax.associative_scan(comb, (flags, rs))
    acc = cs[jnp.clip(last_of, 0, 2 * B - 1)]
    acc = jnp.where(has_any[:, None], acc, 0.0)
    return st.replace_fields(vel=st.vel + 1e-30 * acc[:, :3])


for name, body in [("perm gather", ph_perm_gather),
                   ("segscan+gathN", ph_segscan_full)]:
    t = scan_of(body, state)
    print(f"{name:14s}: {t:7.3f} ms/step", flush=True)

# Correctness cross-check of the segscan formulation vs segment_sum.
r = jnp.arange(2 * B, dtype=jnp.float32)[:, None] * jnp.ones((1, 7))
want = jax.ops.segment_sum(r, seg_all, num_segments=cap + 1)[:cap]
rs = r[perm]


def comb(a, b):
    fa, va = a
    fb, vb = b
    return fa | fb, jnp.where(fb[:, None], vb, va + vb)


_, cs = jax.lax.associative_scan(comb, (flags, rs))
got = cs[jnp.clip(last_of, 0, 2 * B - 1)]
got = jnp.where(has_any[:, None], got, 0.0)
import numpy as np
np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
print("segscan == segment_sum: OK", flush=True)
