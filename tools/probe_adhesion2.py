"""Sorted-formulation candidates for the adhesion pass.

The shipped pass costs 2 random B-row gathers + one 2B-row random
scatter-add (segment_sum). Every candidate here exploits one fact: while
the bond TABLE is settled (the filter_bonds fixed-point window), the
endpoint index vectors are frozen, so sort permutations of them can be
precomputed once and amortized. Candidates:

  baseline    : bond_deltas as shipped
  g2rand      : the two random endpoint gathers alone
  g2asc       : the same rows gathered in ascending index order
                (indices_are_sorted=True) — does sortedness help gathers?
  sortscatter : shipped deltas, but rows permuted to sorted segment order
                pre-scatter (adds a 2B random permute, removes scatter
                randomness; tests where the scatter cost lives)
  dual_full   : full dual-pass formulation — pair math evaluated twice,
                once in sort-by-A order (A-side ascending gather + sorted
                A-side segment_sum) and once in sort-by-B order; only the
                partner-side gather stays random. Checked vs baseline.

Usage: python tools/probe_adhesion2.py [n]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sph_tpu.engine.colony import bonded_colony
from sph_tpu.physics.adhesion import (
    accumulate_bond_deltas,
    bond_deltas,
    bond_pair_deltas,
    bond_spring_params,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 102400
SUB = 30
state, params, genome = bonded_colony(
    N, neighbor_mode="dense", max_splits_per_step=64, dense_k=2,
    use_pallas=True,
)
gd = genome.to_device()
b = state.bonds
B = b.capacity
cap = state.capacity
print(f"n={N} bonds={int(jnp.sum(b.active))} cap={B}", flush=True)

idx_a_h = np.asarray(b.slot_a).copy()
idx_b_h = np.asarray(b.slot_b).copy()
valid_h = np.asarray(b.active).copy() & (idx_a_h >= 0) & (idx_b_h >= 0)
idx_a_h = np.clip(idx_a_h, 0, cap - 1)
idx_b_h = np.clip(idx_b_h, 0, cap - 1)

# Frozen-window precomputes (would be computed on device once per bond-
# table change, gated exactly like filter_bonds).
perm_a = np.argsort(np.where(valid_h, idx_a_h, cap), kind="stable")
perm_b = np.argsort(np.where(valid_h, idx_b_h, cap), kind="stable")
sidx_a = jnp.asarray(idx_a_h[perm_a])
sidx_b = jnp.asarray(idx_b_h[perm_b])
perm_a = jnp.asarray(perm_a)
perm_b = jnp.asarray(perm_b)
idx_a = jnp.asarray(idx_a_h)
idx_b = jnp.asarray(idx_b_h)
valid = jnp.asarray(valid_h)

seg_all_h = np.concatenate([np.where(valid_h, idx_a_h, cap),
                            np.where(valid_h, idx_b_h, cap)])
perm2 = jnp.asarray(np.argsort(seg_all_h, kind="stable"))
seg_sorted = jnp.asarray(np.sort(seg_all_h))


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


def _tbl(st):
    return jnp.concatenate(
        [st.pos, st.vel, st.rot, st.mass[:, None],
         jnp.zeros((cap, 1), jnp.float32)], axis=1)


def ph_baseline(st):
    dv, dq = bond_deltas(st, params, gd)
    return st.replace_fields(vel=st.vel + 1e-30 * dv)


def ph_g2rand(st):
    tbl = _tbl(st)
    ga, gb_ = tbl[idx_a], tbl[idx_b]
    fold = jnp.sum(ga, axis=0) + jnp.sum(gb_, axis=0)
    return st.replace_fields(vel=st.vel + 1e-30 * fold[:3])


def ph_g2asc(st):
    tbl = _tbl(st)
    ga = jnp.take(tbl, sidx_a, axis=0, indices_are_sorted=True)
    gb_ = jnp.take(tbl, sidx_b, axis=0, indices_are_sorted=True)
    fold = jnp.sum(ga, axis=0) + jnp.sum(gb_, axis=0)
    return st.replace_fields(vel=st.vel + 1e-30 * fold[:3])


def _deltas_in(st, order):
    """Pair deltas with bond rows permuted to `order` (or None=table
    order). Returns (dv_a, dq_a, dv_b, dq_b, perm_bonds, perm_valid)."""
    bb = b if order is None else jax.tree_util.tree_map(
        lambda a: a[order], b)
    vv = valid if order is None else valid[order]
    ia = idx_a if order is None else idx_a[order]
    ib = idx_b if order is None else idx_b[order]
    rest, stiff, damp, astiff = bond_spring_params(bb, gd)
    tbl = _tbl(st)
    sorted_side = None
    if order is perm_a:
        ga = jnp.take(tbl, sidx_a, axis=0, indices_are_sorted=True)
        gb_ = tbl[ib]
    elif order is perm_b:
        ga = tbl[ia]
        gb_ = jnp.take(tbl, sidx_b, axis=0, indices_are_sorted=True)
    else:
        ga, gb_ = tbl[ia], tbl[ib]
    return bond_pair_deltas(
        bb, vv, rest, stiff, damp, astiff,
        ga[:, 0:3], ga[:, 3:6], ga[:, 6:10], ga[:, 10],
        gb_[:, 0:3], gb_[:, 3:6], gb_[:, 6:10], gb_[:, 10],
        params, params.dt,
    ), vv, ia, ib


def ph_sortscatter(st):
    (dv_a, dq_a, dv_b, dq_b), vv, ia, ib = _deltas_in(st, None)
    rows = jnp.concatenate([
        jnp.concatenate([dv_a, dq_a], axis=1),
        jnp.concatenate([dv_b, dq_b], axis=1),
    ])[perm2]
    acc = jax.ops.segment_sum(
        rows, seg_sorted, num_segments=cap + 1, indices_are_sorted=True
    )[:cap]
    return st.replace_fields(vel=st.vel + 1e-30 * acc[:, :3])


def ph_dual_full(st):
    (dv_a, dq_a, _, _), vv_a, _, _ = _deltas_in(st, perm_a)
    (_, _, dv_b, dq_b), vv_b, _, _ = _deltas_in(st, perm_b)
    rows_a = jnp.concatenate([dv_a, dq_a], axis=1)
    rows_b = jnp.concatenate([dv_b, dq_b], axis=1)
    seg_a = jnp.where(vv_a, sidx_a, cap)
    seg_b = jnp.where(vv_b, sidx_b, cap)
    acc = (
        jax.ops.segment_sum(rows_a, seg_a, num_segments=cap + 1,
                            indices_are_sorted=True)
        + jax.ops.segment_sum(rows_b, seg_b, num_segments=cap + 1,
                              indices_are_sorted=True)
    )[:cap]
    return st.replace_fields(vel=st.vel + 1e-30 * acc[:, :3])


# Correctness first: dual_full == baseline (allclose; accumulation order
# within a particle's A-side run is bond order in both).
dv0, dq0 = jax.jit(lambda s: bond_deltas(s, params, gd))(state)


def _dual(st):
    (dv_a, dq_a, _, _), vv_a, _, _ = _deltas_in(st, perm_a)
    (_, _, dv_b, dq_b), vv_b, _, _ = _deltas_in(st, perm_b)
    rows_a = jnp.concatenate([dv_a, dq_a], axis=1)
    rows_b = jnp.concatenate([dv_b, dq_b], axis=1)
    seg_a = jnp.where(vv_a, sidx_a, cap)
    seg_b = jnp.where(vv_b, sidx_b, cap)
    acc = (
        jax.ops.segment_sum(rows_a, seg_a, num_segments=cap + 1,
                            indices_are_sorted=True)
        + jax.ops.segment_sum(rows_b, seg_b, num_segments=cap + 1,
                              indices_are_sorted=True)
    )[:cap]
    return acc


acc1 = jax.jit(_dual)(state)
np.testing.assert_allclose(np.asarray(acc1[:, :3]), np.asarray(dv0),
                           rtol=1e-5, atol=1e-7)
np.testing.assert_allclose(np.asarray(acc1[:, 3:]), np.asarray(dq0),
                           rtol=1e-5, atol=1e-7)
print("dual_full == baseline: OK", flush=True)

for name, body in [("baseline", ph_baseline), ("g2rand", ph_g2rand),
                   ("g2asc", ph_g2asc), ("sortscatter", ph_sortscatter),
                   ("dual_full", ph_dual_full)]:
    t = scan_of(body, state)
    print(f"{name:12s}: {t:7.3f} ms/step", flush=True)
