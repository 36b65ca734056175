"""Adhesion ACCUMULATION candidates: jax.ops.segment_sum's random
scatter-add is ~220 ms of the 246 ms pass at a 1M colony (and
indices_are_sorted does not help — probe_adhesion2). Each variant here
replaces only the accumulate, on identical per-bond delta rows:

  segsum_row7 : shipped — [2B, 7] row segment_sum, bond order
  segsum_row8 : same, rows padded to 8 lanes (alignment test)
  segsum_cols : 7 independent scalar-column segment_sums
  sort_segscan: full stateless candidate — argsort(seg) + row permute +
                segmented associative_scan + ONE boundary row-gather [N]
                (numerically safe: within-segment sums only, no
                prefix-difference cancellation)

Usage: python tools/probe_adhesion3.py [n]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sph_tpu.engine.colony import bonded_colony

N = int(sys.argv[1]) if len(sys.argv) > 1 else 102400
SUB = 30
state, params, genome = bonded_colony(
    N, neighbor_mode="dense", max_splits_per_step=64, dense_k=2,
    use_pallas=True,
)
b = state.bonds
B = b.capacity
cap = state.capacity
print(f"n={N} bonds={int(jnp.sum(b.active))} cap={B}", flush=True)

idx_a_h = np.clip(np.asarray(b.slot_a).copy(), 0, cap - 1)
idx_b_h = np.clip(np.asarray(b.slot_b).copy(), 0, cap - 1)
valid_h = (np.asarray(b.active).copy()
           & (np.asarray(b.slot_a).copy() >= 0)
           & (np.asarray(b.slot_b).copy() >= 0))
seg_all = jnp.asarray(np.concatenate([np.where(valid_h, idx_a_h, cap),
                                      np.where(valid_h, idx_b_h, cap)]))


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


def _rows(st):
    """Shape-realistic delta rows (cheap to make, can't DCE)."""
    return jnp.concatenate([jnp.broadcast_to(st.vel[0], (B, 3)),
                            jnp.broadcast_to(st.pos[0], (B, 3)),
                            jnp.ones((B, 1), jnp.float32)], axis=1)


def ph_segsum_row7(st):
    r = jnp.tile(_rows(st), (2, 1))
    acc = jax.ops.segment_sum(r, seg_all, num_segments=cap + 1)[:cap]
    return st.replace_fields(vel=st.vel + 1e-30 * acc[:, :3])


def ph_segsum_row8(st):
    r = jnp.tile(_rows(st), (2, 1))
    r = jnp.concatenate([r, jnp.zeros((2 * B, 1), jnp.float32)], axis=1)
    acc = jax.ops.segment_sum(r, seg_all, num_segments=cap + 1)[:cap]
    return st.replace_fields(vel=st.vel + 1e-30 * acc[:, :3])


def ph_segsum_cols(st):
    r = jnp.tile(_rows(st), (2, 1))
    accs = [jax.ops.segment_sum(r[:, c], seg_all,
                                num_segments=cap + 1)[:cap]
            for c in range(7)]
    return st.replace_fields(
        vel=st.vel + 1e-30 * jnp.stack(accs[:3], axis=-1))


def _blocked_segscan(rs, flags, W=512):
    """Inclusive SEGMENTED prefix over [M, 7] rows with run-start `flags`,
    as a two-level Hillis-Steele built from pad/slice/select only (no
    scatters, no lax.associative_scan — that compiles pathologically at
    this size). M must be a multiple of W."""
    M = rs.shape[0]
    Mb = M // W
    v = rs.reshape(Mb, W, 7)
    f = flags.reshape(Mb, W)
    d = 1
    while d < W:
        vs = jnp.pad(v, ((0, 0), (d, 0), (0, 0)))[:, :W]
        fs = jnp.pad(f, ((0, 0), (d, 0)), constant_values=False)[:, :W]
        v = jnp.where(f[..., None], v, v + vs)
        f = f | fs
        d *= 2
    # Cross-block: combine block totals with the same recurrence (tiny).
    bt_v, bt_f = v[:, -1], f[:, -1]                    # [Mb,7], [Mb]
    d = 1
    while d < Mb:
        vs = jnp.pad(bt_v, ((d, 0), (0, 0)))[:Mb]
        fs = jnp.pad(bt_f, ((d, 0),), constant_values=False)[:Mb]
        bt_v = jnp.where(bt_f[:, None], bt_v, bt_v + vs)
        bt_f = bt_f | fs
        d *= 2
    # Exclusive block prefix: total of the run STILL OPEN entering block i.
    pre_v = jnp.pad(bt_v, ((1, 0), (0, 0)))[:Mb]
    # Rows before their block's first boundary continue that open run.
    v = jnp.where(f[..., None], v, v + pre_v[:, None, :])
    return v.reshape(M, 7)


def _sort_segscan(r, seg, n_rows):
    perm = jnp.argsort(seg, stable=True)
    seg_s = seg[perm]
    rs = r[perm]
    flags = jnp.concatenate(
        [jnp.ones(1, bool), seg_s[1:] != seg_s[:-1]])
    cs = _blocked_segscan(rs, flags)
    # Emit: the LAST row of each run holds its total; route totals to
    # particle rows with a UNIQUE-index scatter-set (run-last rows target
    # their particle id, every other row targets its own private filler
    # slot past n_rows — honestly unique, so the scatter needs no
    # combining and can lower as a plain routed write).
    M = seg.shape[0]
    is_last = jnp.concatenate([seg_s[1:] != seg_s[:-1],
                               jnp.ones(1, bool)])
    tgt = jnp.where(is_last & (seg_s < n_rows),
                    seg_s, n_rows + jnp.arange(M))
    out = jnp.zeros((n_rows + M, 7), jnp.float32)
    out = out.at[tgt].set(cs, unique_indices=True)
    return out[:n_rows]


def ph_sort_segscan(st):
    r = jnp.tile(_rows(st), (2, 1))
    acc = _sort_segscan(r, seg_all, cap)
    return st.replace_fields(vel=st.vel + 1e-30 * acc[:, :3])


# correctness of the segscan formulation
r0 = jnp.asarray(
    np.random.default_rng(0).normal(size=(2 * B, 7)).astype(np.float32))
want = jax.ops.segment_sum(r0, seg_all, num_segments=cap + 1)[:cap]
got = jax.jit(lambda r: _sort_segscan(r, seg_all, cap))(r0)
np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                           rtol=1e-4, atol=1e-4)
print("sort_segscan == segment_sum: OK", flush=True)

for name, body in [("segsum_row7", ph_segsum_row7),
                   ("segsum_row8", ph_segsum_row8),
                   ("segsum_cols", ph_segsum_cols),
                   ("sort_segscan", ph_sort_segscan)]:
    t = scan_of(body, state)
    print(f"{name:12s}: {t:7.3f} ms/step", flush=True)


# --- Windowed-plan variants: the argsort is frozen while the bond table
# is settled (recomputed only on division steps), so the per-step cost is
# permute + blocked segscan + ONE boundary gather. ---
M = 2 * B
perm2_h = np.argsort(np.asarray(seg_all), kind="stable")
seg_s_h = np.asarray(seg_all)[perm2_h]
flags_h = np.r_[True, seg_s_h[1:] != seg_s_h[:-1]]
last_h = np.full(cap, -1, np.int64)
isl = np.r_[seg_s_h[1:] != seg_s_h[:-1], True]
li = np.where(isl & (seg_s_h < cap))[0]
last_h[seg_s_h[li]] = li
perm2d = jnp.asarray(perm2_h)
flagsd = jnp.asarray(flags_h)
lastd = jnp.asarray(np.clip(last_h, 0, M - 1).astype(np.int32))
hasd = jnp.asarray(last_h >= 0)


def ph_planned(st):
    r = jnp.tile(_rows(st), (2, 1))
    rs = r[perm2d]
    cs = _blocked_segscan(rs, flagsd)
    acc = jnp.where(hasd[:, None], cs[lastd], 0.0)
    return st.replace_fields(vel=st.vel + 1e-30 * acc[:, :3])


def ph_plan_build(st):
    seg = seg_all + (st.vel[0, 0] * 0).astype(jnp.int32)
    perm = jnp.argsort(seg, stable=True)
    seg_s = seg[perm]
    isl_ = jnp.concatenate([seg_s[1:] != seg_s[:-1], jnp.ones(1, bool)])
    tgt = jnp.where(isl_ & (seg_s < cap), seg_s, cap)
    last = jnp.full(cap + 1, -1, jnp.int32).at[tgt].set(
        jnp.arange(M, dtype=jnp.int32))[:cap]
    return st.replace_fields(vel=st.vel + 1e-30 * (
        last[:3].astype(jnp.float32) + perm[:3].astype(jnp.float32)))


# planned == segment_sum (window-correct: same seg table)
got2 = jax.jit(lambda r: jnp.where(
    hasd[:, None], _blocked_segscan(r[perm2d], flagsd)[lastd], 0.0
))(r0)
np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                           rtol=1e-4, atol=1e-4)
print("planned == segment_sum: OK", flush=True)

for name, body in [("planned", ph_planned),
                   ("plan_build", ph_plan_build)]:
    t = scan_of(body, state)
    print(f"{name:12s}: {t:7.3f} ms/step", flush=True)
