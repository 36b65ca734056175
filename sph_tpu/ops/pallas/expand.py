"""Pallas expand kernel: the contact pack's scatter as streaming matmuls.

The pack's final step writes N sorted particle rows into their dense slots
(planar [Z, Y, X·K] fields). As an XLA scatter that is a random-RMW per
element and costs ~72 ms at a 1M colony — 6× the whole sweep
(tools/probe_pack.py; unique/sorted flags don't help, the lowering is the
whale). But this scatter is an ascending-unique EXPAND: row targets
`flat = cid·K + rank` are sorted, so the rows landing in any tile of T
output slots are one CONTIGUOUS run of the sorted input. Each kernel
instance therefore:

  1. DMAs the (block-aligned) input window that covers its run — W rows,
     sized to ~3× the mean rows-per-tile, NOT to T: colony occupancy is
     ~0.15 rows/slot, and the window length is what the matmul pays for;
  2. builds a one-hot [W, T] from the in-window targets;
  3. places rows with dot_general(win[W,16], onehot) → [16, T] on the MXU.

ROUND-4 FIX (the round-3 on-chip miscompute, VERDICT.md Weak #1): row
targets now ride lanes 11/12 as EXACT small-integer floats
(hi = flat >> 11, lo = flat & 2047 — both < 2^13, exact in f32 and
compared lane-for-lane, so there is no 2^24 slot-count ceiling). The
round-3 kernel instead BITCAST the i32 targets into an f32 lane; small-int
bit patterns are denormals, and on real TPU those bits were mangled
between HBM and the compare for blocks revisited after the first
data-dependent index-map transition (reproduced deterministically:
tools/repro_expand.py — 16 slots wrong, 25/400 particles silently got 0.0
contact force; tools/probe_fix_expand.py isolated the encoding as the one
variant that fixes it, while operand dedup and the in-kernel concatenate
were ruled out). Interpret-mode tests cannot see this — only the chip
does — hence tools/verify_chip.py now runs every twin on hardware.
NEVER bitcast integer bits into an f32 lane that crosses a Mosaic buffer.

Bit-exactness: the one-hot matmul is computed as three bf16 dots on the
exact 3-way bf16 split of the f32 rows (b0+b1+b2 == x exactly; each
product is b_i·1.0 or b_i·0.0, both exact; the f32 accumulation adds one
nonzero per output, so every slot reproduces its row bit-for-bit and the
planar result equals the XLA scatter's exactly — asserted by
tests/test_expand.py on CPU and tools/verify_chip.py / bench --verify on
hardware).

Windows are located with ONE searchsorted over `flat_mono` (the
monotone envelope of flat: drop rows inherit their cell's last real
target — lax.cummax of the real targets, exact because rank orders real
rows before drops within a cell run). A tile whose run exceeds W (only
possible under heavy cell overflow) is detected OUTSIDE the kernel and
the caller falls back to the XLA scatter for that step (lax.cond), so
pathological states stay correct, just slower.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_OUT = 512      # output slots per kernel instance
W_IN = 256       # input window rows (≥ max rows landing in one tile)
NF = 16          # padded field lanes: 11 data + hi/lo target lanes + 3 zero


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _split3(x):
    """Exact 3-way bf16 split: b0 + b1 + b2 == x (f32, normal range)."""
    b0 = x.astype(jnp.bfloat16)
    r = x - b0.astype(jnp.float32)
    b1 = r.astype(jnp.bfloat16)
    b2 = (r - b1.astype(jnp.float32)).astype(jnp.bfloat16)
    return b0, b1, b2


CO = 12          # output field lanes (11 data + 1 pad sublane)


def _expand_kernel(q_ref, cnt_ref, fills_ref, blk_a, blk_b, out_ref, *,
                   t_out: int, w_in: int, single_lane: bool):
    t = pl.program_id(0)

    # A settled colony is mostly empty space (~60-90% of t_out-slot tiles
    # receive zero rows at bonded-colony occupancy), so tiles with an
    # empty input run skip the three MXU dots and write fills directly —
    # bit-identical to the matmul path, whose all-zero occ row would
    # select fills everywhere anyway.
    @pl.when(cnt_ref[t] == 0)
    def _empty():
        out_ref[...] = jnp.broadcast_to(fills_ref[...], (CO, t_out))

    @pl.when(cnt_ref[t] > 0)
    def _place():
        # The two fetched blocks [2W, NF] cover every row targeting this
        # tile (s_t ∈ [qW, qW+W) and the run length is ≤ W by the overrun
        # guard); rows outside the tile simply match no output lane, so no
        # in-kernel windowing is needed (Mosaic has no dynamic_slice on
        # values anyway — the cost is 2× the matmul K, not correctness).
        win = jnp.concatenate([blk_a[...], blk_b[...]], axis=0)  # [2W, NF]

        # Targets compared as exact small-integer floats (see module
        # docstring — bitcast denormal lanes get mangled on-chip). The
        # [2W, T] compare is the kernel's dominant VPU cost; a packed-
        # bf16 digit compare (2× lane density) was tried in round 4 and
        # REJECTED: Mosaic on v5e refuses bf16 vector compares ("Target
        # does not support this comparison").
        tgt = (jax.lax.broadcasted_iota(jnp.int32, (1, t_out), 1)
               + t * t_out)
        if single_lane:
            # slots < 2^24: every target is EXACT as a plain f32 VALUE
            # (this is a value conversion, not a bitcast — the round-3
            # denormal mangling does not apply), so one compare replaces
            # the hi/lo pair and halves the kernel's dominant VPU cost.
            onehot = (win[:, 11:12] == tgt.astype(jnp.float32)
                      ).astype(jnp.bfloat16)
        else:
            tgt_hi = (tgt >> 11).astype(jnp.float32)
            tgt_lo = (tgt & 2047).astype(jnp.float32)
            onehot = ((win[:, 11:12] == tgt_hi)
                      & (win[:, 12:13] == tgt_lo)).astype(jnp.bfloat16)

        # Zero the non-data lanes so the target columns can't leak into
        # the MXU accumulation.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, NF), 1)
        vals = jnp.where(lane < 11, win, 0.0)
        b0, b1, b2 = _split3(vals)
        dn = (((0,), (0,)), ((), ()))
        # ONE dot with the three bf16 planes stacked along M: [2W, 3·NF]
        # costs the same MXU passes as [2W, NF] (M=48 ≤ the 128-wide
        # systolic tile — three separate dots ran the array at 12.5%
        # utilization and dominated the pack, 28 ms at a 1M colony).
        # Summing the three [NF, T] plane blocks afterwards reproduces
        # dot(b0)+dot(b1)+dot(b2) bit-for-bit: every product is exact and
        # each slot has at most one nonzero per plane.
        b = jnp.concatenate([b0, b1, b2], axis=1)             # [2W, 3·NF]
        acc3 = jax.lax.dot_general(b, onehot, dn,
                                   preferred_element_type=jnp.float32)
        acc = (acc3[:CO] + acc3[NF:NF + CO]
               + acc3[2 * NF:2 * NF + CO])
        # acc [CO, T]; occupancy rides the occ column (1.0 per real row,
        # at most one row per slot) — empty slots take the per-field fill.
        occ = acc[10:11, :]
        out_ref[...] = jnp.where(occ > 0.5, acc, fills_ref[...])


def tile_windows(env_flat, slots: int, t_out: int = T_OUT,
                 w_in: int = W_IN):
    """Per-tile input windows from the per-row tile assignment `env_flat`
    (i32 [N], SORTED row order): each row's value must lie inside its
    tile's slot range — real rows use their target `flat`, drop rows
    their CELL's first slot cid·K (same tile: t_out % K == 0 keeps a
    cell's K slots inside one tile, and a cell's rows — fits then drops —
    are consecutive in the sort), dead rows use `slots` (shadow bin).
    contact_dense._rank_and_slots produces exactly this array.

    Returns (q [n_tiles] input-block index, cnt [n_tiles] span length
    INCLUDING interleaved drop rows, overrun bool). Computed as one
    bincount scatter-add into the on-chip tile histogram + a cumsum:
    the previous formulation (lax.cummax envelope + two searchsorteds
    over all N rows) cost ~9 ms at a 1M colony AND ran twice — once in
    window_overrun, once in expand_rows (~18 ms of the 55 ms pack,
    round-5 pieces probe); this is ~1 ms, computed once, shared.

    Exactness: cell c's rows occupy consecutive sorted positions, so
    counts[t] = Σ rows of cells in tile t = the exact position-span the
    kernel window must cover, and s[t] = Σ counts[<t] = the span start —
    identical to the envelope+searchsorted values for every real row,
    and TIGHTER for trailing dead rows (the envelope lumped them into
    the last occupied tile's span; they carry no target either way).
    The kernel guarantee is unchanged: cnt ≤ w_in ⇒ the span [s, s+cnt)
    ⊆ [q·w_in, q·w_in + 2·w_in) with q = s // w_in."""
    n_tiles = slots // t_out
    N = env_flat.shape[0]
    tile_of = jnp.minimum(env_flat // t_out, n_tiles).astype(jnp.int32)
    counts = jnp.zeros(n_tiles + 1, jnp.int32).at[tile_of].add(
        jnp.ones(N, jnp.int32), mode="drop"
    )[:n_tiles]
    e = jnp.cumsum(counts)
    s = e - counts
    overrun = jnp.max(counts) > w_in
    n_blk_cap = -(-N // w_in)                     # q clamp, as before
    q = jnp.minimum(s // w_in, n_blk_cap).astype(jnp.int32)
    return q, counts, overrun


def _env_from_flat(flat, fits, slots: int):
    """Back-compat envelope when the caller has no cell-id array: the
    monotone envelope (cummax of real targets) assigns every drop/dead
    row the last real target before it — same tile binning as
    _rank_and_slots' env_flat for drops, and the last occupied tile for
    the dead tail (a harmless, slightly wider final window). Costs a
    cummax over N — fine for tests/small states; hot callers pass
    env_flat via `windows=` instead."""
    mono = jax.lax.cummax(jnp.where(fits, flat, -1))
    return jnp.where(mono < 0, jnp.int32(slots), mono)


def window_overrun(flat, fits, slots: int, t_out: int = T_OUT,
                   w_in: int = W_IN):
    """True when some t_out-slot tile's input span exceeds w_in rows —
    only possible under heavy cell overflow (drop rows share their cell's
    span). The caller must then use the scatter path; expand_rows would
    silently lose the span's tail."""
    return tile_windows(_env_from_flat(flat, fits, slots),
                        slots, t_out, w_in)[2]


def expand_rows(sorted_rows, flat, fits, fills, slots: int,
                t_out: int = T_OUT, w_in: int = W_IN,
                single_lane: bool | None = None, windows=None):
    """Place sorted rows into dense slots: the bit-exact Pallas twin of
    the XLA column scatters (contact_dense._scatter_table).

    sorted_rows [N, C=11] f32 (row order = spatial sort; column 10 MUST be
    the occupancy column, 1.0 on real rows), flat [N] i32 ascending
    targets with `slots` for drops, fits [N] bool. Returns (out [C, slots]
    f32, overrun bool scalar) — overrun=True means some tile's input span
    exceeded W_IN (heavy cell overflow) and `out` is NOT valid; the caller
    must fall back to the scatter path.

    windows: optional precomputed (q, cnt, overrun) from tile_windows —
    hot callers (contact_dense._pack_args) compute it once from the pack
    sort's env_flat and share it between the overrun guard and this call
    (the internal recomputation was ~9 ms of the 1M-colony pack)."""
    N, C = sorted_rows.shape
    assert C == 11, C  # target lanes are pinned at 11/12
    assert slots % t_out == 0, (slots, t_out)

    if windows is None:
        windows = tile_windows(_env_from_flat(flat, fits, slots),
                               slots, t_out, w_in)
    q, cnt, overrun = windows

    n_blk = -(-N // w_in) + 2
    npad = n_blk * w_in
    flat_i = flat.astype(jnp.int32)
    if single_lane is None:           # auto: exact as an f32 value?
        single_lane = slots < (1 << 24)
    assert not single_lane or slots < (1 << 24), slots
    if single_lane:
        parts = [flat_i.astype(jnp.float32)[:, None],
                 jnp.zeros((N, 1), jnp.float32)]
        pad_tgts = [float(slots), 0.0]
    else:
        parts = [(flat_i >> 11).astype(jnp.float32)[:, None],
                 (flat_i & 2047).astype(jnp.float32)[:, None]]
        pad_tgts = [float(slots >> 11), float(slots & 2047)]
    rows16 = jnp.concatenate(
        [sorted_rows, *parts,
         jnp.zeros((N, NF - C - len(parts)), jnp.float32)], axis=1)
    pad = jnp.zeros((npad - N, NF), jnp.float32)
    for j, v in enumerate(pad_tgts):
        pad = pad.at[:, 11 + j].set(v)
    rows16 = jnp.concatenate([rows16, pad], axis=0)

    # q from tile_windows is clamped to ceil(N/w_in) == n_blk - 2, so the
    # two fetched blocks q, q+1 always exist in the padded row array.
    fills16 = jnp.asarray(
        tuple(fills) + (0.0,) * (CO - C), jnp.float32)[:, None]

    out = pl.pallas_call(
        functools.partial(_expand_kernel, t_out=t_out, w_in=w_in,
                          single_lane=single_lane),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(slots // t_out,),
            in_specs=[
                pl.BlockSpec((CO, 1), lambda t, q, cnt: (0, 0)),
                pl.BlockSpec((w_in, NF), lambda t, q, cnt: (q[t], 0)),
                pl.BlockSpec((w_in, NF), lambda t, q, cnt: (q[t] + 1, 0)),
            ],
            out_specs=pl.BlockSpec((CO, t_out), lambda t, q, cnt: (0, t)),
        ),
        out_shape=jax.ShapeDtypeStruct((CO, slots), jnp.float32),
        interpret=_interpret(),
    )(q, cnt, fills16, rows16, rows16)
    return out[:C], overrun
