"""On-chip fix candidates for the round-3 expand-pack miscompute.

Repro facts (tools/repro_expand.py, this chip): the 16 wrong slots all
source from sorted rows 384-399 = sublane offset 128-143 of blk_a AFTER
the data-dependent index map transitions to q=1; coverage (s/e/q/cnt) is
provably correct on the same data. Candidates tested here, one compile
each:

  base     — current ops/pallas/expand.py kernel (expect 16 bad)
  barrier  — second operand distinct via lax.optimization_barrier
             (suspect: XLA dedupes the twice-passed rows16 into one
             buffer and Mosaic's revisit tracking misfires)
  nocat    — no jnp.concatenate: two independent onehot matmul pairs
             (suspect: sublane-concat relayout of two 256x16 blocks)
  floatenc — flat targets carried as two exact-integer f32 lanes
             (hi=flat//2048, lo=flat%2048) instead of bitcast denormal
             bit patterns (suspect: denormal flush in the DMA/relayout)
  all      — all three at once
"""
from __future__ import annotations

import functools
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sph_tpu.physics.contact_dense import (
    FIELD_FILLS, OCC_FILL, _scatter_sorted, _sort_with_payload,
    make_contact_spec,
)
from tools.repro_expand import build_scene

T_OUT = 512
W_IN = 256
NF = 16
ENC = 2048.0


def _split3(x):
    b0 = x.astype(jnp.bfloat16)
    r = x - b0.astype(jnp.float32)
    b1 = r.astype(jnp.bfloat16)
    b2 = (r - b1.astype(jnp.float32)).astype(jnp.bfloat16)
    return b0, b1, b2


def _kernel(q_ref, cnt_ref, fills_ref, blk_a, blk_b, out_ref, *,
            nocat: bool, floatenc: bool):
    t = pl.program_id(0)

    @pl.when(cnt_ref[t] == 0)
    def _empty():
        out_ref[...] = jnp.broadcast_to(fills_ref[...], (NF, T_OUT))

    @pl.when(cnt_ref[t] > 0)
    def _place():
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, NF), 1)
        dn = (((0,), (0,)), ((), ()))

        def onehot_of(win):
            if floatenc:
                hi = win[:, 11:12]
                lo = win[:, 12:13]
                tgtf = (jax.lax.broadcasted_iota(
                    jnp.int32, (1, T_OUT), 1) + t * T_OUT).astype(jnp.float32)
                return (hi * ENC + lo == tgtf).astype(jnp.bfloat16)
            flat = jax.lax.bitcast_convert_type(win[:, 11:12], jnp.int32)
            tgt = (jax.lax.broadcasted_iota(jnp.int32, (1, T_OUT), 1)
                   + t * T_OUT)
            return (flat == tgt).astype(jnp.bfloat16)

        def acc_of(win):
            onehot = onehot_of(win)
            vals = jnp.where(lane < 11, win, 0.0)
            b0, b1, b2 = _split3(vals)
            acc = jax.lax.dot_general(b0, onehot, dn,
                                      preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(b1, onehot, dn,
                                       preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(b2, onehot, dn,
                                       preferred_element_type=jnp.float32)
            return acc

        if nocat:
            acc = acc_of(blk_a[...]) + acc_of(blk_b[...])
        else:
            acc = acc_of(jnp.concatenate([blk_a[...], blk_b[...]], axis=0))
        occ = acc[10:11, :]
        out_ref[...] = jnp.where(occ > 0.5, acc, fills_ref[...])


def expand_variant(sorted_rows, flat, fits, fills, slots, *,
                   barrier=False, nocat=False, floatenc=False):
    N, C = sorted_rows.shape
    n_tiles = slots // T_OUT

    flat_mono = jax.lax.cummax(jnp.where(fits, flat, -1))
    tile_lo = jnp.arange(n_tiles, dtype=jnp.int32) * T_OUT
    s = jnp.searchsorted(flat_mono, tile_lo, side="left")
    e = jnp.searchsorted(flat_mono, tile_lo + T_OUT, side="left")

    n_blk = -(-N // W_IN) + 2
    npad = n_blk * W_IN
    if floatenc:
        hi = jnp.floor_divide(flat, int(ENC)).astype(jnp.float32)[:, None]
        lo = jnp.mod(flat, int(ENC)).astype(jnp.float32)[:, None]
        extra = jnp.concatenate([hi, lo], axis=1)
        nz = NF - C - 2
    else:
        extra = jax.lax.bitcast_convert_type(
            flat.astype(jnp.int32), jnp.float32)[:, None]
        nz = NF - C - 1
    rows16 = jnp.concatenate(
        [sorted_rows, extra, jnp.zeros((N, nz), jnp.float32)], axis=1)
    pad = jnp.zeros((npad - N, NF), jnp.float32)
    if floatenc:
        pad = pad.at[:, 11].set(float(slots // int(ENC)))
        pad = pad.at[:, 12].set(float(slots % int(ENC)))
    else:
        pad = pad.at[:, 11].set(jax.lax.bitcast_convert_type(
            jnp.int32(slots), jnp.float32))
    rows16 = jnp.concatenate([rows16, pad], axis=0)

    q = jnp.minimum(s // W_IN, n_blk - 2).astype(jnp.int32)
    cnt = (e - s).astype(jnp.int32)
    fills16 = jnp.asarray(tuple(fills) + (0.0,) * (NF - C),
                          jnp.float32)[:, None]

    rows_b = (jax.lax.optimization_barrier(rows16) if barrier else rows16)

    out = pl.pallas_call(
        functools.partial(_kernel, nocat=nocat, floatenc=floatenc),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((NF, 1), lambda t, q, cnt: (0, 0)),
                pl.BlockSpec((W_IN, NF), lambda t, q, cnt: (q[t], 0)),
                pl.BlockSpec((W_IN, NF), lambda t, q, cnt: (q[t] + 1, 0)),
            ],
            out_specs=pl.BlockSpec((NF, T_OUT), lambda t, q, cnt: (0, t)),
        ),
        out_shape=jax.ShapeDtypeStruct((NF, slots), jnp.float32),
    )(q, cnt, fills16, rows16, rows_b)
    return out[:C]


def main():
    print("backend:", jax.default_backend(), "jax", jax.__version__)
    cst, cparams = build_scene()
    spec = make_contact_spec(cparams, k=cparams.dense_k,
                             cell_factor=cparams.dense_cell_factor)
    fills = FIELD_FILLS + (OCC_FILL,)

    variants = [
        ("floatenc", dict(floatenc=True)),
        ("all", dict(barrier=True, nocat=True, floatenc=True)),
    ]
    for name, kw in variants:
        @jax.jit
        def run(state, kw=kw):
            cols, flat, fits, overflow, slot_of, _env = _sort_with_payload(
                state, spec)
            sc = _scatter_sorted(cols, fills, flat, fits, spec)
            ex = expand_variant(jnp.stack(cols, axis=1), flat, fits,
                                fills, spec.slots, **kw)
            return jnp.stack([a.reshape(-1) for a in sc]), ex

        try:
            sc, ex = run(cst)
            bad = np.nonzero(np.any(np.asarray(sc) != np.asarray(ex),
                                    axis=0))[0]
            print(f"{name:9s}: bad_slots={len(bad)}"
                  + (f" first={bad[:6].tolist()}" if len(bad) else ""))
        except Exception as exn:
            print(f"{name:9s}: ERROR {type(exn).__name__}: {str(exn)[:160]}")


if __name__ == "__main__":
    main()
