"""Pallas staged rebin — bit-compatible with the XLA staged rebin in
sph_tpu.sph.dense (same shift-major candidate order), but ~an order of
magnitude cheaper: the XLA version reads the candidate tensor K times per
stage through HBM; here each stage runs in VMEM on TRANSPOSED tiles
[K(sublanes), X(lanes)], where per-cell compaction is a sequential masked
sublane-select — no cross-lane group ops, no scatters.

Stages (matching sph.dense.rebin): lane-cell axis, then layout dim 1, then
layout dim 0. Targets are recomputed per stage from positions. Capacity
overflow and unreachable targets are counted into a per-block dropped
output.

Every stage runs on a row-blocked grid (N0 planes × N1/RB row blocks),
bounding VMEM at any problem size. Stage 1 (row shifts) takes its ±1 row
halo from one-tile neighbor-block fetches; the clamped fetches at the
global edges are inert because rebin targets move at most one row and the
clamped rows are ≥ 7 rows from any block edge. Stage 0 (plane shifts)
takes ±1 plane copies of the same row block (clamped at the top plane —
inert, sentinel margin).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Payload order: px, py, pz, vx, vy, vz, occ
NF = 7
SENTINEL = 1.0e9
TBR = 8                      # row-tile granularity (sublane multiple)
_VMEM_BUDGET = 8 * 2 ** 20


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _stage_kernel(*refs, stage: int, K: int, X: int, RB: int, nbb: int,
                  ncopy: int, world_axis: int, origin_w: float, cell: float,
                  n_cells_w: int):
    """One compaction stage over one (plane, row-block).

    refs: [off0, occ_row, f0×ncopy, …, f6×ncopy, out0..out6, dropped]
    ncopy = 3 for stages 0 (z−1, z, z+1 row blocks) and 1 (main + prev/next
    row-halo tiles), 1 for stage 2. Field refs are [1, rows, K, X]."""
    off0 = refs[0]            # SMEM: this plane's GLOBAL dim0 coord
    occ_row = refs[1]         # SMEM: dilated row-tile occupancy flags (full)
    planes = refs[2:2 + NF * ncopy]
    outs = refs[2 + NF * ncopy:2 + NF * ncopy + NF]
    dropped_ref = refs[2 + NF * ncopy + NF]
    yb = pl.program_id(1)
    row0 = yb * RB            # global row of this block's first row

    for f in range(NF):
        init = SENTINEL if f < 3 else 0.0
        outs[f][0] = jnp.full((RB, K, X), init, jnp.float32)
    dropped_ref[0, 0, 0, 0] = jnp.int32(0)

    if stage == 1:
        # [RB+2, K, X] pads: halo rows from the neighbor-block fetches.
        pads = [
            jnp.concatenate(
                [planes[f * 3 + 1][0][-1:], planes[f * 3][0],
                 planes[f * 3 + 2][0][:1]], axis=0,
            )
            for f in range(NF)
        ]

    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (K, X), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, X), 1)

    def do_rows(rows):
        drp = jnp.int32(0)
        for r in rows:
            out_f = [
                jnp.full((K, X), SENTINEL if f < 3 else 0.0, jnp.float32)
                for f in range(NF)
            ]
            count = jnp.zeros((1, X), jnp.int32)
            drp_row = jnp.int32(0)
            for sft in (-1, 0, 1):
                if stage == 2:      # lane-cell axis: lane shift
                    src = [
                        jnp.roll(planes[f][0, r], -sft, 1) if sft else
                        planes[f][0, r]
                        for f in range(NF)
                    ]
                    own = lane_iota
                elif stage == 1:    # dim 1: row shift via the pads
                    src = [pads[f][r + 1 + sft] for f in range(NF)]
                    own = jnp.full((1, X), row0 + r, jnp.int32)
                else:               # dim 0: plane refs carry the halo
                    src = [planes[f * 3 + 1 + sft][0, r] for f in range(NF)]
                    own = jnp.full((1, X), 0, jnp.int32) + off0[0, 0, 0]
                occ_src = src[6]
                p_w = src[world_axis]
                tgt = jnp.clip(
                    ((p_w - origin_w) / cell).astype(jnp.int32),
                    0, n_cells_w - 1,
                )
                tgt = jnp.where(occ_src > 0.5, tgt, -9)
                if sft == 0:
                    # A particle whose target is > 1 cell away is claimed by
                    # no cell in the sweep: count it (the rebin_vmax clamp
                    # makes this impossible in normal operation).
                    drp_row = drp_row + jnp.sum(
                        ((occ_src > 0.5) & (jnp.abs(tgt - own) > 1))
                        .astype(jnp.int32)
                    )
                for k_src in range(K):
                    cand_t = tgt[k_src:k_src + 1]          # [1, X]
                    wants = cand_t == own
                    place = wants & (count < K)
                    sel = (sub_iota == count) & place      # [K, X] bcast
                    for f in range(NF):
                        cand = src[f][k_src:k_src + 1]     # [1, X]
                        out_f[f] = jnp.where(sel, cand, out_f[f])
                    count = count + place.astype(jnp.int32)
                    drp_row = drp_row + jnp.sum(
                        (wants & ~place).astype(jnp.int32)
                    )
            for f in range(NF):
                outs[f][0, r] = out_f[f]
            drp = drp + drp_row
        return drp

    for rt in range(nbb):
        @pl.when(occ_row[0, 0, yb * nbb + rt] > 0)
        def _(rt=rt):
            dropped_ref[0, 0, 0, 0] = dropped_ref[0, 0, 0, 0] + do_rows(
                range(rt * TBR, (rt + 1) * TBR)
            )


def _pick_rb(N1: int, K: int, X: int, ncopy: int) -> int:
    nb = N1 // TBR
    best = TBR
    for nbb in range(1, nb + 1):
        if nb % nbb:
            continue
        rb = nbb * TBR
        est = (NF * ncopy * (rb + 2 * TBR) + NF * rb) * 2 * K * X * 4
        if est <= _VMEM_BUDGET and rb > best:
            best = rb
    return best


def _field_specs(N0: int, N1: int, K: int, X: int, RB: int, stage: int):
    nbb = RB // TBR
    nb_tot = N1 // TBR
    specs = []
    for _f in range(NF):
        if stage == 0:
            for dz in (-1, 0, 1):
                specs.append(pl.BlockSpec(
                    (1, RB, K, X),
                    functools.partial(
                        lambda z, yb, dz=0:
                        (jnp.clip(z + dz, 0, N0 - 1), yb, 0, 0),
                        dz=dz,
                    ),
                    memory_space=pltpu.VMEM,
                ))
        elif stage == 1:
            specs.append(pl.BlockSpec(
                (1, RB, K, X), lambda z, yb: (z, yb, 0, 0),
                memory_space=pltpu.VMEM,
            ))
            specs.append(pl.BlockSpec(
                (1, TBR, K, X),
                lambda z, yb: (z, jnp.clip(yb * nbb - 1, 0, nb_tot - 1),
                               0, 0),
                memory_space=pltpu.VMEM,
            ))
            specs.append(pl.BlockSpec(
                (1, TBR, K, X),
                lambda z, yb: (z, jnp.clip((yb + 1) * nbb, 0, nb_tot - 1),
                               0, 0),
                memory_space=pltpu.VMEM,
            ))
        else:
            specs.append(pl.BlockSpec(
                (1, RB, K, X), lambda z, yb: (z, yb, 0, 0),
                memory_space=pltpu.VMEM,
            ))
    return specs


def _run_stage(fields_t, occ_row, stage, spec, params, dim0_offset):
    """fields_t: list of NF arrays [N0, N1, K, X] (transposed layout)."""
    N0, N1, K, X = fields_t[0].shape
    ncopy = 3 if stage in (0, 1) else 1
    world_axis = spec.axis_map[stage]
    wc = spec.world_cells()
    RB = _pick_rb(N1, K, X, ncopy)
    nbb = RB // TBR

    kernel = functools.partial(
        _stage_kernel, stage=stage, K=K, X=X, RB=RB, nbb=nbb, ncopy=ncopy,
        world_axis=world_axis, origin_w=float(spec.origin[world_axis]),
        cell=float(spec.cell), n_cells_w=int(wc[world_axis]),
    )
    off = (dim0_offset + jnp.arange(N0, dtype=jnp.int32)).reshape(N0, 1, 1)
    nyb = N1 // RB
    ins = [
        pl.BlockSpec((1, 1, 1), lambda z, yb: (z, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, N1 // TBR), lambda z, yb: (z, 0, 0),
                     memory_space=pltpu.SMEM),
    ] + _field_specs(N0, N1, K, X, RB, stage)
    out_specs = [
        pl.BlockSpec((1, RB, K, X), lambda z, yb: (z, yb, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(NF)
    ] + [pl.BlockSpec((1, 1, 1, 1), lambda z, yb: (z, yb, 0, 0),
                      memory_space=pltpu.SMEM)]
    out_shape = [
        jax.ShapeDtypeStruct((N0, N1, K, X), jnp.float32) for _ in range(NF)
    ] + [jax.ShapeDtypeStruct((N0, nyb, 1, 1), jnp.int32)]
    args = [off, occ_row]
    for f in fields_t:
        args.extend([f] * ncopy)
    outs = pl.pallas_call(
        kernel,
        grid=(N0, nyb),
        in_specs=ins,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*args)
    return list(outs[:NF]), jnp.sum(outs[NF])


def rebin_pallas(d, px, py, pz, vx, vy, vz, params, spec, dim0_offset=0):
    """Drop-in replacement for sph.dense.rebin (single-device path)."""
    from sph_tpu.sph.dense import DenseFluidState, from_transposed, \
        to_transposed

    N0, N1, L = px.shape
    K = spec.k

    fields = [to_transposed(a, K) for a in (px, py, pz, vx, vy, vz, d.occ)]

    # Row-tile occupancy, dilated by one tile in every direction so rows
    # that only RECEIVE particles still compute.
    nb = N1 // TBR
    occ_rb = (
        d.occ.reshape(N0, nb, TBR * L).max(axis=-1) > 0.5
    ).astype(jnp.int32)
    dil = occ_rb
    for ax in (0, 1):
        dil = jnp.maximum(
            dil,
            jnp.maximum(jnp.roll(dil, 1, axis=ax), jnp.roll(dil, -1, axis=ax)),
        )
    occ_row = dil[:, None, :]

    dropped = jnp.int32(0)
    stages = [2]
    if spec.stencil1:
        stages.append(1)
    if spec.stencil0:
        stages.append(0)
    for stage in stages:
        fields, drp = _run_stage(
            fields, occ_row, stage, spec, params, dim0_offset
        )
        dropped = dropped + drp

    pxn, pyn, pzn, vxn, vyn, vzn, occn = [from_transposed(f) for f in fields]
    empty = occn < 0.5
    return DenseFluidState(
        px=jnp.where(empty, SENTINEL, pxn),
        py=jnp.where(empty, SENTINEL, pyn),
        pz=jnp.where(empty, SENTINEL, pzn),
        vx=jnp.where(empty, 0.0, vxn),
        vy=jnp.where(empty, 0.0, vyn),
        vz=jnp.where(empty, 0.0, vzn),
        occ=jnp.where(empty, 0.0, 1.0),
        rho=d.rho, prs=d.prs,
        dropped=d.dropped + dropped.astype(jnp.int32),
        step_count=d.step_count,
    )
