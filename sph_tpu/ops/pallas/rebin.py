"""Pallas staged rebin — bit-compatible with the XLA staged rebin in
sph_tpu.sph.dense (same shift-major candidate order), but ~an order of
magnitude cheaper: the XLA version reads the candidate tensor K times per
stage through HBM; here each stage runs in VMEM on TRANSPOSED tiles
[K(sublanes), X(lanes)], where per-cell compaction is a sequential masked
sublane-select — no cross-lane group ops, no scatters.

Stages (matching sph.dense.rebin): lane-cell axis, then layout dim 1, then
layout dim 0 (plane refs carry the ±1 halo; the wrap/clamp ring is sentinel).
Targets are recomputed per stage from positions. Capacity overflow and
unreachable targets are counted into a per-plane dropped output.
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


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _stage_kernel(*refs, stage: int, K: int, X: int, n_rows: int,
                  world_axis: int, origin_w: float, cell: float,
                  n_cells_w: int, nz: int, blocked: bool):
    """One compaction stage over one (plane | row-block).

    refs: [off0, occ_blk, f0×nz, …, f6×nz, out0..out6, dropped]
    Stage 1 (dim-1 row shifts) runs per full plane (needs the row halo);
    stages 0 and 2 run per row-block (`blocked`), bounding VMEM at any
    problem size. Field refs are [1, n_rows, K, X]; nz = 3 with dim0 halo
    for stage 0, else 1.
    """
    off0 = refs[0]            # SMEM: this plane's GLOBAL dim0 coord
    occ_blk = refs[1]         # SMEM: dilated row-block occupancy flags
    planes = refs[2:2 + NF * nz]
    outs = refs[2 + NF * nz:2 + NF * nz + NF]
    dropped_ref = refs[2 + NF * nz + NF]

    mid = nz // 2

    def P(f, zi):
        return planes[f * nz + zi]

    for f in range(NF):
        init = SENTINEL if f < 3 else 0.0
        outs[f][0] = jnp.full((n_rows, K, X), init, jnp.float32)
    def drp_set(v):
        if blocked:
            dropped_ref[0, 0, 0, 0] = v
        else:
            dropped_ref[0, 0, 0] = v

    drp_set(jnp.int32(0))

    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (K, X), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, X), 1)

    nb = occ_blk.shape[2] if not blocked else 1
    TBR = n_rows // nb

    def do_rows(rows, own_row_of):
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
                        jnp.roll(P(f, mid)[0, r], -sft, 1) if sft else
                        P(f, mid)[0, r]
                        for f in range(NF)
                    ]
                    own = lane_iota
                elif stage == 1:    # dim 1: row shift (wrap = sentinel)
                    rr = (r + sft) % n_rows
                    src = [P(f, mid)[0, rr] for f in range(NF)]
                    own = jnp.full((1, X), own_row_of(r), jnp.int32)
                else:               # dim 0: plane refs carry the halo
                    src = [P(f, mid + sft)[0, r] for f in range(NF)]
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

    if blocked:
        # One row-block per program: the occ flag gates the whole block.
        @pl.when(occ_blk[0, 0, 0, 0] > 0)
        def _():
            drp_set(do_rows(range(n_rows), lambda r: r))
    else:
        for rb in range(nb):
            @pl.when(occ_blk[0, 0, rb] > 0)
            def _(rb=rb):
                dropped_ref[0, 0, 0] = dropped_ref[0, 0, 0] + do_rows(
                    range(rb * TBR, (rb + 1) * TBR), lambda r: r
                )


def _plane_specs_t(n_fields: int, N0: int, rows: int, K: int, X: int,
                   nz: int, blocked: bool):
    specs = []
    offsets = (-1, 0, 1) if nz == 3 else (0,)
    for _f in range(n_fields):
        for dz in offsets:
            if blocked:
                specs.append(
                    pl.BlockSpec(
                        (1, rows, K, X),
                        functools.partial(
                            lambda z, rb, dz=0:
                            (jnp.clip(z + dz, 0, N0 - 1), rb, 0, 0),
                            dz=dz,
                        ),
                        memory_space=pltpu.VMEM,
                    )
                )
            else:
                specs.append(
                    pl.BlockSpec(
                        (1, rows, K, X),
                        functools.partial(
                            lambda z, dz=0:
                            (jnp.clip(z + dz, 0, N0 - 1), 0, 0, 0),
                            dz=dz,
                        ),
                        memory_space=pltpu.VMEM,
                    )
                )
    return specs


def _run_stage(fields_t, occ_blk, stage, spec, params, dim0_offset):
    """fields_t: list of NF arrays [N0, N1, K, X] (transposed layout).

    Stages 0 and 2 need no row halo → their grid blocks over (plane,
    row-block), bounding VMEM independent of problem size. Stage 1 (row
    shifts) runs per full plane.
    """
    N0, N1, K, X = fields_t[0].shape
    nz = 3 if (stage == 0) else 1
    blocked = stage != 1
    world_axis = spec.axis_map[stage]
    wc = spec.world_cells()
    nb = occ_blk.shape[-1]
    TBR = N1 // nb
    rows = TBR if blocked else N1

    kernel = functools.partial(
        _stage_kernel, stage=stage, K=K, X=X, n_rows=rows,
        world_axis=world_axis, origin_w=float(spec.origin[world_axis]),
        cell=float(spec.cell), n_cells_w=int(wc[world_axis]), nz=nz,
        blocked=blocked,
    )
    off = (dim0_offset + jnp.arange(N0, dtype=jnp.int32)).reshape(N0, 1, 1)
    if blocked:
        grid = (N0, nb)
        out_map = lambda z, rb: (z, rb, 0, 0)      # noqa: E731
        smem_map = lambda z, rb: (z, 0, 0)         # noqa: E731
        # 4D so the SMEM blocks' trailing dims equal the array's
        # (Pallas TPU block divisibility rule).
        occ_map = lambda z, rb: (z, rb, 0, 0)      # noqa: E731
        occ_block = (1, 1, 1, 1)
        drp_shape = (N0, nb, 1, 1)
        drp_map = lambda z, rb: (z, rb, 0, 0)      # noqa: E731
        occ_in = occ_blk.reshape(N0, nb, 1, 1)
    else:
        grid = (N0,)
        out_map = lambda z: (z, 0, 0, 0)           # noqa: E731
        smem_map = lambda z: (z, 0, 0)             # noqa: E731
        occ_map = lambda z: (z, 0, 0)              # noqa: E731
        occ_block = (1, 1, nb)
        drp_shape = (N0, 1, 1)
        drp_map = lambda z: (z, 0, 0)              # noqa: E731
        occ_in = occ_blk
    drp_block = (1, 1, 1, 1) if blocked else (1, 1, 1)
    out_specs = [
        pl.BlockSpec((1, rows, K, X), out_map, memory_space=pltpu.VMEM)
        for _ in range(NF)
    ] + [pl.BlockSpec(drp_block, drp_map, memory_space=pltpu.SMEM)]
    out_shape = [
        jax.ShapeDtypeStruct((N0, N1, K, X), jnp.float32) for _ in range(NF)
    ] + [jax.ShapeDtypeStruct(drp_shape, jnp.int32)]
    ins = [
        pl.BlockSpec((1, 1, 1), smem_map, memory_space=pltpu.SMEM),
        pl.BlockSpec(occ_block, occ_map, memory_space=pltpu.SMEM),
    ] + _plane_specs_t(NF, N0, rows, K, X, nz, blocked)
    args = [off, occ_in]
    for f in fields_t:
        args.extend([f] * nz)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=ins,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*args)
    return list(outs[:NF]), jnp.sum(outs[NF])


def rebin_pallas(d, px, py, pz, vx, vy, vz, params, spec, dim0_offset=0):
    """Drop-in replacement for sph.dense.rebin (single-device path)."""
    from sph_tpu.sph.dense import DenseFluidState

    N0, N1, L = px.shape
    K = spec.k
    X = spec.n2

    def to_t(a):
        return a.reshape(N0, N1, X, K).transpose(0, 1, 3, 2)

    def from_t(a):
        return a.transpose(0, 1, 3, 2).reshape(N0, N1, L)

    fields = [to_t(a) for a in (px, py, pz, vx, vy, vz, d.occ)]

    # Row-block occupancy, dilated by one block in every direction so rows
    # that only RECEIVE particles still compute.
    TBR = 8
    nb = N1 // TBR
    occ_rb = (
        d.occ.reshape(N0, nb, TBR * L).max(axis=-1) > 0.5
    ).astype(jnp.int32)
    dil = occ_rb
    for ax, size in ((0, N0), (1, nb)):
        dil = jnp.maximum(
            dil,
            jnp.maximum(jnp.roll(dil, 1, axis=ax), jnp.roll(dil, -1, axis=ax)),
        )
    occ_blk = dil[:, None, :]

    dropped = jnp.int32(0)
    stages = [2]
    if spec.stencil1:
        stages.append(1)
    if spec.stencil0:
        stages.append(0)
    for stage in stages:
        fields, drp = _run_stage(
            fields, occ_blk, stage, spec, params, dim0_offset
        )
        dropped = dropped + drp

    pxn, pyn, pzn, vxn, vyn, vzn, occn = [from_t(f) for f in fields]
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
