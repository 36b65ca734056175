"""Pallas TPU kernels for the dense-grid SPH hot path.

Same math as sph_tpu.sph.dense's XLA twin — the pair arithmetic is literally
shared (sph.dense.density_pair_term / accel_pair_terms) and both paths use
the same per-element accumulation order, so they agree to within XLA's
graph-shape-dependent FMA contraction (~1 ulp of the sums; asserted at
tight tolerance in tests/test_dense.py and on-chip by bench.py --verify).

Structure (see sph.dense's sweep docs for the full derivation):

- FUSED TILES [K(slots, sublanes), C-block(lanes)]: the minor axis fuses
  (row, cell) so every vector op runs at the full 128-lane width even when
  the world row is short (the earlier [rows, K, X] tiles at X≈64 wasted
  half the lanes). The stencil offset (dy, dx) becomes one fused-axis
  offset dy·X + dx, realized as a STATIC SLICE of a row-padded tile — no
  lane rolls for pair alignment at all. The slot-offset sweep (m) rides
  sublanes (free).
- NEWTON PAIR SYMMETRY: groups A/B/C/D sweep half the (dz, dy, dx, m)
  variant space; each iteration also emits the mirror (partner-side)
  contribution. Mirror lumps ride the fori carry slot-rolled (free
  alignment) and are lane-derolled by dx once per group — wrap-safe
  because sub-chunk edges are row boundaries (sentinel margin columns).
  In-row mirrors (A, B) fold straight into the accumulator; row/plane-
  crossing mirrors (C, D) go to separate outputs folded by
  sph.dense.combine_mirror_parts.
- BLOCKED GRID (N0 planes × C/CB fused blocks); the ±(X+1) halo comes
  from ONE sub-chunk tile off each neighbor block's facing edge (full
  neighbor blocks would triple input HBM traffic). CB picked per shape
  (multiple of the sub-chunk SC).
- TILE SKIP: per sub-chunk occupancy (SMEM) gates all work with pl.when.
  Skipped tiles differ from the XLA twin only at sentinel lanes (garbage →
  rest-density fixup / exact ±0 accel), never at real particles.
- The slot (m) sweep is UNROLLED inside the fori body (one iteration per
  (group, dx)): loop-carried tiles round-trip VMEM per iteration, and at
  the force pass's nf+2·ncomp carries that traffic dominated the kernel
  (measured 1.6–2.3× end-to-end from unrolling alone).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sph_tpu.sph import kernels as KN
from sph_tpu.sph.dense import (
    accel_pair_terms,
    combine_mirror_parts,
    density_pair_term,
    density_self_term,
    dys_c,
    sweep_groups,
)

_VMEM_BUDGET = 10 * 2 ** 20


def _interpret() -> bool:
    """Pallas TPU kernels run in interpreter mode on CPU (tests)."""
    return jax.default_backend() != "tpu"


def sub_chunk(spec) -> int:
    """Sub-chunk lane count: the unit of tile-skip and in-kernel iteration.
    A multiple of the row length X (so chunk edges are sentinel margin
    columns — mirror-lump rolls wrap safely) and of 128 (full vregs),
    widened toward 1024 lanes (8 vregs): 1-vreg chunk bodies measured
    ~1.8× slower, and 512 ~15% slower than 1024 with the unrolled sweep.
    (Round 4 tried scaling the target as 8192/K for small-k specs — no
    measurable effect anywhere: the colony sweep is a separate kernel,
    ops/pallas/contact.py, and fluid runs at k=8 where the target is
    already 1024.)"""
    X = spec.X
    base = X * 128 // math.gcd(X, 128)
    nsub = spec.C // base
    m = max(1, 1024 // base)
    while nsub % m:
        m -= 1
    if base * m == X:
        # Wide-domain corner (X a multiple of 128 and ≥ 1024 ⇒ base = X,
        # m = 1): the one-sub-chunk halo tile would be narrower than the
        # ±(X+1) pad. Widen to the smallest divisor of nsub > 1 (nsub = n1
        # here, a multiple of 8, so 2 always works).
        m = 2
        while nsub % m:
            m += 1
    return base * m


def tile_occupancy(occ: jnp.ndarray, spec) -> jnp.ndarray:
    """[N0, K, C] occupancy → [N0, 1, C/SC] i32 sub-chunk flags.

    A chunk is computed iff its own cells hold fluid: own-side contributions
    and mirror emissions both require a real own-side particle."""
    N0, K, C = occ.shape
    sc = sub_chunk(spec)
    t = occ.reshape(N0, K, C // sc, sc).max(axis=(1, 3))
    return (t > 0.5).astype(jnp.int32)[:, None, :]


def _pick_cb(C: int, sc: int, K: int, X: int, nf: int, nz: int,
             n_out: int) -> int:
    """Largest fused-block size whose working set fits the VMEM budget."""
    nsub = C // sc
    best = sc
    for j in range(1, nsub + 1):
        if nsub % j:
            continue
        cb = j * sc
        est = (
            (nf * nz * (cb + 2 * sc) + n_out * cb) * 2   # blocks + halo tiles
            + nf * nz * (cb + 2 * (X + 1))               # pads
            + (nf + n_out + 4) * sc                      # fori carry tiles
        ) * K * 4
        if est <= _VMEM_BUDGET and cb > best:
            best = cb
    return best


def _newton_kernel(*refs, nf: int, ncomp: int, k: int, nz: int, groups,
                   dysc: tuple, X: int, sc: int, nchunk: int, pair_fn,
                   self_init, sign: int):
    """Newton-symmetric fused pair sweep over one (plane, C-block).

    refs: occ_t (SMEM, full chunk-flag row), then per field × zi:
    (main, prev, next) blocks [1, K, CB], then outputs: ncomp own
    accumulators, ncomp m_row parts (if any 'row' group), ncomp m_c parts
    per dy (if any plane group)."""
    occ_t = refs[0]
    fr = refs[1:1 + nf * nz * 3]
    outs = refs[1 + nf * nz * 3:]
    cb0 = pl.program_id(1) * nchunk  # first chunk index of this block
    pad = X + 1

    for o in outs:
        o[0] = jnp.zeros_like(o[0])

    # Row pads per (field, zi): [K, CB + 2(X+1)], halo from the neighbor
    # blocks (clamped fetches at the global edges are inert: the pad region
    # is only ever consumed by sentinel margin rows/columns).
    pads = []
    for f in range(nf):
        row = []
        for zi in range(nz):
            b = (f * nz + zi) * 3
            main, prev, nxt = fr[b], fr[b + 1], fr[b + 2]
            row.append(jnp.concatenate(
                [prev[0][:, -pad:], main[0], nxt[0][:, :pad]], axis=1,
            ))
        pads.append(row)

    dy_out = {}
    oi = ncomp
    if any(g[5] == "row" for g in groups):
        dy_out["row"] = oi
        oi += ncomp
    for dy in dysc:
        dy_out[dy] = oi
        oi += ncomp

    def slot_roll(t, s):
        return jnp.roll(t, -s, axis=0) if s % k else t

    def lane_roll(t, s):
        return jnp.roll(t, -s, axis=1) if s else t

    for ct in range(nchunk):
        @pl.when(occ_t[0, 0, cb0 + ct] > 0)
        def _(ct=ct):
            c0 = ct * sc
            cs = [pads[f][0][:, pad + c0:pad + c0 + sc] for f in range(nf)]
            accs = [
                jnp.full((k, sc), self_init, jnp.float32)
                if (c == 0 and self_init is not None)
                else jnp.zeros((k, sc), jnp.float32)
                for c in range(ncomp)
            ]

            for dz, dy, dxs, ms, mirror_ms, dest in groups:
                ms = list(ms)
                mirror_ms = set(mirror_ms)
                m0, n_m = ms[0], len(ms)
                # Mirror-emitting prefix must be contiguous from m0 so the
                # fori can gate it by iteration count (true for all groups).
                n_mirror = len(mirror_ms)
                assert set(ms[:n_mirror]) == mirror_ms
                for dx in dxs:
                    o = pad + c0 + dy * X + dx
                    base = [pads[f][dz][:, o:o + sc] for f in range(nf)]
                    qs = [slot_roll(b, m0) for b in base]
                    lumps = [jnp.zeros((k, sc), jnp.float32)] * ncomp

                    # Fully unroll the m sweep inside the fori body (one
                    # iteration per (group, dx)): the op SEQUENCE is
                    # identical — accumulation order preserved, the twin
                    # contract holds bit-for-bit — but the loop-carry
                    # round-trips (nf+2·ncomp VMEM tiles per iteration,
                    # which dominated the force pass) disappear. Measured
                    # 1.6× (256k) / 2.3× (1M) end-to-end.
                    U = n_m

                    def body(i, carry, n_mirror=n_mirror, U=U):
                        qs = list(carry[:nf])
                        lm = list(carry[nf:nf + ncomp])
                        accs = list(carry[nf + ncomp:])
                        for u in range(U):
                            ts = pair_fn(*cs, *qs)
                            accs = [a + t for a, t in zip(accs, ts)]
                            gate = (i * U + u < n_mirror).astype(jnp.float32)
                            lm = [m + t * gate for m, t in zip(lm, ts)]
                            qs = [slot_roll(q, 1) for q in qs]
                            lm = [slot_roll(m, 1) for m in lm]
                        return (*qs, *lm, *accs)

                    out = jax.lax.fori_loop(
                        0, n_m // U, body, (*qs, *lumps, *accs)
                    )
                    accs = list(out[nf + ncomp:])
                    # Slot deroll (frame offset m0+n_m), then lane deroll
                    # by dx (row/plane offsets fold globally).
                    lumps = [
                        lane_roll(slot_roll(m, -(m0 + n_m)), -dx)
                        for m in out[nf:nf + ncomp]
                    ]
                    if dest == "acc":
                        accs = [
                            a + m if sign > 0 else a - m
                            for a, m in zip(accs, lumps)
                        ]
                    else:
                        base_o = dy_out[dest]
                        for c in range(ncomp):
                            outs[base_o + c][0, :, c0:c0 + sc] = (
                                outs[base_o + c][0, :, c0:c0 + sc] + lumps[c]
                            )
            for c in range(ncomp):
                outs[c][0, :, c0:c0 + sc] = accs[c]


def _newton_call(fields, occ, spec, pair_fn, ncomp, self_init, sign,
                 flops_per_lane, transc_per_lane, occ_t=None):
    """Shared pallas_call builder for the density / accel / contact sweeps
    over fused [N0, K, C] fields. Returns (own, m_row, m_cs) part arrays
    (combine left to the caller)."""
    N0, K, C = fields[0].shape
    X = spec.X
    nf = len(fields)
    nz = 2 if spec.stencil0 else 1
    groups = sweep_groups(spec)
    has_row = any(g[5] == "row" for g in groups)
    dysc = dys_c(spec) if spec.stencil0 else ()
    n_out = ncomp * (1 + (1 if has_row else 0) + len(dysc))
    sc = sub_chunk(spec)
    CB = _pick_cb(C, sc, K, X, nf, nz, n_out)
    nchunk = CB // sc
    nblocks = C // CB

    if occ_t is None:
        occ_t = tile_occupancy(occ, spec)
    kernel = functools.partial(
        _newton_kernel, nf=nf, ncomp=ncomp, k=K, nz=nz, groups=groups,
        dysc=dysc, X=X, sc=sc, nchunk=nchunk, pair_fn=pair_fn,
        self_init=self_init, sign=sign,
    )
    # SMEM blocks keep trailing dims equal to the array's (Pallas TPU block
    # divisibility rule): whole chunk-flag row, indexed by cb·nchunk + ct.
    occ_spec = pl.BlockSpec(
        (1, 1, C // sc), lambda z, cb: (z, 0, 0), memory_space=pltpu.SMEM
    )
    blk = pl.BlockSpec(
        (1, K, CB), lambda z, cb: (z, 0, cb), memory_space=pltpu.VMEM
    )
    # Halo tiles are ONE sub-chunk (sc ≥ X+1 ≥ the pad width) from the
    # neighbor block's facing edge — not the whole neighbor block, which
    # would triple input HBM traffic (measured −20% at 4M).
    assert sc >= X + 1, (sc, X)
    ntile = C // sc
    nper = CB // sc

    def _spec(dz, db):
        if db == 0:
            return pl.BlockSpec(
                (1, K, CB),
                functools.partial(
                    lambda z, cb, dz=0:
                    (jnp.clip(z + dz, 0, N0 - 1), 0, cb),
                    dz=dz,
                ),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (1, K, sc),
            functools.partial(
                lambda z, cb, dz=0, db=0: (
                    jnp.clip(z + dz, 0, N0 - 1),
                    0,
                    jnp.clip(
                        cb * nper + (-1 if db < 0 else nper), 0, ntile - 1
                    ),
                ),
                dz=dz, db=db,
            ),
            memory_space=pltpu.VMEM,
        )

    field_specs = [
        _spec(dz, db)
        for _f in range(nf)
        for dz in range(nz)
        for db in (0, -1, 1)
    ]
    args = [occ_t]
    for f in fields:
        args.extend([f] * (3 * nz))
    outs = pl.pallas_call(
        kernel,
        grid=(N0, nblocks),
        in_specs=[occ_spec] + field_specs,
        out_specs=[blk] * n_out,
        out_shape=[jax.ShapeDtypeStruct((N0, K, C), jnp.float32)] * n_out,
        cost_estimate=pl.CostEstimate(
            flops=N0 * K * C * flops_per_lane,
            bytes_accessed=N0 * K * C * 4 * (3 * nf * nz + n_out),
            transcendentals=N0 * K * C * transc_per_lane,
        ),
        interpret=_interpret(),
    )(*args)
    own = list(outs[:ncomp])
    oi = ncomp
    m_row = None
    if has_row:
        m_row = list(outs[oi:oi + ncomp])
        oi += ncomp
    m_cs = []
    for _dy in dysc:
        m_cs.append(list(outs[oi:oi + ncomp]))
        oi += ncomp
    return own, m_row, m_cs


def _n_swept(spec) -> int:
    """Swept variants per lane (half the full stencil)."""
    return sum(len(g[2]) * len(list(g[3])) for g in sweep_groups(spec))


def density_pallas(px, py, pz, occ, params, spec,
                   occ_t=None) -> jnp.ndarray:
    """Scaled raw ρ pass (caller applies the occupancy fixup). occ_t: the
    tile_occupancy flags, shareable across the step's passes (occupancy
    only changes at rebins)."""
    h2 = params.h * params.h
    own, m_row, m_cs = _newton_call(
        (px, py, pz), occ, spec,
        pair_fn=lambda *a: density_pair_term(h2, *a),
        ncomp=1, self_init=density_self_term(params), sign=1,
        flops_per_lane=16 * _n_swept(spec), transc_per_lane=0,
        occ_t=occ_t,
    )
    acc = combine_mirror_parts(
        own[0], m_row[0] if m_row else None,
        [m[0] for m in m_cs], spec, sign=1,
    )
    return params.particle_mass * KN.poly6_coeff(params.h, params.ndim) * acc


def accel_pallas(d, pr2, params, spec, occ_t=None):
    """Pressure + viscosity acceleration (no gravity/obstacles here)."""
    m = params.particle_mass
    irho = 1.0 / d.rho
    pair = lambda *a: accel_pair_terms(  # noqa: E731
        params.h,
        float(-m * KN.spiky_grad_coeff(params.h, params.ndim)),
        float(params.viscosity * m
              * KN.viscosity_lap_coeff(params.h, params.ndim)),
        *a,
    )
    fields = (d.px, d.py, d.pz, d.vx, d.vy, d.vz, irho, pr2)
    own, m_row, m_cs = _newton_call(
        fields, d.occ, spec, pair_fn=pair, ncomp=3, self_init=None, sign=-1,
        flops_per_lane=40 * _n_swept(spec),
        transc_per_lane=2 * _n_swept(spec),
        occ_t=occ_t,
    )
    return tuple(
        combine_mirror_parts(
            own[c], m_row[c] if m_row else None,
            [ms[c] for ms in m_cs], spec, sign=-1,
        )
        for c in range(3)
    )
