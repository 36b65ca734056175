"""Pallas TPU kernels for the dense-grid SPH hot path.

Same math as sph_tpu.sph.dense's XLA twin — the pair arithmetic is literally
shared (sph.dense.density_pair_term / accel_pair_terms) and both paths use
the same per-element accumulation order, so they agree to within XLA's
graph-shape-dependent FMA contraction (~1 ulp of the sums; asserted at
tight tolerance in tests/test_dense.py and on-chip by bench.py --verify).

Structure (see sph.dense's sweep docs for the full derivation):

- TRANSPOSED TILES [rows, K(slots, sublanes), X(cells, lanes)]: measured on
  this VPU, lane rolls cost ~28 fma-equivalents per element while sublane
  rolls are free. The slot-offset sweep (m) rides sublanes; only the cell
  offset dx ∈ {−1,0,+1} needs lane rolls — one per field per group instead
  of one per pair iteration (~15× fewer lane-roll bytes than the canonical
  lane-major sweep).
- NEWTON PAIR SYMMETRY: groups A/B/C/D sweep half the (dz, dy, dx, m)
  variant space; each iteration also emits the mirror (partner-side)
  contribution. Mirror lumps ride the fori carry slot-rolled (free
  alignment); in-plane mirrors (A, B) fold straight into the accumulator,
  row/plane-crossing mirrors (C, D) go to separate outputs folded by
  sph.dense.combine_mirror_parts.
- ROW-BLOCKED GRID (N0 planes × N1/RB row blocks) with one-tile neighbor
  halo fetches: bounds VMEM at any problem size. RB picked per shape.
- TILE SKIP: per 8-row tile occupancy (SMEM) gates all work with pl.when.
  Skipped tiles differ from the XLA twin only at sentinel lanes (garbage →
  rest-density fixup / exact ±0 accel), never at real particles.
"""

from __future__ import annotations

import functools

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
    from_transposed,
    sweep_groups,
    to_transposed,
)

TB = 8  # sublane tile rows
_VMEM_BUDGET = 10 * 2 ** 20


def _interpret() -> bool:
    """Pallas TPU kernels run in interpreter mode on CPU (tests)."""
    return jax.default_backend() != "tpu"


def tile_occupancy(occ: jnp.ndarray) -> jnp.ndarray:
    """[N0, N1, L] occupancy → [N0, 1, N1/TB] i32 tile flags.

    A tile is computed iff its own rows hold fluid: own-side contributions
    and mirror emissions both require a real own-side particle."""
    N0, N1, L = occ.shape
    t = occ.reshape(N0, N1 // TB, TB * L).max(axis=-1)
    return (t > 0.5).astype(jnp.int32)[:, None, :]


def _pick_rb(N1: int, L: int, nf: int, nz: int, n_out: int) -> int:
    """Largest row-block size whose working set fits the VMEM budget."""
    nb = N1 // TB
    best = TB
    for nbb in range(1, nb + 1):
        if nb % nbb:
            continue
        rb = nbb * TB
        est = (
            (nf * nz * (rb + 2 * TB) + n_out * rb) * 2   # blocks, dbl-buffered
            + nf * nz * (rb + 2)                          # pads
            + (nf + 7) * TB                               # fori carry tiles
        ) * L * 4
        if est <= _VMEM_BUDGET and rb > best:
            best = rb
    return best


def _newton_kernel(*refs, nf: int, ncomp: int, k: int, nz: int, groups,
                   dysc: tuple, nbb: int, pair_fn, self_init, sign: int):
    """Newton-symmetric transposed pair sweep over one (plane, row-block).

    refs: occ_tile (SMEM, full tile-flag row), then per field × zi:
    (main, prev-halo, next-halo) blocks [1, rows, K, X], then outputs:
    ncomp own accumulators, ncomp m_row parts (if any 'row' group), ncomp
    m_c parts per dy (if any plane group)."""
    occ_t = refs[0]
    fr = refs[1:1 + nf * nz * 3]
    outs = refs[1 + nf * nz * 3:]
    yb0 = pl.program_id(1) * nbb  # first tile index of this row block

    for o in outs:
        o[0] = jnp.zeros_like(o[0])

    # Row pads per (field, zi): [RB+2, K, X], halo rows from neighbor blocks.
    pads = []
    for f in range(nf):
        row = []
        for zi in range(nz):
            b = (f * nz + zi) * 3
            main, prev, nxt = fr[b], fr[b + 1], fr[b + 2]
            row.append(
                jnp.concatenate([prev[0][-1:], main[0], nxt[0][:1]], axis=0)
            )
        pads.append(row)

    X = pads[0][0].shape[2]
    dy_out = {}
    oi = ncomp
    if any(g[5] == "row" for g in groups):
        dy_out["row"] = oi
        oi += ncomp
    for dy in dysc:
        dy_out[dy] = oi
        oi += ncomp

    def slot_roll(t, s):
        return jnp.roll(t, -s, axis=1) if s % k else t

    def lane_roll(t, s):
        return jnp.roll(t, -s, axis=2) if s else t

    for yt in range(nbb):
        @pl.when(occ_t[0, 0, yb0 + yt] > 0)
        def _(yt=yt):
            r0 = yt * TB
            cs = [pads[f][0][r0 + 1:r0 + 1 + TB] for f in range(nf)]
            accs = [
                jnp.full((TB, k, X), self_init, jnp.float32)
                if (c == 0 and self_init is not None)
                else jnp.zeros((TB, k, X), jnp.float32)
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
                    base = [
                        lane_roll(
                            pads[f][dz][r0 + 1 + dy:r0 + 1 + dy + TB], dx
                        )
                        for f in range(nf)
                    ]
                    qs = [slot_roll(b, m0) for b in base]
                    lumps = [jnp.zeros((TB, k, X), jnp.float32)] * ncomp

                    def body(i, carry, n_mirror=n_mirror):
                        qs = list(carry[:nf])
                        lm = list(carry[nf:nf + ncomp])
                        accs = list(carry[nf + ncomp:])
                        ts = pair_fn(*cs, *qs)
                        accs = [a + t for a, t in zip(accs, ts)]
                        gate = (i < n_mirror).astype(jnp.float32)
                        lm = [m + t * gate for m, t in zip(lm, ts)]
                        qs = [slot_roll(q, 1) for q in qs]
                        lm = [slot_roll(m, 1) for m in lm]
                        return (*qs, *lm, *accs)

                    out = jax.lax.fori_loop(
                        0, n_m, body, (*qs, *lumps, *accs)
                    )
                    accs = list(out[nf + ncomp:])
                    # Slot deroll (frame offset m0+n_m), then lane deroll.
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
                            outs[base_o + c][0, r0:r0 + TB] = (
                                outs[base_o + c][0, r0:r0 + TB] + lumps[c]
                            )
            for c in range(ncomp):
                outs[c][0, r0:r0 + TB] = accs[c]


def _field_specs(nf: int, nz: int, N0: int, N1: int, K: int, X: int, RB: int):
    """Per (field, zi): main block + prev/next row-halo tiles. dz offsets
    clamp at the top plane and yb offsets clamp at the global row edges —
    both inert, since the clamped rows/planes only ever pair with the
    sentinel margin (see module docstring)."""
    nbb = RB // TB
    nb_tot = N1 // TB
    specs = []
    for _f in range(nf):
        for dz in range(nz):
            specs.append(pl.BlockSpec(
                (1, RB, K, X),
                functools.partial(
                    lambda z, yb, dz=0:
                    (jnp.clip(z + dz, 0, N0 - 1), yb, 0, 0),
                    dz=dz,
                ),
                memory_space=pltpu.VMEM,
            ))
            specs.append(pl.BlockSpec(
                (1, TB, K, X),
                functools.partial(
                    lambda z, yb, dz=0: (
                        jnp.clip(z + dz, 0, N0 - 1),
                        jnp.clip(yb * nbb - 1, 0, nb_tot - 1), 0, 0,
                    ),
                    dz=dz,
                ),
                memory_space=pltpu.VMEM,
            ))
            specs.append(pl.BlockSpec(
                (1, TB, K, X),
                functools.partial(
                    lambda z, yb, dz=0: (
                        jnp.clip(z + dz, 0, N0 - 1),
                        jnp.clip((yb + 1) * nbb, 0, nb_tot - 1), 0, 0,
                    ),
                    dz=dz,
                ),
                memory_space=pltpu.VMEM,
            ))
    return specs


def _newton_call(fields, occ, spec, pair_fn, ncomp, self_init, sign,
                 flops_per_lane, transc_per_lane):
    """Shared pallas_call builder for the density / accel sweeps. Takes
    canonical [N0, N1, L] fields, returns transposed (own, m_row, m_cs)
    part arrays (combine + back-transpose left to the caller)."""
    N0, N1, L = fields[0].shape
    K = spec.k
    X = L // K
    nf = len(fields)
    nz = 2 if spec.stencil0 else 1
    groups = sweep_groups(spec)
    has_row = any(g[5] == "row" for g in groups)
    dysc = dys_c(spec) if spec.stencil0 else ()
    n_out = ncomp * (1 + (1 if has_row else 0) + len(dysc))
    RB = _pick_rb(N1, L, nf, nz, n_out)
    nbb = RB // TB

    occ_t = tile_occupancy(occ)
    fields_t = [to_transposed(f, K) for f in fields]
    kernel = functools.partial(
        _newton_kernel, nf=nf, ncomp=ncomp, k=K, nz=nz, groups=groups,
        dysc=dysc, nbb=nbb, pair_fn=pair_fn, self_init=self_init, sign=sign,
    )
    # SMEM blocks keep trailing dims equal to the array's (Pallas TPU block
    # divisibility rule): whole tile-flag row, indexed by yb·nbb + yt.
    occ_spec = pl.BlockSpec(
        (1, 1, N1 // TB), lambda z, yb: (z, 0, 0), memory_space=pltpu.SMEM
    )
    out_spec = pl.BlockSpec(
        (1, RB, K, X), lambda z, yb: (z, yb, 0, 0), memory_space=pltpu.VMEM
    )
    args = [occ_t]
    for f in fields_t:
        args.extend([f] * (3 * nz))
    outs = pl.pallas_call(
        kernel,
        grid=(N0, N1 // RB),
        in_specs=[occ_spec] + _field_specs(nf, nz, N0, N1, K, X, RB),
        out_specs=[out_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((N0, N1, K, X), jnp.float32)] * n_out,
        cost_estimate=pl.CostEstimate(
            flops=N0 * N1 * L * flops_per_lane,
            bytes_accessed=N0 * N1 * L * 4 * (3 * nf * nz + n_out),
            transcendentals=N0 * N1 * L * transc_per_lane,
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


def density_pallas(px, py, pz, occ, params, spec) -> jnp.ndarray:
    """Scaled raw ρ pass (caller applies the occupancy fixup)."""
    h2 = params.h * params.h
    own, m_row, m_cs = _newton_call(
        (px, py, pz), occ, spec,
        pair_fn=lambda *a: density_pair_term(h2, *a),
        ncomp=1, self_init=density_self_term(params), sign=1,
        flops_per_lane=16 * _n_swept(spec), transc_per_lane=0,
    )
    acc = from_transposed(combine_mirror_parts(
        own[0], m_row[0] if m_row else None,
        [m[0] for m in m_cs], spec, sign=1,
    ))
    return params.particle_mass * KN.poly6_coeff(params.h, params.ndim) * acc


def accel_pallas(d, pr2, params, spec):
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
    )
    return tuple(
        from_transposed(combine_mirror_parts(
            own[c], m_row[c] if m_row else None,
            [ms[c] for ms in m_cs], spec, sign=-1,
        ))
        for c in range(3)
    )
