"""Pallas TPU kernels for the dense-grid SPH hot path.

Same math and data layout as sph_tpu.sph.dense (see its module docstring for
the lane-roll pair-enumeration scheme), with three structural upgrades over
the naive full sweep:

- NEWTON PAIR SYMMETRY: only half the (dz, dy, D) stencil variants are swept
  (groups A/B/C, sph.dense docs); each iteration emits the own-side
  contribution AND the mirror (partner-side) contribution. Mirror tiles ride
  the fori carry and are rolled together with the candidate tiles, so lane
  alignment is free; one static de-roll at group end restores the absolute
  frame. Mirrors that target row+1 / plane+1 are written to separate output
  arrays and folded in by sph.dense.combine_mirror_parts (shared with the
  XLA twin — bit-identical by construction).
- ROW-BLOCKED GRID: the grid is (N0 planes, N1/RB row blocks); row halos
  come from one-tile neighbor-block fetches, bounding VMEM at any problem
  size (1M/4M states, large 2D planes). RB is picked per shape from a VMEM
  budget.
- TILE SKIP: per 8-row tile occupancy (SMEM) gates all work with pl.when —
  empty space costs DMA only. Skipped tiles differ from the XLA twin only at
  sentinel lanes (garbage → rest-density fixup / exact ±0 accel), never at
  real particles.

Bit-identical to the XLA twin at real lanes (tests/test_dense.py); the pair
arithmetic itself is literally shared (sph.dense.density_pair_term /
accel_pair_terms).
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
)

TB = 8  # sublane tile rows
_VMEM_BUDGET = 10 * 2 ** 20


def _interpret() -> bool:
    """Pallas TPU kernels run in interpreter mode on CPU (tests)."""
    return jax.default_backend() != "tpu"


def _roll_lanes(x: jnp.ndarray, d: int) -> jnp.ndarray:
    return jnp.roll(x, -d, axis=1) if d else x


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


def _newton_kernel(*refs, nf: int, ncomp: int, k: int, nz: int, st1: bool,
                   dysc: tuple, nbb: int, pair_fn, self_init, sign: int):
    """Generic Newton-symmetric pair sweep over one (plane, row-block).

    refs: occ_tile (SMEM), then per field × zi: (main, prev-halo, next-halo)
    blocks, then outputs: ncomp own accumulators, ncomp group-B row mirrors
    (if st1), ncomp group-C plane mirrors per dy in dysc (if nz == 2)."""
    occ_t = refs[0]
    fr = refs[1:1 + nf * nz * 3]
    outs = refs[1 + nf * nz * 3:]
    yb0 = pl.program_id(1) * nbb  # first tile index of this row block

    for o in outs:
        o[0] = jnp.zeros_like(o[0])

    # Row pads per (field, zi): [RB+2, L], halo rows from neighbor blocks.
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

    L = pads[0][0].shape[1]
    two_k = 2 * k
    full_d0, full_t = -(2 * k - 1), 4 * k - 1

    for yt in range(nbb):
        @pl.when(occ_t[0, 0, yb0 + yt] > 0)
        def _(yt=yt):
            r0 = yt * TB
            cs = [pads[f][0][r0 + 1:r0 + 1 + TB] for f in range(nf)]
            accs = [
                jnp.full((TB, L), self_init, jnp.float32)
                if (c == 0 and self_init is not None)
                else jnp.zeros((TB, L), jnp.float32)
                for c in range(ncomp)
            ]

            def run(zi, dy, d0, t_count, accs):
                qs = [
                    _roll_lanes(pads[f][zi][r0 + 1 + dy:r0 + 1 + dy + TB], d0)
                    for f in range(nf)
                ]
                ms = [jnp.zeros((TB, L), jnp.float32)] * ncomp

                def body(_i, carry):
                    qs = list(carry[:nf])
                    ms = list(carry[nf:nf + ncomp])
                    accs = list(carry[nf + ncomp:])
                    ts = pair_fn(*cs, *qs)
                    accs = [a + t for a, t in zip(accs, ts)]
                    ms = [m + t for m, t in zip(ms, ts)]
                    qs = [_roll_lanes(q, 1) for q in qs]
                    ms = [_roll_lanes(m, 1) for m in ms]
                    return (*qs, *ms, *accs)

                out = jax.lax.fori_loop(
                    0, t_count, body, (*qs, *ms, *accs)
                )
                m_abs = [
                    _roll_lanes(m, -two_k) for m in out[nf:nf + ncomp]
                ]
                return list(out[nf + ncomp:]), m_abs

            # Group A: same cell column, mirrors fold into the accumulator.
            accs, m_a = run(0, 0, 1, 2 * k - 1, accs)
            accs = [
                a + m if sign > 0 else a - m for a, m in zip(accs, m_a)
            ]
            oi = ncomp
            if st1:
                accs, m_b = run(0, 1, full_d0, full_t, accs)
                for c in range(ncomp):
                    outs[oi + c][0, r0:r0 + TB, :] = m_b[c]
                oi += ncomp
            if nz == 2:
                for dy in dysc:
                    accs, m_c = run(1, dy, full_d0, full_t, accs)
                    for c in range(ncomp):
                        outs[oi + c][0, r0:r0 + TB, :] = m_c[c]
                    oi += ncomp
            for c in range(ncomp):
                outs[c][0, r0:r0 + TB, :] = accs[c]


def _field_specs(nf: int, nz: int, N0: int, N1: int, L: int, RB: int):
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
                (1, RB, L),
                functools.partial(
                    lambda z, yb, dz=0: (jnp.clip(z + dz, 0, N0 - 1), yb, 0),
                    dz=dz,
                ),
                memory_space=pltpu.VMEM,
            ))
            specs.append(pl.BlockSpec(
                (1, TB, L),
                functools.partial(
                    lambda z, yb, dz=0: (
                        jnp.clip(z + dz, 0, N0 - 1),
                        jnp.clip(yb * nbb - 1, 0, nb_tot - 1), 0,
                    ),
                    dz=dz,
                ),
                memory_space=pltpu.VMEM,
            ))
            specs.append(pl.BlockSpec(
                (1, TB, L),
                functools.partial(
                    lambda z, yb, dz=0: (
                        jnp.clip(z + dz, 0, N0 - 1),
                        jnp.clip((yb + 1) * nbb, 0, nb_tot - 1), 0,
                    ),
                    dz=dz,
                ),
                memory_space=pltpu.VMEM,
            ))
    return specs


def _newton_call(fields, occ, spec, pair_fn, ncomp, self_init, sign,
                 flops_per_lane, transc_per_lane):
    """Shared pallas_call builder for the density / accel sweeps. Returns
    (own, m_rowB, m_cs) raw part arrays (combine left to the caller)."""
    N0, N1, L = fields[0].shape
    nf = len(fields)
    nz = 2 if spec.stencil0 else 1
    st1 = spec.stencil1
    dysc = dys_c(spec) if spec.stencil0 else ()
    n_out = ncomp * (1 + (1 if st1 else 0) + len(dysc))
    RB = _pick_rb(N1, L, nf, nz, n_out)
    nbb = RB // TB

    occ_t = tile_occupancy(occ)
    kernel = functools.partial(
        _newton_kernel, nf=nf, ncomp=ncomp, k=spec.k, nz=nz, st1=st1,
        dysc=dysc, nbb=nbb, pair_fn=pair_fn, self_init=self_init, sign=sign,
    )
    # SMEM blocks must keep trailing dims equal to the array's (Pallas TPU
    # block divisibility rule): pass the whole tile-flag row, index by
    # yb·nbb + yt inside the kernel.
    occ_spec = pl.BlockSpec(
        (1, 1, N1 // TB), lambda z, yb: (z, 0, 0), memory_space=pltpu.SMEM
    )
    out_spec = pl.BlockSpec(
        (1, RB, L), lambda z, yb: (z, yb, 0), memory_space=pltpu.VMEM
    )
    args = [occ_t]
    for f in fields:
        args.extend([f] * (3 * nz))
    outs = pl.pallas_call(
        kernel,
        grid=(N0, N1 // RB),
        in_specs=[occ_spec] + _field_specs(nf, nz, N0, N1, L, RB),
        out_specs=[out_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((N0, N1, L), jnp.float32)] * n_out,
        cost_estimate=pl.CostEstimate(
            flops=N0 * N1 * L * flops_per_lane,
            bytes_accessed=N0 * N1 * L * 4 * (3 * nf * nz + n_out),
            transcendentals=N0 * N1 * L * transc_per_lane,
        ),
        interpret=_interpret(),
    )(*args)
    own = list(outs[:ncomp])
    oi = ncomp
    m_rowb = None
    if st1:
        m_rowb = list(outs[oi:oi + ncomp])
        oi += ncomp
    m_cs = []
    for _dy in dysc:
        m_cs.append(list(outs[oi:oi + ncomp]))
        oi += ncomp
    return own, m_rowb, m_cs


def _n_swept(spec) -> int:
    """Swept variants per lane (half the full stencil)."""
    k = spec.k
    n = 2 * k - 1                                   # group A
    if spec.stencil1:
        n += 4 * k - 1                              # group B
    if spec.stencil0:
        n += (4 * k - 1) * len(dys_c(spec))         # group C
    return n


def density_pallas(px, py, pz, occ, params, spec) -> jnp.ndarray:
    """Scaled raw ρ pass (caller applies the occupancy fixup)."""
    h2 = params.h * params.h
    own, m_rowb, m_cs = _newton_call(
        (px, py, pz), occ, spec,
        pair_fn=lambda *a: density_pair_term(h2, *a),
        ncomp=1, self_init=density_self_term(params), sign=1,
        flops_per_lane=16 * _n_swept(spec), transc_per_lane=0,
    )
    acc = combine_mirror_parts(
        own[0], m_rowb[0] if m_rowb else None,
        [m[0] for m in m_cs], spec, sign=1,
    )
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
    own, m_rowb, m_cs = _newton_call(
        fields, d.occ, spec, pair_fn=pair, ncomp=3, self_init=None, sign=-1,
        flops_per_lane=40 * _n_swept(spec),
        transc_per_lane=2 * _n_swept(spec),
    )
    return tuple(
        combine_mirror_parts(
            own[c], m_rowb[c] if m_rowb else None,
            [ms[c] for ms in m_cs], spec, sign=-1,
        )
        for c in range(3)
    )
