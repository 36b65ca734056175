"""Pallas TPU kernel for the colony contact sweep ([Z, Y, X·K] layout).

Same math and same per-lane accumulation order as
physics.contact_dense._sweep_xla (the pair arithmetic is literally shared:
the caller passes contact_pair_terms down), so the two agree to within
XLA's graph-shape-dependent FMA contraction — the usual twin contract
(tests/test_contact.py, on-chip via bench.py --verify).

Kernel structure:

- Grid (NZ planes × NY/YB row-blocks); each instance computes the full
  62-variant (k=2) sweep for one [YB, L] tile, fully unrolled.
- Partner alignment is STATIC SLICES of a [YB+2, L+2P] halo pad per
  (field, dz): the y halo is one row off each neighbor row-block's facing
  edge (fetched as an 8-row tile, the sublane granularity), the lane halo
  wraps the row (P = 2K−1 lanes, all sentinel x-margin/pad cells), and the
  z halo arrives as clamped neighbor-plane blocks. Clamped/wrapped halo
  values only ever partner sentinel own-lanes, whose pair terms are exact
  zeros — identical to the twin's jnp.roll wraps.
- Own-only full stencil ⇒ 6 outputs, no mirror parts, no fori carries.
- Tile skip: per (plane, row-block) occupancy in SMEM gates the whole
  sweep with pl.when (own-side contributions need a real own particle;
  there are no mirror emissions to lose).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10 * 2 ** 20


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_yb(spec, nf: int, ncomp: int) -> int:
    """Largest row-block (multiple of 8, divides NY, ≤ 48) whose working
    set fits the VMEM budget. Pre-screen, YB 24 beat 48 (finer tile-skip);
    with the contact screen gating the pair math, per-instance FIXED cost
    dominates a settled colony (9 input blocks per field per instance —
    measured ~5 ms of pure DMA/pad overhead at YB 24, 100k colony), so
    fewer, larger instances win."""
    NY, L = spec.ny, spec.L
    P = 2 * spec.k - 1
    best = 8
    for yb in range(8, min(NY, 48) + 1, 8):
        if NY % yb:
            continue
        est = 4 * (
            nf * 3 * ((yb + 2) * (L + 2 * P) + yb * L + 2 * 8 * L)
            + ncomp * 2 * yb * L
        )
        if est <= _VMEM_BUDGET:
            best = yb
    return best


def _contact_kernel(*refs, nf: int, ncomp: int, YB: int, L: int, P: int,
                    pair_fn, screen_fn, variants):
    occ_t = refs[0]
    fr = refs[1:1 + nf * 9]
    outs = refs[1 + nf * 9:]
    yb = pl.program_id(1)

    for o_ref in outs:
        o_ref[0] = jnp.zeros_like(o_ref[0])

    @pl.when(occ_t[0, 0, yb] > 0)
    def _():
        # Halo pads [YB+2, L+2P] per (field, dz): one neighbor-edge row on
        # each y side, wrapped lanes (sentinel) on each lane side.
        pads = []
        cs = []
        for f in range(nf):
            row = []
            for zi in range(3):
                b = (f * 3 + zi) * 3
                main, prev, nxt = fr[b][0], fr[b + 1][0], fr[b + 2][0]
                yp = jnp.concatenate([prev[-1:], main, nxt[:1]], axis=0)
                lp = jnp.concatenate([yp[:, -P:], yp, yp[:, :P]], axis=1)
                row.append(lp)
            pads.append(row)
            cs.append(fr[(f * 3 + 1) * 3][0])   # own block (dz = 0 main)

        # Tile-level dynamic contact skip: max-accumulate the cheap overlap
        # margin (screen_fn, ~13 ops/lane/variant over 4 of the nf fields,
        # pure vector ops) across ALL variants, then gate the full pair
        # sweep (~90 flops + friction sqrt chain over all nf per variant)
        # on ONE scalar reduce. A settled colony (rest length > contact
        # reach) screens out nearly every tile; skipped sweeps would have
        # contributed exact ±0 (see contact_screen's docstring), so the
        # accumulator bits match the twin's. Per-VARIANT pl.when was tried
        # and rejected: 62 scalar reduces + out-ref read-modify-writes per
        # tile ate the savings (measured ~0 net at a 100k colony).
        if screen_fn is not None:
            margin = jnp.full((YB, L), -1.0, jnp.float32)
            for dz, dy, o in variants:
                q4 = [
                    pads[f][dz + 1][1 + dy:1 + dy + YB, P + o:P + o + L]
                    for f in (0, 1, 2, 9)
                ]
                margin = jnp.maximum(
                    margin, screen_fn(cs[0], cs[1], cs[2], cs[9], *q4)
                )
            hit = jnp.max(margin) > 0.0
        else:
            hit = True

        @pl.when(hit)
        def _():
            accs = [jnp.zeros((YB, L), jnp.float32) for _ in range(ncomp)]
            for dz, dy, o in variants:
                qs = [
                    pads[f][dz + 1][1 + dy:1 + dy + YB, P + o:P + o + L]
                    for f in range(nf)
                ]
                ts = pair_fn(*cs, *qs)
                accs = [a + t for a, t in zip(accs, ts)]
            for c in range(ncomp):
                outs[c][0] = accs[c]


def contact_sweep_pallas(fields, occ, spec, pair_fn, ncomp: int = 6,
                         screen_fn=None):
    """Run the full-stencil own-only sweep; returns ncomp [NZ, NY, L]
    accumulators (no combine step — there are no mirror parts).

    screen_fn(cx, cy, cz, crad, qx, qy, qz, qrad) -> margin tile feeds the
    tile-level contact gate (physics.contact_dense.contact_screen
    semantics; None = always run the pair sweep)."""
    from sph_tpu.physics.contact_dense import contact_variants

    NZ, NY, L = fields[0].shape
    nf = len(fields)
    P = 2 * spec.k - 1
    YB = _pick_yb(spec, nf, ncomp)
    nyb = NY // YB
    R = YB // 8                      # 8-row edge tiles per row-block

    # 3D [NZ, 1, nyb] so the SMEM block's trailing dims equal the array's
    # (the Pallas TPU block-divisibility rule).
    occ_t = (
        occ.reshape(NZ, nyb, YB * L).max(axis=2) > 0.5
    ).astype(jnp.int32)[:, None, :]

    variants = contact_variants(spec)
    kernel = functools.partial(
        _contact_kernel, nf=nf, ncomp=ncomp, YB=YB, L=L, P=P,
        pair_fn=pair_fn, screen_fn=screen_fn, variants=variants,
    )

    occ_spec = pl.BlockSpec(
        (1, 1, nyb), lambda z, yb: (z, 0, 0), memory_space=pltpu.SMEM
    )

    def _main_spec(dz):
        return pl.BlockSpec(
            (1, YB, L),
            functools.partial(
                lambda z, yb, dz=0: (jnp.clip(z + dz, 0, NZ - 1), yb, 0),
                dz=dz,
            ),
            memory_space=pltpu.VMEM,
        )

    def _edge_spec(dz, side):
        # side = -1: last 8-row tile of row-block yb−1; +1: first of yb+1.
        return pl.BlockSpec(
            (1, 8, L),
            functools.partial(
                lambda z, yb, dz=0, side=0: (
                    jnp.clip(z + dz, 0, NZ - 1),
                    jnp.clip(
                        yb * R + (-1 if side < 0 else R), 0, NY // 8 - 1
                    ),
                    0,
                ),
                dz=dz, side=side,
            ),
            memory_space=pltpu.VMEM,
        )

    field_specs = []
    args = [occ_t]
    for f in fields:
        for dz in (-1, 0, 1):
            field_specs += [_main_spec(dz), _edge_spec(dz, -1),
                            _edge_spec(dz, 1)]
            args += [f, f, f]

    n_var = len(variants)
    outs = pl.pallas_call(
        kernel,
        grid=(NZ, nyb),
        in_specs=[occ_spec] + field_specs,
        out_specs=[_main_spec(0)] * ncomp,
        out_shape=[jax.ShapeDtypeStruct((NZ, NY, L), jnp.float32)] * ncomp,
        cost_estimate=pl.CostEstimate(
            flops=NZ * NY * L * 90 * n_var,
            bytes_accessed=NZ * NY * L * 4 * (3 * nf + ncomp),
            transcendentals=NZ * NY * L * 2 * n_var,
        ),
        # The unrolled screen + pair loops overflow the default 16 MiB
        # scoped-vmem stack at YB 24 (measured 19.6 MiB at the 100k colony
        # spec); v5e has 128 MiB VMEM per core, so a 64 MiB scope is safe.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20,
        ),
        interpret=_interpret(),
    )(*args)
    return list(outs)
