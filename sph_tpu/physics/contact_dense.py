"""Contact forces on the dense lane-roll engine — the biology regime's
TPU-fast path.

The sort+gather grid (ops/grid.py) is gather-bound on TPU (~1 GB/s
effective random-gather bandwidth, BASELINE.md); this module runs the SAME
contact model (pair math shared conceptually with physics.contact's
re-specification of SimulateParticles.compute:211-309) on the fused dense
layout of sph/dense.py, where pair enumeration is rolls/slices at HBM
speed. "Two force regimes behind one architecture" (SURVEY §0): the fluid
and contact regimes now share the sweep machinery, spec geometry, Pallas
kernels and rebin-free in-jit packing below.

Unlike the fluid (persistent dense state + staged rebin), the cell sim
keeps the flat SimState as the source of truth — division, adhesion and
rendering all index slots — and packs into the dense layout PER CALL, all
inside jit: cell id → argsort → rank → one scatter in, one gather out.
At cell-sim scales (≤ ~300k) the sort+scatter costs a few ms and the pair
sweep dominates, which is the point.

Newton halving with EXPLICIT mirrors: the repulsion force mirrors as the
exact negation, but the rolling-friction torque's lever arm is the
partner's contact radius (compute:282-284 uses the OWN radius on each
side), so the mirror torque is the shared cross-product base scaled by the
partner's arm — pair_fn returns (force, torque_own, torque_partner·) and
the sweep folds mirrors without a sign flip.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from sph_tpu.core.types import SimParams, SimState
from sph_tpu.sph.dense import (
    SENTINEL,
    DenseSpec,
    _sweep_xla,
    combine_mirror_parts,
)


def make_contact_spec(params: SimParams, k: int = 8,
                      cell_factor: float = 1.05) -> DenseSpec:
    """Dense-grid geometry for the contact regime.

    Interaction reach is eff_i + eff_j ≤ max_radius (contact radii are half
    the visual radius, compute:225), so cell ≥ max_radius makes the ±1
    stencil complete. Domain: the spawn sphere [-R, R]³ plus the margin
    ring (reference grid precedent: SimulateParticles.compute:16-18,
    102-105, which clamps everything into a 32³×4.0 box)."""
    cell = float(params.max_radius) * cell_factor
    r = float(params.spawn_radius)
    n_cells = max(1, int(-(-2.0 * r // cell))) + 2    # + margin ring
    origin = (-r - cell, -r - cell, -r - cell)

    n0 = n_cells
    n1 = -(-n_cells // 8) * 8 if n_cells <= 8 else -(-n_cells // 32) * 32
    lane_mult = max(1, 128 // k)
    n2 = -(-n_cells // lane_mult) * lane_mult
    return DenseSpec(
        n0=n0, n1=n1, n2=n2, k=k, cell=cell, origin=origin,
        ndim=3, axis_map=(0, 1, 2), stencil0=True, stencil1=True,
    )


def contact_pair_terms(params: SimParams,
                       cx, cy, cz, cvx, cvy, cvz, cox, coy, coz, crad,
                       qx, qy, qz, qvx, qvy, qvz, qox, qoy, qoz, qrad):
    """One candidate pair's (force_own[3], torque_own[3], force_mirror[3],
    torque_mirror[3]) — 12 components, explicit-mirror layout.

    Same model as physics.contact.pair_contact (compute:211-309): overlap
    repulsion with falloff², rolling-friction torque from relative surface
    velocity. Sentinel partners self-reject via the overlap test; the self
    pair never appears (group A skips m=0)."""
    eff_i = crad * 0.5
    eff_j = qrad * 0.5
    dx = cx - qx
    dy = cy - qy
    dz = cz - qz
    r2 = dx * dx + dy * dy + dz * dz
    rinv = jax.lax.rsqrt(jnp.maximum(r2, 1e-24))
    dist = r2 * rinv
    sum_r = eff_i + eff_j
    overlap = sum_r - dist
    in_contact = (overlap > params.contact_epsilon).astype(jnp.float32)

    ux, uy, uz = dx * rinv, dy * rinv, dz * rinv
    inv_sum = 1.0 / jnp.maximum(sum_r, 1e-12)
    overlap_falloff = jnp.clip(overlap * inv_sum, 0.0, 1.0)
    falloff = jnp.clip(1.0 - dist * inv_sum, 0.0, 1.0)
    fmag = falloff * params.repulsion_strength * overlap_falloff * in_contact
    fx, fy, fz = ux * fmag, uy * fmag, uz * fmag

    # Relative surface velocity incl. ω×arm terms (compute:263-273).
    # arm_i = -u·eff_i (own side), arm_j = +u·eff_j.
    sivx = cvx + (coy * (-uz * eff_i) - coz * (-uy * eff_i))
    sivy = cvy + (coz * (-ux * eff_i) - cox * (-uz * eff_i))
    sivz = cvz + (cox * (-uy * eff_i) - coy * (-ux * eff_i))
    sjvx = qvx + (qoy * (uz * eff_j) - qoz * (uy * eff_j))
    sjvy = qvy + (qoz * (ux * eff_j) - qox * (uz * eff_j))
    sjvz = qvz + (qox * (uy * eff_j) - qoy * (ux * eff_j))
    rvx, rvy, rvz = sivx - sjvx, sivy - sjvy, sivz - sjvz
    rn = rvx * ux + rvy * uy + rvz * uz
    tx, ty, tz = rvx - ux * rn, rvy - uy * rn, rvz - uz * rn
    slip2 = tx * tx + ty * ty + tz * tz
    slip_inv = jax.lax.rsqrt(jnp.maximum(slip2, 1e-40))
    slip = slip2 * slip_inv
    slipping = in_contact * (slip > params.slip_epsilon).astype(jnp.float32)

    torque_input = jnp.abs(slip * params.torque_factor)
    friction_mag = jnp.minimum(torque_input ** 1.25, 10.0)

    # base = cross(u, f̂·mag)·falloff²·mult; τ_own = base·eff_i,
    # τ_partner = base·eff_j (compute:282-294 — each side's own arm).
    scale = (
        overlap_falloff * overlap_falloff
        * params.rolling_contact_radius_multiplier
        * friction_mag * slip_inv * slipping
    )
    bx = (uy * tz - uz * ty) * scale
    by = (uz * tx - ux * tz) * scale
    bz = (ux * ty - uy * tx) * scale
    return (fx, fy, fz, bx * eff_i, by * eff_i, bz * eff_i,
            -fx, -fy, -fz, bx * eff_j, by * eff_j, bz * eff_j)


def _pack_args(state: SimState, spec: DenseSpec):
    """In-jit pack: (fields [10][Z,K,C], occ, slot_of_particle, overflow)."""
    N = state.capacity
    K = spec.k
    C = spec.C
    slots = spec.n0 * K * C
    alive = jnp.arange(N) < state.active_count

    org = jnp.asarray(spec.origin, jnp.float32)
    wc = jnp.asarray(spec.world_cells(), jnp.int32)
    cc = jnp.clip(((state.pos - org) / spec.cell).astype(jnp.int32),
                  0, wc - 1)
    i0 = cc[:, spec.axis_map[0]]
    i1 = cc[:, spec.axis_map[1]]
    i2 = cc[:, spec.axis_map[2]]
    cid = (i0 * spec.n1 + i1) * spec.n2 + i2
    cid = jnp.where(alive, cid, jnp.int32(spec.n0 * spec.n1 * spec.n2))

    order = jnp.argsort(cid)                      # stable: ties by slot
    cid_s = cid[order]
    starts = jnp.searchsorted(cid_s, cid_s)
    rank = jnp.arange(N) - starts
    fits = alive[order] & (rank < K)
    overflow = jnp.sum(alive[order] & ~fits)

    c = i1[order] * spec.n2 + i2[order]
    flat = i0[order] * (K * C) + rank * C + c     # [Z, K, C] flat index
    flat = jnp.where(fits, flat, slots)

    def scatter(vals, fill):
        out = jnp.full(slots + 1, fill, jnp.float32).at[flat].set(
            jnp.where(fits, vals[order], fill)
        )
        return out[:slots].reshape(spec.n0, K, C)

    px = scatter(state.pos[:, 0], SENTINEL)
    py = scatter(state.pos[:, 1], SENTINEL)
    pz = scatter(state.pos[:, 2], SENTINEL)
    vx = scatter(state.vel[:, 0], 0.0)
    vy = scatter(state.vel[:, 1], 0.0)
    vz = scatter(state.vel[:, 2], 0.0)
    ox = scatter(state.ang_vel[:, 0], 0.0)
    oy = scatter(state.ang_vel[:, 1], 0.0)
    oz = scatter(state.ang_vel[:, 2], 0.0)
    rad = scatter(state.radius, 1.0)
    occ = scatter(jnp.ones(N, jnp.float32), 0.0)

    # slot_of_particle: flat dense slot per original index (slots = dropped).
    slot_of = jnp.full(N, slots, jnp.int32).at[order].set(
        flat.astype(jnp.int32)
    )
    fields = (px, py, pz, vx, vy, vz, ox, oy, oz, rad)
    return fields, occ, slot_of, overflow


def contact_forces_dense(state: SimState, params: SimParams,
                         spec: DenseSpec | None = None):
    """Drop-in alternative to ops.grid.contact_forces_grid: per-particle
    (force [N,3], torque [N,3], overflow) via the dense fused sweep.

    Same physics as contact_forces_bruteforce to float re-association
    tolerance (the dense sweep's pair order differs). Particles that
    overflow their cell's K slots exert/receive no contact force this step;
    the count is returned loudly (policy matches the grid path's counted
    bin overflow)."""
    if spec is None:
        spec = make_contact_spec(
            params, k=params.dense_k, cell_factor=params.dense_cell_factor
        )
    fields, occ, slot_of, overflow = _pack_args(state, spec)

    use_pallas = getattr(params, "use_pallas", False)
    pair = lambda *a: contact_pair_terms(params, *a)  # noqa: E731
    if use_pallas:
        from sph_tpu.ops.pallas.fluid import _newton_call

        own, m_row, m_cs = _newton_call(
            fields, occ, spec, pair_fn=pair, ncomp=6, self_init=None,
            sign=1, flops_per_lane=90 * 54, transc_per_lane=2 * 54,
            explicit_mirror=True,
        )
    else:
        own, m_row, m_cs = _sweep_xla(
            fields, pair, ncomp=6, self_init=None, spec=spec, sign=1,
            explicit_mirror=True,
        )
    comps = [
        combine_mirror_parts(
            own[c], m_row[c] if m_row else None,
            [ms[c] for ms in m_cs], spec, sign=1,
        ).reshape(-1)
        for c in range(6)
    ]
    N = state.capacity
    idx = jnp.minimum(slot_of, comps[0].shape[0] - 1)
    valid = (slot_of < comps[0].shape[0])[:, None].astype(jnp.float32)
    force = jnp.stack([comps[0][idx], comps[1][idx], comps[2][idx]], -1)
    torque = jnp.stack([comps[3][idx], comps[4][idx], comps[5][idx]], -1)
    return force * valid, torque * valid, overflow
