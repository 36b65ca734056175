"""Slot-resident biology stepping: run the colony step IN the dense layout.

DEMOTED TO AN EXPERIMENT (round 5, VERDICT r4 weak #5): this engine lost
2.2x at the only regime the ladder exercises (40.3 vs 18.6 ms/step at a
settled 100k bonded colony — slots/N ≈ 21.6 makes every slot-space pass
pay ~20x the rows the classic path's per-step pack buys back), and the
round-5 attempt to time its target regime (a compressed colony at
rest length 1.6 < contact reach, slots/N → ~2, k=4) hit a compile wall:
the k=4 full-stencil sweep's ~134 unrolled variants did not finish
compiling through the relay within a 35-minute budget, so no winning
config is RECORDED. The machinery is kept here — correct, window-gated,
and covered by experiments/test_resident.py (`python -m pytest
experiments/ -q`) — but it no longer ships as product surface: the
SimParams.resident flag is inert and Simulation never dispatches here.

The classic per-step path (engine/step.py) re-packs the [Z, Y, X·K] contact
layout from particle order every step and gathers forces back (~2.9 ms pack
+ ~1.1 ms unpack of an 18.6 ms step at a 100k bonded colony). This module
removes that cost the way the fluid engine does (sph/dense.py): state LIVES
in slot space across a window of steps, and the particle-order SimState is
only refreshed at window boundaries.

MEASURED TRADE (v5e, tools/probe_resident.py, 100k bonded colony): the
window LOSES at colony occupancy — 40.3 ms/step resident vs 18.6 classic.
A bonded colony is sparse in contact cells by construction (adhesion rest
length ≈ 1.85× contact reach ⇒ ~0.3 centers/cell ⇒ slots ≈ 21.6× N), so
running integrate/adhesion/drag over all slots costs ~25 ms — far more
than the ~4 ms of pack/unpack it amortizes away. The classic path packs
per step precisely so every other pass runs on N rows; that asymmetry is
the right default for this regime. Kept as an opt-in (SimParams.resident)
because the machinery is the correct shape wherever slots/N approaches 1
(high-occupancy packings), and its tests pin the window/gate semantics.

Window contract (all conditions checked on device, per substep):

- resident substeps run ONLY while the topology is frozen: no split queued
  (pending.count == 0), no division timer will cross this step
  (biology.division.division_ready — bit-identical arithmetic to
  queue_splits), and the bond table is settled (no created_step within 2
  steps: update_bond_zones and filter_bonds are provable no-ops then, the
  same fixed-point argument as biology/bonds.py filter_bonds).
- binning stays valid by the fluid engine's drift argument: positions move
  in slot space, cell assignment is frozen, and the full-stencil sweep
  still enumerates every pair within reach while accumulated per-particle
  drift ≤ (cell − max_radius)/2 (pairs pushed past the stencil by drift
  self-reject arithmetically, exactly like the ±2-cell lanes —
  contact_dense.py module docstring). Exceeding the budget triggers a
  refresh + repack, not a velocity clamp: colony physics is never altered.
- a pack that drops particles (cell overflow > 0) disables resident
  substeps for the REST OF THE WINDOW (sticky): a dropped particle would
  be frozen in slot space, not merely lose contact forces like the classic
  path's counted drop. Size dense_k for the colony (bench does).

Every other step runs the classic engine/step.py path (division bursts,
young-bond zone/anchor refresh, pruning), on a state refreshed from slot
space by ONE wide-row gather.

Semantics: the slot twins call the SAME core functions as the classic
passes (physics.integrate.motion_core/rotation_core,
physics.adhesion.bond_pair_deltas/accumulate_bond_deltas,
physics.contact_dense pair math), so per-particle arithmetic is identical;
results differ from the classic path only by (a) XLA's graph-shape-
dependent FMA contraction (the usual last-ulp twin contract) and (b) the
classic path re-binning every step, which reorders pair accumulation once
drift moves a particle across a cell boundary — the same documented
tolerance as the fluid engine's rebin_every (tests/test_resident.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from sph_tpu.biology.division import division_ready, queue_splits
from sph_tpu.core import quat
from sph_tpu.core.types import (
    GenomeDevice,
    SimParams,
    SimState,
    pytree_dataclass,
)
from sph_tpu.physics.adhesion import (
    accumulate_bond_deltas,
    bond_pair_deltas,
    bond_spring_params,
)
from sph_tpu.physics.contact_dense import (
    FIELD_FILLS,
    OCC_FILL,
    ContactSpec,
    _scatter_table,
    _sort_particles,
    _sweep_xla,
    contact_pair_terms,
    contact_screen,
    make_contact_spec,
)
from sph_tpu.physics.integrate import motion_core, rotation_core

# Fills for the 7 resident-only planar fields (qx qy qz qw, mass, inertia,
# dragc): identity quaternion keeps quat math on empty lanes finite, unit
# mass/inertia keep the masked-out divisions finite.
RESIDENT_EXTRA_FILLS = (0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0)


@pytree_dataclass
class ResidentCache:
    """Slot-space mirror of the motion state + frozen-topology precomputes.

    fields: 17 planar [Z, Y, L] arrays — px py pz vx vy vz ox oy oz rad
    (the contact sweep's 10, in its order), then qx qy qz qw mass inertia
    dragc. occ is the usual occupancy plane. slot_of maps particle row →
    flat slot (spec.slots = unmapped). The b* arrays precompute, per bond,
    what is frozen while the topology is: endpoint slot rows (spec.slots =
    invalid), validity, and the uid-quirk spring params (CAM:537/:559 via
    adhesion.bond_spring_params). drift accumulates the max per-substep
    displacement since the pack; packed says whether any of this reflects
    the current state. overflow is STICKY across invalidation (see module
    docstring)."""

    fields: tuple
    occ: jnp.ndarray
    slot_of: jnp.ndarray
    bseg_a: jnp.ndarray
    bseg_b: jnp.ndarray
    b_valid: jnp.ndarray
    b_rest: jnp.ndarray
    b_stiff: jnp.ndarray
    b_damp: jnp.ndarray
    b_astiff: jnp.ndarray
    overflow: jnp.ndarray
    drift: jnp.ndarray
    packed: jnp.ndarray


def empty_cache(state: SimState, spec: ContactSpec) -> ResidentCache:
    """A not-packed cache with the right static shapes."""
    shape = spec.shape()
    B = state.bonds.capacity
    zf = lambda: jnp.zeros(shape, jnp.float32)  # noqa: E731
    zb = lambda dt=jnp.float32: jnp.zeros((B,), dt)  # noqa: E731
    return ResidentCache(
        fields=tuple(zf() for _ in range(17)),
        occ=zf(),
        slot_of=jnp.zeros((state.capacity,), jnp.int32),
        bseg_a=zb(jnp.int32), bseg_b=zb(jnp.int32), b_valid=zb(bool),
        b_rest=zb(), b_stiff=zb(), b_damp=zb(), b_astiff=zb(),
        overflow=jnp.int32(0), drift=jnp.float32(0.0),
        packed=jnp.bool_(False),
    )


def pack_resident(state: SimState, genome: GenomeDevice,
                  spec: ContactSpec) -> ResidentCache:
    """Scatter the motion state into slot space and freeze the per-bond
    precomputes. state must be FRESH (particle-order columns current)."""
    N = state.capacity
    order, flat, fits, overflow, slot_of = _sort_particles(state, spec)
    tbl = jnp.concatenate(
        [state.pos, state.vel, state.ang_vel, state.radius[:, None],
         jnp.ones((N, 1), jnp.float32),            # occ column (index 10)
         state.rot, state.mass[:, None], state.inertia[:, None],
         state.drag[:, None]], axis=1,
    )                                              # [N, 18]
    fills = FIELD_FILLS + (OCC_FILL,) + RESIDENT_EXTRA_FILLS
    arrs = _scatter_table(tbl, fills, order, flat, fits, spec)
    fields = tuple(arrs[:10]) + tuple(arrs[11:])
    occ = arrs[10]

    b = state.bonds
    valid = b.active & (b.slot_a >= 0) & (b.slot_b >= 0)
    sa = slot_of[jnp.clip(b.slot_a, 0, N - 1)]
    sb = slot_of[jnp.clip(b.slot_b, 0, N - 1)]
    bseg_a = jnp.where(valid, jnp.minimum(sa, spec.slots), spec.slots)
    bseg_b = jnp.where(valid, jnp.minimum(sb, spec.slots), spec.slots)
    rest, stiff, damp, astiff = bond_spring_params(b, genome)
    return ResidentCache(
        fields=fields, occ=occ, slot_of=slot_of,
        bseg_a=bseg_a, bseg_b=bseg_b, b_valid=valid,
        b_rest=rest, b_stiff=stiff, b_damp=damp, b_astiff=astiff,
        overflow=overflow.astype(jnp.int32), drift=jnp.float32(0.0),
        packed=jnp.bool_(True),
    )


def refresh_state(state: SimState, cache: ResidentCache,
                  spec: ContactSpec) -> SimState:
    """Gather the slot-resident motion columns back into particle order
    (ONE wide-row gather). Particles without a slot (dead, or dropped at a
    pack — resident substeps never ran then) keep their state columns."""
    f = cache.fields
    cols = [f[i] for i in (0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 11, 12, 13)]
    rows = jnp.stack([c.reshape(-1) for c in cols], axis=1)  # [slots, 13]
    rows = jnp.concatenate(
        [rows, jnp.zeros((1, rows.shape[1]), jnp.float32)], axis=0
    )
    idx = jnp.minimum(cache.slot_of, spec.slots)
    g = rows[idx]                                            # [N, 13]
    mapped = (cache.slot_of < spec.slots)[:, None]
    return state.replace_fields(
        pos=jnp.where(mapped, g[:, 0:3], state.pos),
        vel=jnp.where(mapped, g[:, 3:6], state.vel),
        ang_vel=jnp.where(mapped, g[:, 6:9], state.ang_vel),
        rot=jnp.where(mapped, g[:, 9:13], state.rot),
    )


def _stack3(x, y, z):
    return jnp.stack([x.reshape(-1), y.reshape(-1), z.reshape(-1)], axis=-1)


def resident_substep(state: SimState, cache: ResidentCache,
                     params: SimParams, genome: GenomeDevice,
                     spec: ContactSpec, dt):
    """One full frame in slot space, in the classic dispatch order
    (engine/step.py / DESIGN.md §3). Preconditions (enforced by the gate in
    run_steps_resident): pending empty, no timer fires, bonds settled,
    pack overflow 0, drift within budget. Under those, the skipped passes
    (process_pending_splits, update_bond_zones, filter_bonds) are provable
    no-ops and every executed pass is the classic core on identical values.
    """
    # 1-2. Division bookkeeping: pending is empty (process_pending_splits
    # would be identity); queue_splits reduces to the timer advance — its
    # geometry branch is gated on jnp.any(ready), false here.
    state = queue_splits(state, params, genome, dt=dt)

    (px, py, pz, vx, vy, vz, ox, oy, oz, rad,
     qx, qy, qz, qw, mass, inertia, dragc) = cache.fields
    occ = cache.occ
    S = spec.slots
    mk = (occ > 0.5).reshape(-1)                   # [slots]

    # 3-4. Contact sweep (planar) + apply (compute:302-306).
    pair = lambda *a: contact_pair_terms(params, *a)  # noqa: E731
    screen = lambda *a: contact_screen(params, *a)  # noqa: E731
    f10 = (px, py, pz, vx, vy, vz, ox, oy, oz, rad)
    if getattr(params, "use_pallas", False):
        from sph_tpu.ops.pallas.contact import contact_sweep_pallas

        comps = contact_sweep_pallas(
            f10, occ, spec, pair, ncomp=6, screen_fn=screen
        )
    else:
        comps = _sweep_xla(f10, pair, ncomp=6, spec=spec)
    force = _stack3(*comps[:3])
    torque = _stack3(*comps[3:])

    pos = _stack3(px, py, pz)
    vel = _stack3(vx, vy, vz)
    ang = _stack3(ox, oy, oz)
    rotq = jnp.stack(
        [qx.reshape(-1), qy.reshape(-1), qz.reshape(-1), qw.reshape(-1)],
        axis=-1,
    )
    massf = mass.reshape(-1)
    inertf = inertia.reshape(-1)
    m1 = mk[:, None]

    vel = vel + jnp.where(m1, force / massf[:, None] * dt, 0.0)
    ang = ang + jnp.where(m1, torque / inertf[:, None] * dt, 0.0)
    accum = jnp.where(m1, torque * dt, 0.0)        # drained by pass 8

    # 5. Adhesion (K10/K11) on slot rows — same cores as apply_adhesion.
    rows = jnp.concatenate(
        [pos, vel, rotq, massf[:, None],
         jnp.zeros((S, 1), jnp.float32)], axis=1,
    )                                              # [slots, 12]
    fill_row = jnp.asarray(
        [[0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 0]], jnp.float32
    )
    rows = jnp.concatenate([rows, fill_row], axis=0)
    ga, gb = rows[cache.bseg_a], rows[cache.bseg_b]
    dv_a, dq_a, dv_b, dq_b = bond_pair_deltas(
        state.bonds, cache.b_valid,
        cache.b_rest, cache.b_stiff, cache.b_damp, cache.b_astiff,
        ga[:, 0:3], ga[:, 3:6], ga[:, 6:10], ga[:, 10],
        gb[:, 0:3], gb[:, 3:6], gb[:, 6:10], gb[:, 10],
        params, dt,
    )
    dv, dq = accumulate_bond_deltas(
        dv_a, dq_a, dv_b, dq_b, cache.bseg_a, cache.bseg_b, S
    )
    vel = jnp.where(m1, vel + dv, vel)
    rotq = jnp.where(m1, quat.normalize(rotq + dq), rotq)

    # 6. Drag impulse (K5). Same as physics.drag on the mapped slot. (The
    # classic path would also nudge a DEAD selected slot's velocity — dead
    # rows are unmapped here, so that unreachable-via-pick quirk is not
    # reproduced.)
    d = state.drag_input
    sel = d.selected_slot
    pslot = cache.slot_of[jnp.clip(sel, 0, state.capacity - 1)]
    dvalid = (sel >= 0) & (sel < state.capacity) & (pslot < S)
    safe = jnp.minimum(pslot, S - 1)
    to_target = d.target - pos[safe]
    impulse = to_target * d.strength * dt / massf[safe]
    vel = vel.at[safe].add(jnp.where(dvalid, impulse, 0.0))

    # 7. Motion (K6) + drift accounting: the slot-space position move this
    # substep, maxed over occupied lanes (boundary projection included —
    # the budget tracks actual displacement, not speed).
    radf = rad.reshape(-1)
    dragf = dragc.reshape(-1)
    pos_n, vel, ang = motion_core(
        pos, vel, ang, radf, inertf, dragf, mk, params, dt
    )
    disp = jnp.linalg.norm(pos_n - pos, axis=-1)
    drift = cache.drift + jnp.max(jnp.where(mk, disp, 0.0))

    # 8. Rotation (K7): drain the accumulator.
    rotq, ang = rotation_core(rotq, ang, accum, inertf, mk, params, dt)

    # 9-10. update_bond_zones / filter_bonds: settled ⇒ no-ops (gated).
    shape = spec.shape()
    c3 = lambda a, i: a[:, i].reshape(shape)  # noqa: E731
    fields = (
        c3(pos_n, 0), c3(pos_n, 1), c3(pos_n, 2),
        c3(vel, 0), c3(vel, 1), c3(vel, 2),
        c3(ang, 0), c3(ang, 1), c3(ang, 2), rad,
        c3(rotq, 0), c3(rotq, 1), c3(rotq, 2), c3(rotq, 3),
        mass, inertia, dragc,
    )
    state = state.replace_fields(step_count=state.step_count + 1)
    cache = dataclasses.replace(cache, fields=fields, drift=drift)
    return state, cache


def resident_gate(state: SimState, params: SimParams, genome: GenomeDevice,
                  dt):
    """True when this step is provably topology-quiet: nothing pending from
    last step, no division timer crosses (bit-identical test to
    queue_splits), and the bond table is settled (the filter_bonds /
    update_bond_zones fixed-point window, biology/bonds.py)."""
    _, ready, _ = division_ready(state, params, genome, dt=dt)
    bonds_dirty = jnp.any(
        state.bonds.created_step >= state.step_count - 2
    )
    return (
        (state.pending.count == 0) & ~jnp.any(ready) & ~bonds_dirty
    )


def drift_margin(params: SimParams, spec: ContactSpec) -> float:
    """Per-particle drift budget: cell ≥ max_radius + 2·D keeps the frozen
    ±1-cell stencil complete AND keeps beyond-stencil pairs out of contact
    (see module docstring)."""
    return (spec.cell - float(params.max_radius)) * 0.5


def run_steps_resident(state: SimState, params: SimParams,
                       genome: GenomeDevice, n_steps: int, dt=None,
                       spec: ContactSpec | None = None) -> SimState:
    """Roll n steps, resident where the gate allows, classic elsewhere.
    Drop-in for engine.step.run_steps when neighbor_mode == 'dense' and no
    sharded contact_fn is installed (the resident window is single-device;
    Simulation(mesh=...) keeps the classic path)."""
    from sph_tpu.engine.step import step as classic_step

    if spec is None:
        spec = make_contact_spec(
            params, k=params.dense_k, cell_factor=params.dense_cell_factor
        )
    dt_ = params.dt if dt is None else dt
    margin = drift_margin(params, spec)

    def _refresh(sc):
        return refresh_state(sc[0], sc[1], spec), sc[1]

    def substep(carry, _):
        state, cache = carry
        ok = resident_gate(state, params, genome, dt_)

        # (Re)pack when resident could run but the slot mirror is missing
        # or drift-expired. overflow is sticky: once a pack dropped a
        # particle, stop trying for the rest of the window.
        need_pack = (
            ok & (cache.overflow == 0)
            & (~cache.packed | (cache.drift > margin))
        )

        def do_pack(sc):
            st, c = sc
            st = jax.lax.cond(c.packed, _refresh, lambda x: x, (st, c))[0]
            return st, pack_resident(st, genome, spec)

        state, cache = jax.lax.cond(
            need_pack, do_pack, lambda sc: sc, (state, cache)
        )

        use_res = (
            ok & cache.packed & (cache.overflow == 0)
            & (cache.drift <= margin)
        )

        def res(sc):
            return resident_substep(sc[0], sc[1], params, genome, spec, dt_)

        def cls(sc):
            st, c = sc
            st = jax.lax.cond(c.packed, _refresh, lambda x: x, (st, c))[0]
            st = classic_step(st, params, genome, dt=dt_)
            return st, dataclasses.replace(c, packed=jnp.bool_(False))

        return jax.lax.cond(use_res, res, cls, (state, cache)), None

    cache0 = empty_cache(state, spec)
    (state, cache), _ = jax.lax.scan(
        substep, (state, cache0), None, length=n_steps
    )
    state = jax.lax.cond(cache.packed, _refresh, lambda x: x,
                         (state, cache))[0]
    return state
