"""Slot-resident windowed stepping (physics/resident.py) vs the classic
per-step path (engine/step.py).

ONE resident substep (pack → slot frame → refresh) is bitwise the classic
step — the slot twins really are the same arithmetic, asserted exactly
below with no window machinery in between. Across a multi-step window
bitwise CANNOT hold by design: the classic path re-bins every step, and
even a settled colony moves a few particles across cell boundaries per
step (measured: 1-9 of 512 per step), which re-orders pair accumulation
(the documented rebin tolerance — physics/resident.py docstring). Window
tests therefore use allclose at tolerances ~200× the divergence measured
over 60 TPU steps (max|dpos| 1.5e-5, tools/probe_resident.py), while
still asserting topology (bonds/uid/timers/counts) exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_tpu.engine.colony import bonded_colony
from sph_tpu.engine.step import run_steps, step
from experiments.resident import (
    drift_margin,
    empty_cache,
    make_contact_spec,
    pack_resident,
    refresh_state,
    resident_gate,
    resident_substep,
    run_steps_resident,
)

N_STEPS = 12


def _colony(n=512, **over):
    over.setdefault("neighbor_mode", "dense")
    over.setdefault("dense_k", 2)
    over.setdefault("dense_cell_factor", 1.25)
    state, params, genome = bonded_colony(n, **over)
    _colony.genome = genome
    return state, params, genome.to_device()


def _assert_states_equal(a, b, exact=True):
    na = int(a.active_count)
    assert na == int(b.active_count)
    assert int(a.step_count) == int(b.step_count)
    cmp = (np.testing.assert_array_equal if exact
           else lambda x, y, **k: np.testing.assert_allclose(
               x, y, rtol=1e-4, atol=1e-4, **k))
    for f in ("pos", "vel", "ang_vel", "rot"):
        cmp(np.asarray(getattr(a, f))[:na],
            np.asarray(getattr(b, f))[:na], err_msg=f)
    np.testing.assert_array_equal(
        np.asarray(a.split_timer), np.asarray(b.split_timer))
    np.testing.assert_array_equal(np.asarray(a.uid), np.asarray(b.uid))
    for f in ("active", "slot_a", "slot_b", "zone_a", "zone_b",
              "created_step"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a.bonds, f)),
            np.asarray(getattr(b.bonds, f)), err_msg=f"bonds.{f}")
    assert int(a.overflow) == int(b.overflow)


def test_resident_substep_equals_classic_step():
    """ONE resident substep (pack → slot-space frame → refresh) is bitwise
    the classic step on a settled colony — the slot twins really are the
    same arithmetic, asserted with no window machinery in between."""
    state, params, gd = _colony()
    spec = make_contact_spec(params, k=params.dense_k,
                             cell_factor=params.dense_cell_factor)
    assert bool(jax.jit(
        lambda s: resident_gate(s, params, gd, params.dt))(state))

    def one_resident(st):
        cache = pack_resident(st, gd, spec)
        st, cache = resident_substep(st, cache, params, gd, spec,
                                     params.dt)
        return refresh_state(st, cache, spec), cache.overflow

    res, ovf = jax.jit(one_resident)(state)
    cls = jax.jit(lambda s: step(s, params, gd))(state)
    assert int(ovf) == 0
    _assert_states_equal(cls, res)


def test_resident_window_matches_classic_settled():
    state, params, gd = _colony()
    a = jax.jit(lambda s: run_steps(s, params, gd, N_STEPS))(state)
    b = jax.jit(
        lambda s: run_steps_resident(s, params, gd, N_STEPS))(state)
    _assert_states_equal(a, b, exact=False)


def test_resident_window_matches_classic_pallas():
    state, params, gd = _colony(use_pallas=True)
    a = jax.jit(lambda s: run_steps(s, params, gd, N_STEPS))(state)
    b = jax.jit(
        lambda s: run_steps_resident(s, params, gd, N_STEPS))(state)
    _assert_states_equal(a, b, exact=False)


def test_resident_through_division_boundary():
    """Arm a batch of division timers inside the window: the gate must
    route those steps (and the 2-step young-bond tail) through the classic
    path, reproducing division slot policy, uid allocation, and bond
    inheritance exactly."""
    from sph_tpu import Simulation

    state, params, gd = _colony(n=256, max_splits_per_step=32)
    sim = Simulation(_colony.genome, params, auto_grow=False, donate=False)
    sim.state = state
    sim.resize(320)   # headroom so the armed splits actually apply
    params = sim.params
    gd = sim.genome_dev
    timer = sim.state.split_timer.at[:16].set(
        jnp.float32(float(gd.split_interval[0]) - 3 * params.dt)
    )
    state = sim.state.replace_fields(split_timer=timer)

    a = jax.jit(lambda s: run_steps(s, params, gd, 10))(state)
    b = jax.jit(lambda s: run_steps_resident(s, params, gd, 10))(state)
    assert int(a.active_count) == 256 + 16      # the splits really fired
    _assert_states_equal(a, b, exact=False)


def test_resident_drift_triggers_repack_and_stays_correct():
    """Velocities large enough to burn the drift budget mid-window force a
    refresh + repack; positions keep matching the classic path (allclose —
    the classic path re-bins every step once particles cross cells, which
    re-orders pair accumulation within the documented tolerance)."""
    state, params, gd = _colony()
    spec = make_contact_spec(params, k=params.dense_k,
                             cell_factor=params.dense_cell_factor)
    margin = drift_margin(params, spec)
    n = int(state.active_count)
    # ~margin/2 of drift per step ⇒ repacks every ~2 steps over the window.
    speed = margin / (2.0 * params.dt)
    rng = np.random.default_rng(3)
    v = rng.normal(size=(state.capacity, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    vel = jnp.asarray(v) * speed
    vel = jnp.where((jnp.arange(state.capacity) < n)[:, None], vel, 0.0)
    state = state.replace_fields(vel=vel)

    a = jax.jit(lambda s: run_steps(s, params, gd, N_STEPS))(state)
    b = jax.jit(
        lambda s: run_steps_resident(s, params, gd, N_STEPS))(state)
    _assert_states_equal(a, b, exact=False)


def test_resident_overflow_sticky_falls_back_to_classic():
    """A colony whose cells overflow dense_k=1 must pack with overflow > 0
    once, then run every step classic — bitwise equal to run_steps, with
    the same counted overflow."""
    state, params, gd = _colony(n=128, dense_k=1, jitter=0.9)
    spec = make_contact_spec(params, k=params.dense_k,
                             cell_factor=params.dense_cell_factor)
    cache = jax.jit(lambda s: pack_resident(s, gd, spec))(state)
    assert int(cache.overflow) > 0, "fixture must actually overflow"

    a = jax.jit(lambda s: run_steps(s, params, gd, 6))(state)
    b = jax.jit(lambda s: run_steps_resident(s, params, gd, 6))(state)
    # Every step routes classic, but the classic step compiled inside the
    # window's lax.cond branch contracts FMAs differently than inside
    # run_steps' plain scan (graph-shape-dependent — the usual last-ulp
    # twin contract), so this is allclose, not bitwise.
    _assert_states_equal(a, b, exact=False)
    assert int(b.overflow) > 0                   # counted, not hidden


def test_resident_drag_impulse_matches_classic():
    from sph_tpu.core.types import DragInput

    state, params, gd = _colony()
    drag = DragInput(
        selected_slot=jnp.int32(7),
        target=jnp.asarray(state.pos[7] + 5.0),
        strength=jnp.float32(100.0),
    )
    state = state.replace_fields(drag_input=drag)
    a = jax.jit(lambda s: run_steps(s, params, gd, 8))(state)
    b = jax.jit(lambda s: run_steps_resident(s, params, gd, 8))(state)
    _assert_states_equal(a, b, exact=False)


def test_resident_gate_conditions():
    state, params, gd = _colony(n=128)
    gate = jax.jit(lambda s: resident_gate(s, params, gd, params.dt))
    assert bool(gate(state))

    # Young bond reopens the settled window.
    st = state.replace_fields(
        bonds=state.bonds.replace_fields(
            created_step=state.bonds.created_step.at[0].set(
                state.step_count
            )
        )
    )
    assert not bool(gate(st))

    # At capacity the reference FREEZES timers (cs:648-649 early return —
    # division_ready's gate), so an armed timer canNOT fire and the window
    # correctly stays open.
    armed = state.split_timer.at[0].set(
        jnp.float32(float(gd.split_interval[0]) - 0.5 * params.dt)
    )
    assert bool(gate(state.replace_fields(split_timer=armed)))

    # With headroom, a timer about to cross blocks the window
    # (bit-identical test to queue_splits' epsiloned threshold).
    from sph_tpu import Simulation

    sim = Simulation(_colony.genome, params, auto_grow=False, donate=False)
    sim.state = state
    sim.resize(192)
    st = sim.state.replace_fields(
        split_timer=sim.state.split_timer.at[0].set(
            jnp.float32(float(gd.split_interval[0]) - 0.5 * params.dt)
        )
    )
    gate2 = jax.jit(
        lambda s: resident_gate(s, sim.params, sim.genome_dev, params.dt)
    )
    assert not bool(gate2(st))
    st_ok = sim.state
    assert bool(gate2(st_ok))

    # Pending splits from last step block the window.
    pend = state.pending.replace_fields(count=jnp.int32(1))
    st = state.replace_fields(pending=pend)
    assert not bool(gate(st))


def test_resident_cache_shapes_are_static():
    state, params, gd = _colony(n=128)
    spec = make_contact_spec(params, k=params.dense_k,
                             cell_factor=params.dense_cell_factor)
    c0 = empty_cache(state, spec)
    c1 = jax.jit(lambda s: pack_resident(s, gd, spec))(state)
    t0 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), c0)
    t1 = jax.tree_util.tree_map(lambda a: (jnp.asarray(a).shape,
                                           jnp.asarray(a).dtype), c1)
    assert jax.tree_util.tree_structure(t0) == jax.tree_util.tree_structure(t1)
    for x, y in zip(jax.tree_util.tree_leaves(t0),
                    jax.tree_util.tree_leaves(t1)):
        assert x == y
