"""Hardware verification lane: every Pallas twin vs its XLA oracle, ON
THE CURRENT BACKEND, at several densities/k values.

Why this exists (round-3 lesson): all `test_pallas_matches_xla_bit_exact`
tests run in interpreter mode on CPU (tests/conftest.py forces cpu), so
Mosaic codegen bugs are invisible to the test suite — round 3 shipped a
contact pack that silently dropped particles on real TPU while every test
was green (VERDICT.md r3 Weak #1; root cause ops/pallas/expand.py
docstring). This module is the closing of that gap: one command that runs
EVERY Pallas twin on the live backend and fails loudly. `bench.py` runs it
before recording any number; `tools/verify_chip.py` is the standalone CLI
(non-zero exit on any mismatch).

Parity contract: the twins ARE the spec — pair kernels at last-ulp
tolerance (XLA's FMA contraction is graph-shape-dependent; the twin
differs from itself jit-vs-eager), data movement (rebin, expand pack)
strictly bitwise. Reference obligation: SimulateParticles.compute:211-309
(one force path, one answer).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def _blob_state(n: int, k: int, seed: int, spawn: float = 10.0,
                spread: float = 9.0):
    """The bench-verify scene family: a random blob at controllable
    density (spread shrinks -> denser -> more cell overflow)."""
    from sph_tpu.core.types import SimParams, SimState

    cparams = SimParams(capacity=n, spawn_radius=spawn,
                        neighbor_mode="dense", dense_k=k)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    u = jax.random.normal(k1, (n, 3))
    u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    r = spread * jax.random.uniform(k2, (n, 1)) ** (1 / 3)
    cst = SimState.zeros(n, cparams).replace_fields(
        pos=u * r,
        vel=jax.random.normal(k3, (n, 3)) * 0.5,
        ang_vel=jax.random.normal(k1, (n, 3)) * 0.5,
        radius=jnp.full(n, 2.0),
        active_count=jnp.int32(n),
    )
    return cst, cparams


def check_fluid_twins(n_target: int = 3000, k: int = 8,
                      cell_factor: float = 1.2) -> None:
    """Density/accel pair kernels (last-ulp) + rebin (bitwise) vs the
    dense XLA twin on a dam-break scene."""
    from sph_tpu.ops.pallas.fluid import accel_pallas, density_pallas
    from sph_tpu.ops.pallas.rebin import rebin_pallas
    from sph_tpu.sph.dense import (
        accel_pass, density_pass, make_dense_spec, pack, rebin,
    )
    from sph_tpu.sph.model import eos_pressure
    from sph_tpu.sph.scenes import dam_break_3d

    state, params = dam_break_3d(n_target=n_target)
    params = params.replace(dense_k=k, cell_factor=cell_factor)
    spec = make_dense_spec(params, k=k, cell_factor=cell_factor)
    d = pack(state, params, spec)

    rho_x = jax.jit(
        lambda d: density_pass(d, params.replace(use_pallas=False), spec)
    )(d)
    rho_p = jax.jit(
        lambda d: jnp.where(
            d.occ > 0.5,
            jnp.maximum(
                density_pallas(d.px, d.py, d.pz, d.occ, params, spec),
                1e-6,
            ),
            params.rest_density,
        )
    )(d)
    np.testing.assert_allclose(
        np.asarray(rho_x), np.asarray(rho_p), rtol=1e-6,
        err_msg=f"density k={k}",
    )

    prs = jnp.where(d.occ > 0.5, eos_pressure(rho_x, params), 0.0)
    d2 = d.replace_fields(
        rho=rho_x, prs=prs,
        vx=jnp.sin(d.px * 3) * d.occ, vy=jnp.cos(d.py * 3) * d.occ,
    )
    a_x = jax.jit(lambda d: accel_pass(d, params, spec))(d2)
    a_p = jax.jit(
        lambda d: accel_pallas(d, d.prs / (d.rho * d.rho), params, spec)
    )(d2)
    m = np.asarray(d.occ.reshape(-1)) > 0.5
    for x, p in zip(a_x, a_p):
        x = np.asarray(x).reshape(-1)[m]
        p = np.asarray(p).reshape(-1)[m]
        np.testing.assert_allclose(
            x, p, rtol=1e-5, atol=1e-6 * np.abs(x).max(),
            err_msg=f"accel k={k}",
        )

    key = jax.random.PRNGKey(0)
    delta = jax.random.uniform(
        key, (3, *d.px.shape),
        minval=-0.9 * spec.cell, maxval=0.9 * spec.cell,
    )
    px = jnp.where(d.occ > 0.5, d.px + delta[0], d.px)
    py = jnp.where(d.occ > 0.5, d.py + delta[1], d.py)
    pz = jnp.where(d.occ > 0.5, d.pz + delta[2], d.pz)
    a = jax.jit(lambda d, px, py, pz: rebin(
        d, px, py, pz, d.vx, d.vy, d.vz, params, spec))(d, px, py, pz)
    b = jax.jit(lambda d, px, py, pz: rebin_pallas(
        d, px, py, pz, d.vx, d.vy, d.vz, params, spec))(d, px, py, pz)
    for f in ("occ", "px", "py", "pz", "vx", "vy", "vz"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
            err_msg=f"rebin {f} k={k}",
        )
    assert int(a.dropped) == int(b.dropped), "rebin dropped count"


def check_expand_pack(n: int, k: int, seed: int = 3,
                      spread: float = 9.0) -> None:
    """The Pallas expand pack vs the XLA column scatters, BITWISE on every
    field including occupancy (the round-3 silent-drop bug class). Also
    asserts the window_overrun guard is consistent: if the guard says no
    overrun, the expansion must be exact."""
    from sph_tpu.ops.pallas.expand import expand_rows, window_overrun
    from sph_tpu.physics.contact_dense import (
        FIELD_FILLS, OCC_FILL, _scatter_sorted, _sort_with_payload,
        make_contact_spec,
    )

    cst, cparams = _blob_state(n, k, seed, spread=spread)
    spec = make_contact_spec(cparams, k=k,
                             cell_factor=cparams.dense_cell_factor)
    fills = FIELD_FILLS + (OCC_FILL,)

    from sph_tpu.ops.pallas.expand import tile_windows

    @jax.jit
    def run(state):
        cols, flat, fits, overflow, _, env = _sort_with_payload(state, spec)
        sc = _scatter_sorted(cols, fills, flat, fits, spec)
        ex, ovr = expand_rows(jnp.stack(cols, axis=1), flat, fits,
                              fills, spec.slots)
        # Production path: precomputed env-based windows (the round-5
        # shared-windows pack) must place identically.
        win = tile_windows(env, spec.slots)
        ex2, ovr2 = expand_rows(jnp.stack(cols, axis=1), flat, fits,
                                fills, spec.slots, windows=win)
        wovr = window_overrun(flat, fits, spec.slots)
        return (jnp.stack([a.reshape(-1) for a in sc]), ex, ex2,
                ovr, ovr2, wovr)

    sc, ex, ex2, ovr, ovr2, wovr = run(cst)
    assert bool(ovr) == bool(wovr) == bool(ovr2), "overrun guards disagree"
    if bool(wovr):
        return  # guarded: caller falls back to scatter; nothing to check
    sc, ex, ex2 = np.asarray(sc), np.asarray(ex), np.asarray(ex2)
    for name, got in (("envelope", ex), ("env-window", ex2)):
        bad = np.nonzero(np.any(sc != got, axis=0))[0]
        assert len(bad) == 0, (
            f"expand pack [{name}] n={n} k={k} spread={spread}: "
            f"{len(bad)} slots differ (first {bad[:5].tolist()})")


def check_contact_end2end(n: int = 400, k: int = 4, seed: int = 3) -> None:
    """Full contact_forces_dense: Pallas sweep + expand pack vs the XLA
    twin — the bench-verify scene that caught (after the fact) the round-3
    regression."""
    from sph_tpu.physics.contact_dense import contact_forces_dense

    cst, cparams = _blob_state(n, k, seed)
    fx, tx, _ = jax.jit(lambda s: contact_forces_dense(s, cparams))(cst)
    fp, tp, _ = jax.jit(
        lambda s: contact_forces_dense(s, cparams.replace(use_pallas=True))
    )(cst)
    fs = float(jnp.abs(fx).max())
    assert fs > 0, "degenerate scene: zero contact force"
    np.testing.assert_allclose(
        np.asarray(fp), np.asarray(fx), rtol=1e-5, atol=1e-6 * fs,
        err_msg=f"contact force n={n} k={k}",
    )
    np.testing.assert_allclose(
        np.asarray(tp), np.asarray(tx), rtol=1e-5,
        atol=1e-6 * float(jnp.abs(tx).max()),
        err_msg=f"contact torque n={n} k={k}",
    )


def check_planned_adhesion(n: int = 4096) -> None:
    """Planned adhesion accumulate (frozen-window sort + segmented scan)
    vs the segment_sum oracle over 8 full colony steps."""
    from sph_tpu.engine.colony import bonded_colony
    from sph_tpu.engine.step import run_steps

    bst, bparams, bgen = bonded_colony(
        n, neighbor_mode="dense", dense_k=2, use_pallas=True)
    bgd = bgen.to_device()
    sa = jax.jit(lambda s: run_steps(
        s, dataclasses.replace(bparams, adhesion_plan="off"),
        bgd, 8))(bst)
    sb = jax.jit(lambda s: run_steps(
        s, dataclasses.replace(bparams, adhesion_plan="on"),
        bgd, 8))(bst)
    nb = int(sa.active_count)
    np.testing.assert_allclose(
        np.asarray(sa.vel[:nb]), np.asarray(sb.vel[:nb]),
        rtol=1e-4, atol=1e-5, err_msg="planned adhesion vel",
    )
    np.testing.assert_allclose(
        np.asarray(sa.rot[:nb]), np.asarray(sb.rot[:nb]),
        rtol=1e-4, atol=1e-5, err_msg="planned adhesion rot",
    )


def check_hybrid_adhesion_division(n: int = 2048) -> None:
    """The hybrid stale-plan accumulate through a REAL division window
    (timers armed so splits fire mid-scan; the plan's snapshot goes stale
    and the changed bonds ride the compact side path) vs the plain
    segment_sum path — topology bitwise, floats allclose."""
    from sph_tpu import Simulation
    from sph_tpu.engine.colony import bonded_colony
    from sph_tpu.engine.step import run_steps

    bst, bparams, bgen = bonded_colony(
        n, neighbor_mode="dense", dense_k=2, use_pallas=True,
        max_splits_per_step=32)
    sim = Simulation(bgen, bparams, auto_grow=False, donate=False)
    sim.state = bst
    sim.resize(n + 64)
    pp, gd = sim.params, sim.genome_dev
    st = sim.state.replace_fields(
        split_timer=sim.state.split_timer.at[:16].set(
            jnp.float32(float(gd.split_interval[0]) - 3 * pp.dt)))
    a = jax.jit(lambda s: run_steps(
        s, dataclasses.replace(pp, adhesion_plan="off"), gd, 8))(st)
    b = jax.jit(lambda s: run_steps(
        s, dataclasses.replace(pp, adhesion_plan="on"), gd, 8))(st)
    assert int(a.active_count) == n + 16 == int(b.active_count), (
        int(a.active_count), int(b.active_count))
    na = int(a.active_count)
    np.testing.assert_allclose(
        np.asarray(a.vel[:na]), np.asarray(b.vel[:na]),
        rtol=1e-4, atol=1e-4, err_msg="hybrid adhesion vel (division)",
    )
    np.testing.assert_array_equal(
        np.asarray(a.bonds.active), np.asarray(b.bonds.active),
        err_msg="hybrid adhesion bond topology",
    )


# (name, thunk): the full lane. Expand-pack scenes ride three densities —
# the round-3 repro (sparse blob, 1 overflow), a crushed blob (heavy
# overflow; exercises the drop-row/envelope path and usually the overrun
# guard), and colony-like k=2 occupancy.
CHECKS = (
    ("fluid twins (density/accel/rebin, k=8)",
     lambda: check_fluid_twins(k=8)),
    ("expand pack blob n=400 k=4 (round-3 repro)",
     lambda: check_expand_pack(400, 4)),
    ("expand pack crushed n=1200 k=4",
     lambda: check_expand_pack(1200, 4, seed=5, spread=4.0)),
    ("expand pack colony-k n=2048 k=2",
     lambda: check_expand_pack(2048, 2, seed=7, spread=14.0)),
    ("contact end-to-end n=400 k=4", check_contact_end2end),
    ("planned adhesion n=4096", check_planned_adhesion),
    ("hybrid adhesion through division n=2048",
     check_hybrid_adhesion_division),
)


def run_all(verbose: bool = False):
    """Run every check on the current backend. Returns a list of
    (name, None | error-string)."""
    results = []
    for name, fn in CHECKS:
        try:
            fn()
            err = None
        except AssertionError as e:
            # numpy assertion messages START with a newline — taking the
            # first line verbatim yields an empty diagnosis (observed in
            # round 3). Keep the first two non-empty lines.
            lines = [ln.strip() for ln in str(e).split("\n") if ln.strip()]
            err = " | ".join(lines[:2])[:200] or repr(e)[:200]
        if verbose:
            print(f"  {'ok  ' if err is None else 'FAIL'} {name}"
                  + (f": {err}" if err else ""), flush=True)
        results.append((name, err))
    return results


def verify_summary() -> str:
    """The bench-flow entry point: 'ok (<backend>, <n> checks)' or
    'FAIL: <first failure>'."""
    results = run_all()
    fails = [(n, e) for n, e in results if e is not None]
    if fails:
        return f"FAIL: {fails[0][0]}: {fails[0][1]}"
    return f"ok ({jax.default_backend()}, {len(results)} twin checks)"
