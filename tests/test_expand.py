"""Pallas expand kernel (ops/pallas/expand.py) vs the XLA column
scatters: the placement must be BIT-exact (the kernel's 3-way bf16 split
reconstructs every f32 exactly; one-hot products are exact), so the
contact pack is allowed to swap freely between the two."""

import jax
import jax.numpy as jnp
import numpy as np

from sph_tpu.engine.colony import bonded_colony
from sph_tpu.ops.pallas.expand import T_OUT, W_IN, expand_rows, window_overrun
from sph_tpu.physics.contact_dense import (
    FIELD_FILLS,
    OCC_FILL,
    _pack_args,
    _scatter_table,
    _sort_particles,
    make_contact_spec,
)


def _fixture(n=512, **over):
    over.setdefault("neighbor_mode", "dense")
    over.setdefault("dense_k", 2)
    over.setdefault("dense_cell_factor", 1.25)
    state, params, genome = bonded_colony(n, **over)
    spec = make_contact_spec(params, k=params.dense_k,
                             cell_factor=params.dense_cell_factor)
    return state, params, spec


def test_expand_bit_exact_vs_scatter():
    state, params, spec = _fixture()
    assert spec.slots % T_OUT == 0
    N = state.capacity
    order, flat, fits, overflow, _ = jax.jit(
        lambda s: _sort_particles(s, spec))(state)
    tbl = jnp.concatenate(
        [state.pos, state.vel, state.ang_vel,
         state.radius[:, None], jnp.ones((N, 1), jnp.float32)], axis=1)
    fills = FIELD_FILLS + (OCC_FILL,)
    want = jax.jit(
        lambda t: _scatter_table(t, fills, order, flat, fits, spec))(tbl)
    got, ovr = jax.jit(
        lambda t: expand_rows(t[order], flat, fits, fills, spec.slots)
    )(tbl)
    assert not bool(ovr)
    for c in range(11):
        np.testing.assert_array_equal(
            np.asarray(got[c]).reshape(-1),
            np.asarray(want[c]).reshape(-1), err_msg=f"col {c}")


def test_expand_hi_lo_lane_path_bit_exact():
    """The hi/lo split-target path (the >= 2^24-slot encoding) must place
    identically to the auto single-lane path — forced via the override so
    it stays covered now that small layouts default to one exact-f32
    target lane."""
    state, params, spec = _fixture()
    N = state.capacity
    order, flat, fits, overflow, _ = jax.jit(
        lambda s: _sort_particles(s, spec))(state)
    tbl = jnp.concatenate(
        [state.pos, state.vel, state.ang_vel,
         state.radius[:, None], jnp.ones((N, 1), jnp.float32)], axis=1)
    fills = FIELD_FILLS + (OCC_FILL,)
    a, ova = jax.jit(lambda t: expand_rows(
        t[order], flat, fits, fills, spec.slots, single_lane=True))(tbl)
    b, ovb = jax.jit(lambda t: expand_rows(
        t[order], flat, fits, fills, spec.slots, single_lane=False))(tbl)
    assert not bool(ova) and not bool(ovb)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pack_expand_equals_pack_scatter():
    """_pack_args(expand=True) == _pack_args(expand=False) bitwise on a
    real colony (covers the searchsorted windowing + cond plumbing)."""
    state, params, spec = _fixture(n=384)
    a = jax.jit(lambda s: _pack_args(s, spec, expand=False))(state)
    b = jax.jit(lambda s: _pack_args(s, spec, expand=True))(state)
    for fa, fb in zip(a[0], b[0]):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
    assert int(a[3]) == int(b[3])


def test_expand_overrun_guard_falls_back():
    """A colony packed into very few cells overruns the kernel window;
    window_overrun must fire and _pack_args(expand=True) must still equal
    the scatter path bitwise (the cond takes the scatter branch)."""
    state, params, spec = _fixture(n=512, dense_k=1, jitter=0.9)
    N = state.capacity
    # Collapse everyone near the origin so a handful of cells hold all
    # rows: drop runs grow far past W_IN within one tile.
    rng = np.random.default_rng(0)
    pos = rng.uniform(-1.0, 1.0, (N, 3)).astype(np.float32)
    state = state.replace_fields(pos=jnp.asarray(pos))
    order, flat, fits, overflow, _ = jax.jit(
        lambda s: _sort_particles(s, spec))(state)
    assert int(overflow) > 0
    assert bool(jax.jit(
        lambda: window_overrun(flat, fits, spec.slots))()), \
        f"fixture must overrun the {W_IN}-row window"
    a = jax.jit(lambda s: _pack_args(s, spec, expand=False))(state)
    b = jax.jit(lambda s: _pack_args(s, spec, expand=True))(state)
    for fa, fb in zip(a[0], b[0]):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
