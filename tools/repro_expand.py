"""On-chip repro of the round-3 expand-pack miscompute (VERDICT.md Weak #1).

Rebuilds the bench verify scene (n=400 blob, k=4, seed 3), runs the sorted
columns through BOTH placement paths (XLA column scatters vs the Pallas
expand kernel) and reports every differing slot with its tile's
searchsorted window (s, e, q, cnt) so the coverage invariant can be checked
against reality. Run unmodified on the axon backend.
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from sph_tpu.core.types import SimParams, SimState
from sph_tpu.physics.contact_dense import (
    FIELD_FILLS, OCC_FILL, _scatter_sorted, _sort_with_payload,
    make_contact_spec,
)
from sph_tpu.ops.pallas.expand import expand_rows, window_overrun, T_OUT, W_IN


def build_scene(n=400, k=4, seed=3):
    cparams = SimParams(capacity=n, spawn_radius=10.0,
                        neighbor_mode="dense", dense_k=k)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    u = jax.random.normal(k1, (n, 3))
    u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    r = 9.0 * jax.random.uniform(k2, (n, 1)) ** (1 / 3)
    cst = SimState.zeros(n, cparams).replace_fields(
        pos=u * r,
        vel=jax.random.normal(k3, (n, 3)) * 0.5,
        ang_vel=jax.random.normal(k1, (n, 3)) * 0.5,
        radius=jnp.full(n, 2.0),
        active_count=jnp.int32(n),
    )
    return cst, cparams


def main():
    print("backend:", jax.default_backend())
    cst, cparams = build_scene()
    spec = make_contact_spec(cparams, k=cparams.dense_k,
                             cell_factor=cparams.dense_cell_factor)
    print("spec:", spec, "slots:", spec.slots, "slots%512:",
          spec.slots % 512)

    fills = FIELD_FILLS + (OCC_FILL,)

    @jax.jit
    def run(state):
        cols, flat, fits, overflow, slot_of, _env = _sort_with_payload(state, spec)
        sc = _scatter_sorted(cols, fills, flat, fits, spec)
        ex, ovr = expand_rows(jnp.stack(cols, axis=1), flat, fits,
                              fills, spec.slots)
        wovr = window_overrun(flat, fits, spec.slots)
        return (jnp.stack([a.reshape(-1) for a in sc]), ex, ovr, wovr,
                flat, fits, overflow)

    sc, ex, ovr, wovr, flat, fits, overflow = run(cst)
    sc = np.asarray(sc)
    ex = np.asarray(ex)
    flat = np.asarray(flat)
    fits = np.asarray(fits)
    print("overflow(count):", int(overflow), "expand ovr:", bool(ovr),
          "window_overrun:", bool(wovr))

    diff = np.any(sc != ex, axis=0)
    bad = np.nonzero(diff)[0]
    print("mismatching slots:", len(bad))
    if len(bad) == 0:
        print("NO MISMATCH — cannot reproduce on this backend")
        return

    # Recompute the tile windows the way expand_rows does.
    flat_m = np.maximum.accumulate(np.where(fits, flat, -1))
    n_tiles = spec.slots // T_OUT
    tile_lo = np.arange(n_tiles) * T_OUT
    s = np.searchsorted(flat_m, tile_lo, side="left")
    e = np.searchsorted(flat_m, tile_lo + T_OUT, side="left")
    N = flat.shape[0]
    n_blk = -(-N // W_IN) + 2
    q = np.minimum(s // W_IN, n_blk - 2)

    tiles = sorted(set(int(b) // T_OUT for b in bad))
    print("affected tiles:", tiles)
    for t in tiles:
        in_tile = [int(b) for b in bad if b // T_OUT == t]
        print(f"tile {t}: lo={tile_lo[t]} s={s[t]} e={e[t]} cnt={e[t]-s[t]} "
              f"q={q[t]} blocks=[{q[t]*W_IN},{(q[t]+2)*W_IN}) "
              f"bad_slots={in_tile[:8]}{'...' if len(in_tile) > 8 else ''}")
        # which sorted rows target this tile?
        m = fits & (flat >= tile_lo[t]) & (flat < tile_lo[t] + T_OUT)
        rows = np.nonzero(m)[0]
        print(f"  rows targeting tile: idx[{rows.min() if len(rows) else '-'}"
              f"..{rows.max() if len(rows) else '-'}] n={len(rows)}; "
              f"coverage ok={len(rows) == 0 or (rows.min() >= q[t]*W_IN and rows.max() < (q[t]+2)*W_IN)}")
        for b in in_tile[:4]:
            src = np.nonzero(fits & (flat == b))[0]
            print(f"  slot {b}: scatter occ={sc[10, b]} expand occ={ex[10, b]}"
                  f" scatter px={sc[0, b]:.4f} expand px={ex[0, b]:.4f}"
                  f" src_row={src}")


if __name__ == "__main__":
    main()
