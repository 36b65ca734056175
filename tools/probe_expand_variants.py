"""Variant probe for the expand-kernel q-transition hypothesis.

The repro (tools/repro_expand.py) showed: every mismatching slot's source
row lives in a tile whose block index q[t] is 1 — i.e. AFTER the first
transition of the data-dependent index map — while q=0 tiles place the
same-magnitude (denormal-bit-pattern) flat values correctly. This probe
re-runs the same scene at several (t_out, w_in) geometries to see whether
mismatches track the q transition.
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from sph_tpu.physics.contact_dense import (
    FIELD_FILLS, OCC_FILL, _scatter_sorted, _sort_with_payload,
    make_contact_spec,
)
from sph_tpu.ops.pallas.expand import expand_rows
from tools.repro_expand import build_scene


def check(t_out, w_in):
    cst, cparams = build_scene()
    spec = make_contact_spec(cparams, k=cparams.dense_k,
                             cell_factor=cparams.dense_cell_factor)
    fills = FIELD_FILLS + (OCC_FILL,)
    if spec.slots % t_out:
        print(f"t_out={t_out} w_in={w_in}: slots%t_out!=0, skip")
        return

    @jax.jit
    def run(state):
        cols, flat, fits, overflow, slot_of, _env = _sort_with_payload(state, spec)
        sc = _scatter_sorted(cols, fills, flat, fits, spec)
        ex, ovr = expand_rows(jnp.stack(cols, axis=1), flat, fits,
                              fills, spec.slots, t_out=t_out, w_in=w_in)
        return jnp.stack([a.reshape(-1) for a in sc]), ex, flat, fits

    sc, ex, flat, fits = run(cst)
    sc, ex = np.asarray(sc), np.asarray(ex)
    flat, fits = np.asarray(flat), np.asarray(fits)
    bad = np.nonzero(np.any(sc != ex, axis=0))[0]

    flat_m = np.maximum.accumulate(np.where(fits, flat, -1))
    n_tiles = spec.slots // t_out
    tile_lo = np.arange(n_tiles) * t_out
    s = np.searchsorted(flat_m, tile_lo, side="left")
    N = flat.shape[0]
    n_blk = -(-N // w_in) + 2
    q = np.minimum(s // w_in, n_blk - 2)
    qbad = sorted(set(int(q[b // t_out]) for b in bad))
    qs = sorted(set(q.tolist()))
    print(f"t_out={t_out} w_in={w_in}: bad_slots={len(bad)} "
          f"q_values_used={qs} q_of_bad_tiles={qbad}")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    for t_out, w_in in [(512, 256), (512, 512), (256, 256), (512, 128),
                        (1024, 256), (2048, 400 + 112)]:
        try:
            check(t_out, w_in)
        except Exception as e:
            print(f"t_out={t_out} w_in={w_in}: ERROR {type(e).__name__}: "
                  f"{str(e)[:120]}")
