"""Expand-kernel (t_out, w_in) sweep + pack piece timings at colony scale.

Usage: python tools/probe_expand.py [n]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from sph_tpu.engine.colony import bonded_colony
from sph_tpu.ops.pallas.expand import expand_rows
from sph_tpu.physics.contact_dense import (
    FIELD_FILLS,
    OCC_FILL,
    _pack_args,
    _sort_with_payload,
    make_contact_spec,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024000
SUB = 30
state, params, genome = bonded_colony(
    N, neighbor_mode="dense", max_splits_per_step=64, dense_k=2,
    use_pallas=True,
)
spec = make_contact_spec(params, k=params.dense_k,
                         cell_factor=params.dense_cell_factor)
print(f"n={N} slots={spec.slots}", flush=True)
fills = FIELD_FILLS + (OCC_FILL,)


def scan_of(body, x, rounds=4):
    f = jax.jit(lambda x: jax.lax.scan(
        lambda c, _: (body(c), None), x, None, length=SUB)[0])
    out = f(x)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    best = 1e9
    for _i in range(rounds):
        t0 = time.perf_counter()
        out = f(x)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, (time.perf_counter() - t0) / SUB * 1000)
    return best


def fold(st, arrays):
    s = jnp.float32(0)
    for a in arrays:
        s = s + jnp.sum(jnp.ravel(a)[:1].astype(jnp.float32)) * 1e-30
    return st.replace_fields(vel=st.vel + s)


def ph_sort_only(st):
    cols, flat, fits, ovf, slot_of, _env = _sort_with_payload(st, spec)
    return fold(st, cols + [flat, slot_of])


def ph_pack_full(st):
    fields, occ, slot_of, ovf = _pack_args(st, spec, expand=True)
    return fold(st, list(fields) + [occ, slot_of])


def mk_expand(t_out, w_in):
    def ph(st):
        cols, flat, fits, ovf, slot_of, _env = _sort_with_payload(st, spec)
        rows = jnp.stack(cols, axis=1)
        out, ovr = expand_rows(rows, flat, fits, fills, spec.slots,
                               t_out=t_out, w_in=w_in)
        return fold(st, [out, ovr[None]])
    return ph



t = scan_of(ph_sort_only, state)
print(f"sort only               : {t:7.3f} ms", flush=True)
t = scan_of(ph_pack_full, state)
print(f"pack full (default tile): {t:7.3f} ms", flush=True)

for t_out, w_in in [(512, 256), (1024, 256), (1024, 512), (2048, 256),
                    (2048, 512), (4096, 512), (4096, 1024)]:
    if spec.slots % t_out:
        continue
    # report overrun status once
    cols, flat, fits, ovf, _ = jax.jit(
        lambda s: _sort_with_payload(s, spec)[:5])(state)
    from sph_tpu.ops.pallas.expand import window_overrun
    ovr = bool(jax.jit(lambda f, m: window_overrun(
        f, m, spec.slots, t_out=t_out, w_in=w_in))(flat, fits))
    t = scan_of(mk_expand(t_out, w_in), state)
    print(f"sort+expand T={t_out:4d} W={w_in:4d}: {t:7.3f} ms "
          f"(overrun={ovr})", flush=True)

