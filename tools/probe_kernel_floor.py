"""Kernel-only floor decomposition for the contact sweep at a settled
100k colony: same grid/BlockSpecs as production, kernel body swapped for
stubs. Fields are packed ONCE outside the timed scan, so rows measure the
pallas_call alone:

  zero-outs     : DMA all input blocks + write zeroed outputs, empty body
  pads-only     : + the 30 halo-pad concats under the occ gate
  screen-only   : + the 62-variant margin loop (gate never fires: settled)
  full          : the production kernel

Usage: python tools/probe_kernel_floor.py [n]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import sph_tpu.ops.pallas.contact as pc
import sph_tpu.physics.contact_dense as cd
from sph_tpu.engine.colony import bonded_colony

N = int(sys.argv[1]) if len(sys.argv) > 1 else 102400
SUB = 60
state, params, genome = bonded_colony(
    N, neighbor_mode="dense", grid_dim=48, grid_cell_size=4.0,
    cell_capacity=16, max_splits_per_step=64, dense_k=2, use_pallas=True,
)
spec = cd.make_contact_spec(params, k=params.dense_k,
                            cell_factor=params.dense_cell_factor)
fields, occ, slot_of, overflow = jax.jit(
    lambda st: cd._pack_args(st, spec))(state)
fields = tuple(jnp.asarray(f) for f in fields)
pair = lambda *a: cd.contact_pair_terms(params, *a)  # noqa: E731
screen = lambda *a: cd.contact_screen(params, *a)  # noqa: E731


def scan_of(fn, rounds=5):
    f = jax.jit(lambda fs: jax.lax.scan(
        lambda c, _: (fn(c), None), fs, None, length=SUB)[0])
    out = f(list(fields))
    _ = float(jnp.sum(out[0][0]))
    best = 1e9
    for _i in range(rounds):
        t0 = time.perf_counter()
        out = f(list(fields))
        _ = float(jnp.sum(out[0][0]))
        best = min(best, (time.perf_counter() - t0) / SUB * 1000)
    return best


def run_variant(name, kernel_override):
    orig = pc._contact_kernel
    if kernel_override is not None:
        pc._contact_kernel = kernel_override

    def body(fs):
        comps = pc.contact_sweep_pallas(tuple(fs), occ, spec, pair,
                                        ncomp=6, screen_fn=screen)
        # Fold the outputs back into the carried fields so the scan has a
        # data dependency chain (prevents DCE / overlap).
        return [fs[0] + 1e-37 * comps[0]] + list(fs[1:])

    try:
        t = scan_of(body)
    finally:
        pc._contact_kernel = orig
    print(f"{name:14s}: {t:7.3f} ms/step", flush=True)


import functools


def zero_kernel(*refs, nf, ncomp, YB, L, P, pair_fn, screen_fn, variants):
    outs = refs[1 + nf * 9:]
    for o_ref in outs:
        o_ref[0] = jnp.zeros_like(o_ref[0])


def pads_kernel(*refs, nf, ncomp, YB, L, P, pair_fn, screen_fn, variants):
    occ_t = refs[0]
    fr = refs[1:1 + nf * 9]
    outs = refs[1 + nf * 9:]
    yb = pl.program_id(1)
    for o_ref in outs:
        o_ref[0] = jnp.zeros_like(o_ref[0])

    @pl.when(occ_t[0, 0, yb] > 0)
    def _():
        acc = jnp.zeros((YB, L), jnp.float32)
        for f in range(nf):
            for zi in range(3):
                b = (f * 3 + zi) * 3
                main, prev, nxt = fr[b][0], fr[b + 1][0], fr[b + 2][0]
                yp = jnp.concatenate([prev[-1:], main, nxt[:1]], axis=0)
                lp = jnp.concatenate([yp[:, -P:], yp, yp[:, :P]], axis=1)
                acc = acc + lp[1:1 + YB, P:P + L]
        outs[0][0] = acc * 1e-37


def screen_kernel(*refs, nf, ncomp, YB, L, P, pair_fn, screen_fn, variants):
    occ_t = refs[0]
    fr = refs[1:1 + nf * 9]
    outs = refs[1 + nf * 9:]
    yb = pl.program_id(1)
    for o_ref in outs:
        o_ref[0] = jnp.zeros_like(o_ref[0])

    @pl.when(occ_t[0, 0, yb] > 0)
    def _():
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
            cs.append(fr[(f * 3 + 1) * 3][0])
        margin = jnp.full((YB, L), -1.0, jnp.float32)
        for dz, dy, o in variants:
            q4 = [pads[f][dz + 1][1 + dy:1 + dy + YB, P + o:P + o + L]
                  for f in (0, 1, 2, 9)]
            margin = jnp.maximum(
                margin, screen_fn(cs[0], cs[1], cs[2], cs[9], *q4))
        hit = jnp.max(margin) > 0.0

        @pl.when(hit)
        def _():
            outs[0][0] = margin


print(f"n={N} YB={pc._pick_yb(spec, 10, 6)}", flush=True)
run_variant("zero-outs", zero_kernel)
run_variant("pads-only", pads_kernel)
run_variant("screen-only", screen_kernel)
run_variant("full", None)
