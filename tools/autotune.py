"""On-chip autotune of the dense-engine knobs (cell_factor, rebin_every)
for a given scene size. Higher cell_factor packs cells fuller (mean
occupancy (cf·1.3)³ of k=8), cutting the empty-lane share of the pair
sweep, and widens the inter-rebin drift margin (cell − h)/2 — but risks
`dropped` overflow when compression fills a cell past k. Run:

    python tools/autotune.py --n 262144 [--steps 45]

Prints one line per config; pick the fastest with dropped == 0.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_config(n_target, cf, rebin_every, substeps=15, rounds=3, k=8):
    from sph_tpu.sph.dense import make_dense_spec, make_dense_step, pack
    from sph_tpu.sph.scenes import dam_break_3d

    state, params = dam_break_3d(n_target=n_target)
    params = params.replace(
        cell_factor=cf, dense_k=k, rebin_every=rebin_every, use_pallas=True
    )
    spec = make_dense_spec(params, k=k, cell_factor=cf)
    N = state.pos.shape[0]
    d = pack(state, params, spec)
    f = make_dense_step(params, spec, substeps=substeps, donate=True)
    red = jax.jit(lambda s: (jnp.sum(s.occ), s.dropped))
    d = f(d)
    _ = [float(x) for x in red(d)]
    best = 0.0
    for _i in range(rounds):
        t0 = time.perf_counter()
        d = f(d)
        _ = [float(x) for x in red(d)]
        best = max(best, substeps / (time.perf_counter() - t0))
    alive, dropped = (int(x) for x in red(d))
    return {
        "steps_per_sec": round(best, 2), "n": N,
        "psps": round(best * N / 1e6, 2), "alive": alive, "dropped": dropped,
        "slots": spec.slots,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--cf", type=float, nargs="*",
                    default=[1.2, 1.3, 1.35, 1.4, 1.45])
    ap.add_argument("--rebin", type=int, nargs="*", default=[2, 3, 4, 6])
    ap.add_argument("--k", type=int, nargs="*", default=[8])
    args = ap.parse_args()
    for cf in args.cf:
      for re in args.rebin:
        for k in args.k:
            try:
                r = bench_config(args.n, cf, re, k=k)
                flag = "" if r["dropped"] == 0 else "  !! DROPPED"
                print(f"cf={cf:<5} rebin={re} k={k}: {r['steps_per_sec']:7.2f} "
                      f"steps/s  {r['psps']:6.2f}M ps/s  slots={r['slots']}"
                      f"{flag}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"cf={cf:<5} rebin={re} k={k}: FAILED {str(e)[:90]}",
                      flush=True)


if __name__ == "__main__":
    main()
