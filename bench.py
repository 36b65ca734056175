"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric (BASELINE.json): particle-steps/sec. Config ladder grows as
components land; current flagship config is reported.
"""

from __future__ import annotations

import json
import time

import jax


def bench_contact_bruteforce(n_particles: int = 4096, n_steps: int = 30):
    """BASELINE config[0]: brute-force O(N²) contact sums, fixed dt."""
    import jax.numpy as jnp

    from sph_tpu.core.init import init_particles
    from sph_tpu.engine.config import reference_genome, reference_scene_params
    from sph_tpu.engine.step import make_step_fn

    genome = reference_genome()
    params = reference_scene_params(capacity=n_particles).replace(
        max_bonds=4096, max_splits_per_step=32, min_radius=0.5, max_radius=0.5,
        spawn_radius=40.0,
    )
    gd = genome.to_device()
    state = init_particles(
        params, gd, n_modes=1, initial_mode=0,
        capacity=n_particles, active_count=n_particles,
    )
    f = make_step_fn(params, donate=False)
    state = f(state, gd)  # compile + warm
    jax.block_until_ready(state.pos)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state = f(state, gd)
    jax.block_until_ready(state.pos)
    dt = time.perf_counter() - t0
    return n_steps / dt


def main():
    n = 4096
    sps = bench_contact_bruteforce(n)
    result = {
        "metric": f"particle-steps/sec (contact sim, brute-force O(N^2), N={n})",
        "value": round(sps * n, 1),
        "unit": "particle-steps/sec",
        "vs_baseline": round((sps * n) / (60.0 * 1e6), 4),
        "detail": {
            "steps_per_sec": round(sps, 2),
            "n_particles": n,
            "baseline_note": "vs_baseline = fraction of the 60 M particle-steps/sec north star (1M @ 60 sps)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
