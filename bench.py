"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: particle-steps/sec on the NORTH-STAR config
(BASELINE.json: 1M-particle 3D dam break at >=60 physics steps/s on one
chip) — the dense-grid engine with Pallas kernels. vs_baseline is the
fraction of the 60M particle-steps/s target (1M particles x 60 steps/s).

Run on the real TPU (default platform); pass --config N for other ladder
rungs, --all for the whole ladder.

Timing windows chain 45-120 substeps per dispatch inside lax.scan: the
axon relay's per-dispatch overhead was remeasured at ~27-30 ms/call in
round 3 (tools/probe_sub.py; the round-2 design assumed 4-6 ms), which at
15 substeps taxed the 256k rung ~2 ms/step — a third of its real on-chip
step time.
"""

from __future__ import annotations

import argparse
import json
import statistics
import time

import jax
import jax.numpy as jnp


_T0 = time.monotonic()


def _note(msg: str) -> None:
    """Flushed stderr progress line (stdout stays the single JSON line —
    driver contract). Added after the round-5 full-ladder run sat opaque
    for 28 minutes: a hung stage must leave a diagnosable tail."""
    import sys
    print(f"[bench +{time.monotonic() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _rate_stats(rates: list[float], n: int) -> dict:
    """Best AND median steps/s over timing windows: the relay's window
    variance (~1.6×, BASELINE.md) makes a best-of-N headline alone
    unfalsifiable; the median pins the distribution."""
    best = max(rates)
    med = statistics.median(rates)
    return {
        "steps_per_sec": round(best, 2),
        "steps_per_sec_median": round(med, 2),
        "n_particles": n,
        "particle_steps_per_sec": round(best * n, 0),
        "particle_steps_per_sec_median": round(med * n, 0),
    }


def _bench_dense(n_target: int, steps: int = 240, substeps: int = 60,
                 rebin_every: int = 6, obstacles=(), cell_factor: float = 1.25):
    from sph_tpu.sph.dense import make_dense_spec, pack, make_dense_step
    from sph_tpu.sph.scenes import dam_break_3d

    state, params = dam_break_3d(n_target=n_target, obstacles=obstacles)
    params = params.replace(
        cell_factor=cell_factor, dense_k=8, rebin_every=rebin_every,
        use_pallas=True,
    )
    spec = make_dense_spec(params, k=8, cell_factor=cell_factor)
    N = state.pos.shape[0]
    d = pack(state, params, spec)
    f = make_dense_step(params, spec, substeps=substeps, donate=True)
    red = jax.jit(lambda s: (jnp.sum(s.occ), s.dropped, s.clamped))
    d = f(d)
    _ = [float(x) for x in red(d)]  # sync + warm
    rates = []
    rounds = max(1, steps // substeps)
    for _ in range(rounds):
        t0 = time.perf_counter()
        d = f(d)
        _ = [float(x) for x in red(d)]
        rates.append(substeps / (time.perf_counter() - t0))
    n_alive, dropped, clamped = (float(x) for x in red(d))
    out = _rate_stats(rates, N)
    out.update(alive=int(n_alive), dropped=int(dropped),
               clamped=int(clamped))
    return out


def _bench_2d_bruteforce(n_target: int, steps: int = 20):
    """Config[0]: the O(N²) executable-spec path (CPU JAX reference per
    BASELINE; slow by design)."""
    from sph_tpu.sph.model import make_sph_step
    from sph_tpu.sph.scenes import dam_break_2d

    state, params = dam_break_2d(n_target=n_target)
    N = state.pos.shape[0]
    f = make_sph_step(params, donate=True, substeps=steps)
    state = f(state)
    float(jnp.sum(state.pos))
    t0 = time.perf_counter()
    state = f(state)
    float(jnp.sum(state.pos))
    sps = steps / (time.perf_counter() - t0)
    return {"steps_per_sec": round(sps, 2), "n_particles": N,
            "particle_steps_per_sec": round(sps * N, 0)}


def _bench_2d_dense(n_target: int, steps: int = 480, substeps: int = 120):
    """Config[1]: 2D splash/pour on the dense spatial-hash grid engine."""
    from sph_tpu.sph.dense import make_dense_spec, pack, make_dense_step
    from sph_tpu.sph.scenes import splash_pour_2d

    state, params = splash_pour_2d(n_target=n_target)
    params = params.replace(cell_factor=1.2, dense_k=8, rebin_every=3,
                            use_pallas=True)
    spec = make_dense_spec(params, k=8, cell_factor=1.2)
    N = state.pos.shape[0]
    d = pack(state, params, spec)
    f = make_dense_step(params, spec, substeps=substeps, donate=True)
    red = jax.jit(lambda s: (jnp.sum(s.occ), s.dropped, s.clamped))
    d = f(d)
    _ = [float(x) for x in red(d)]
    rates = []
    for _i in range(max(1, steps // substeps)):
        t0 = time.perf_counter()
        d = f(d)
        _ = [float(x) for x in red(d)]
        rates.append(substeps / (time.perf_counter() - t0))
    n_alive, dropped, clamped = (float(x) for x in red(d))
    out = _rate_stats(rates, N)
    out.update(alive=int(n_alive), dropped=int(dropped),
               clamped=int(clamped))
    return out


def _bench_cells(n: int, steps: int = 240, chunk: int = 120,
                 neighbor_mode: str = "dense"):
    """Biology/contact regime on the CURRENT backend: a BONDED settled
    colony (contact sweep + rotation + adhesion constraints + bond pruning
    + division bookkeeping — the reference's full frame on its own steady
    state: cells at the genome's adhesion rest length, every cell bonded to
    its lattice neighbors as division leaves them, CAM:504-509) stepped via
    lax.scan chunks. 'dense' = the colony-specced [Z, Y, X·K] lane engine
    (physics/contact_dense.py, k=2: jitter 0.35 keeps per-axis neighbor
    separation ≥ 2.96 − 0.7 > the 2.1 cell, so ≤ 2 centers/cell and
    overflow stays 0); 'grid' = the sort+gather engine, kept as the honest
    gather-path ceiling (~1 GB/s random-gather bandwidth, BASELINE.md)."""
    from sph_tpu.engine.colony import bonded_colony

    from sph_tpu import Simulation

    state, params, genome = bonded_colony(
        n,
        neighbor_mode=neighbor_mode,
        grid_dim=48, grid_cell_size=4.0, cell_capacity=16,
        max_splits_per_step=64,
        dense_k=2, use_pallas=(neighbor_mode == "dense"),
    )
    sim = Simulation(genome, params, auto_grow=False, scan_chunk=chunk)
    sim.state = state
    # Relay-safe timing: block_until_ready can return early through the
    # axon tunnel — fetch one small scalar to force execution.
    sync = lambda: float(jnp.sum(sim.state.pos[0]))  # noqa: E731
    sim.step(chunk)  # warm + compile
    sync()
    rates = []
    for _ in range(max(1, steps // chunk)):
        t0 = time.perf_counter()
        sim.step(chunk)
        sync()
        rates.append(chunk / (time.perf_counter() - t0))
    out = _rate_stats(rates, n)
    out.update(
        neighbor_mode=neighbor_mode,
        bonds=int(jnp.sum(sim.state.bonds.active)),
        cell_overflow=int(sim.state.overflow),
        backend=jax.default_backend(),
    )
    return out


def _verify_on_chip() -> str:
    """The hardware verification lane (sph_tpu/utils/verify.py): EVERY
    Pallas twin vs its XLA oracle on the current backend at several
    densities/k values — pair kernels last-ulp, data movement (rebin,
    expand pack) bitwise. Tests only assert twin equality in interpreter
    mode on CPU; Mosaic codegen differences are exactly what interpret
    mode can't see (round-3 lesson). Standalone CLI with non-zero exit:
    tools/verify_chip.py."""
    from sph_tpu.utils.verify import verify_summary

    return verify_summary()


def _bench_4m_multichip():
    """Config[4]: 4M+ single-chip run (VMEM-tiled Pallas kernels; higher
    cell_factor packs cells fuller, shrinking the slot count into HBM
    budget) + a RECORDED 8-way spatial-decomposition dryrun of the same
    scene family on a virtual CPU mesh (halo exchange over ppermute —
    validates the multi-chip path without multi-chip hardware; stencil/halo
    width per the reference's 27-cell stencil, SimulateParticles.compute:
    228-233)."""
    out = _bench_dense(4_000_000, steps=45, substeps=15, cell_factor=1.35)
    _note("4M dense done; starting 8-way decomposition dryrun")

    # The recorded 8-way check now rides the SAME staged/budgeted/
    # cache-warmed path as the driver's multichip artifact
    # (__graft_entry__.dryrun_multichip: fast tiny-shape 1D/2D fluid +
    # contact + colony core first, persistent tests/.jax_cache compile
    # cache, progress line around every check). The previous bespoke
    # inline code cold-compiled a 65k k=8 pure-XLA sharded step on every
    # invocation — ~25 min on a 1-core host, the same failure mode that
    # produced the round-4 MULTICHIP rc=124 artifact.
    import os
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-u", "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=os.path.dirname(os.path.abspath(__file__)),
        stdout=sys.stderr, stderr=sys.stderr, env=dict(os.environ),
        timeout=1800,
    )
    out["dryrun_8way"] = (
        "ok" if r.returncode == 0 else f"FAIL rc={r.returncode}"
    )
    _note(f"8-way dryrun: {out['dryrun_8way']}")
    return out


CONFIGS = {
    0: ("2D dam-break 4k (brute-force executable spec)",
        lambda: _bench_2d_bruteforce(4096)),
    1: ("2D splash/pour 32k (dense grid + Pallas)",
        lambda: _bench_2d_dense(32768)),
    2: ("3D dam-break 256k (dense grid + Pallas)",
        lambda: _bench_dense(262144)),
    3: ("3D dam-break + SDF obstacle 1M (dense grid + Pallas)",
        lambda: _bench_dense(
            1_000_000, obstacles=(("cylinder_z", (1.2, 0.15), 0.12),),
            cell_factor=1.38,   # autotuned per rung (tools/autotune.py)
        )),
    4: ("3D dam-break 4M single-chip + 8-way decomposition dryrun",
        _bench_4m_multichip),
}


def _backend_watchdog(timeout_s: float = 300.0) -> None:
    """Fail fast if the backend never comes up (the axon relay can die and
    leave `jax.devices()` blocked forever — observed hanging a bench run
    >20 min with zero CPU time). Prints the contract JSON line with an
    `error` field and exits 3 instead of hanging the driver."""
    import os
    import sys
    import threading

    done = threading.Event()

    def bail():
        if not done.wait(timeout_s):
            print(json.dumps({
                "metric": "particle-steps/sec (backend init)",
                "value": 0.0,
                "unit": "particle-steps/sec",
                "vs_baseline": 0.0,
                "error": (
                    f"backend init timed out after {timeout_s:.0f}s "
                    "(TPU relay down?)"
                ),
            }))
            sys.stdout.flush()
            os._exit(3)

    threading.Thread(target=bail, daemon=True).start()
    jax.devices()   # blocks until the backend answers (or bail fires)
    done.set()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=3,
                    choices=sorted(CONFIGS), help="ladder rung to run")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--breakdown", action="store_true",
                    help="also report per-phase ms (grid build vs force sum)")
    ap.add_argument("--verify", action="store_true", default=True,
                    help="assert Pallas == XLA bit equality on this backend "
                         "and include the result in the JSON line (default "
                         "ON; --no-verify to skip)")
    ap.add_argument("--no-verify", dest="verify", action="store_false")
    ap.add_argument("--cells", action="store_true",
                    help="also bench the biology/contact regime: BONDED "
                         "settled colonies at 10k (grid + dense engines), "
                         "100k and 1M (dense)")
    args = ap.parse_args()
    _backend_watchdog()

    if args.all:
        detail = {}
        for _idx, (name, fn) in CONFIGS.items():
            _note(f"config[{_idx}] start: {name}")
            try:
                detail[name] = fn()
                _note(f"config[{_idx}] done: "
                      f"{detail[name].get('steps_per_sec')} steps/s")
            except Exception as e:  # noqa: BLE001
                detail[name] = {"error": str(e)[:200]}
                _note(f"config[{_idx}] ERROR: {str(e)[:200]}")
        head_name = CONFIGS[3][0]
        head = detail[head_name]
    else:
        head_name, fn = CONFIGS[args.config]
        _note(f"config[{args.config}] start: {head_name}")
        head = fn()
        detail = {head_name: head}

    if args.cells:
        for n, mode, steps, chunk in (
            (10_240, "grid", 240, 120), (10_240, "dense", 240, 120),
            (102_400, "dense", 240, 120),
            # 100x the reference's 10k default capacity on ONE chip
            # (~0.5 GiB of layout; 1.7M bonds) — scale row, short run.
            (1_048_576, "dense", 40, 20),
        ):
            size = f"{n//1024}k" if n < 1 << 20 else f"{n/(1<<20):g}M"
            key = f"cell colony {size} (contact+adhesion, {mode})"
            _note(f"cells start: {key}")
            try:
                detail[key] = _bench_cells(
                    n, steps=steps, chunk=chunk, neighbor_mode=mode
                )
                _note(f"cells done: {key} = "
                      f"{detail[key].get('steps_per_sec')} steps/s")
            except Exception as e:  # noqa: BLE001
                detail[key] = {"error": str(e)[:200]}
                _note(f"cells ERROR: {key}: {str(e)[:200]}")

    if args.breakdown:
        _note("breakdown start (256k + 1M phase splits)")
        from sph_tpu.sph.dense import make_dense_spec, pack
        from sph_tpu.sph.scenes import dam_break_3d
        from sph_tpu.utils.profiling import step_breakdown

        # Same settings as the CONFIGS[2] rung so the split explains the
        # recorded rate (was cf=1.2/rebin=3 — a different binary).
        st, prm = dam_break_3d(n_target=262144)
        prm = prm.replace(cell_factor=1.25, dense_k=8, rebin_every=6,
                          use_pallas=True)
        spc = make_dense_spec(prm, k=8, cell_factor=1.25)
        detail["phase_breakdown_256k"] = step_breakdown(
            pack(st, prm, spc), prm, spc
        )
        # North-star rung at its exact settings (CONFIGS[3]: obstacle,
        # cf=1.38) so the roofline columns are validated at 1M too, not
        # just 256k (VERDICT r4 next #9).
        st1, prm1 = dam_break_3d(
            n_target=1_000_000,
            obstacles=(("cylinder_z", (1.2, 0.15), 0.12),),
        )
        prm1 = prm1.replace(cell_factor=1.38, dense_k=8, rebin_every=6,
                            use_pallas=True)
        spc1 = make_dense_spec(prm1, k=8, cell_factor=1.38)
        detail["phase_breakdown_1m"] = step_breakdown(
            pack(st1, prm1, spc1), prm1, spc1
        )

    out = {
        "metric": f"particle-steps/sec ({head_name}, 1 chip)",
        "value": head.get("particle_steps_per_sec", 0.0),
        "unit": "particle-steps/sec",
        "vs_baseline": round(head.get("particle_steps_per_sec", 0.0) / 60e6,
                             4),
        "detail": detail,
    }
    if args.verify:
        _note("verify start")
        out["verify"] = _verify_on_chip()
        _note(f"verify: {out['verify']}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
