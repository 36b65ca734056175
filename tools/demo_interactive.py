"""Recorded interactive-loop demo ON CHIP (VERDICT r3 #8).

Drives the full L4/L5 stack — app/viewer.ViewerLoop over a 10k-cell bonded
colony (the reference's default capacity, ParticleSystemController.cs:12)
— with a scripted session: pick + drag a cell across the screen, release,
fly/look the camera, toggle orbit, focus on a cell. Every displayed frame
advances `substeps` physics steps in one jitted dispatch, rasterizes
sphere impostors ON DEVICE and reads back only the [H, W, 3] image.

Reports three rates (the reference's bar: its own 144 fps frame cap,
ParticleSystemController.cs:213):
  - end-to-end fps through the axon relay (sim + render + image readback
    + ~27-30 ms/dispatch tunnel overhead — the honest remote number),
  - render+readback-only fps,
  - sim-only steps/s at the same population (no render).

Writes frames + stats to demo/ (first/mid/last frames committed).

Usage: python tools/demo_interactive.py [n_frames]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax

from sph_tpu import Simulation
from sph_tpu.app.viewer import ViewerLoop
from sph_tpu.engine.colony import bonded_colony


def build_script(n_frames: int, w: int, h: int):
    """Drag a cell from screen center to the right, release, then a camera
    tour (look, fly, orbit, focus) — every event type the reference
    supports (cs:975-1034, CameraFly.cs)."""
    script = {}
    script[5] = [{"type": "mouse_down", "x": w // 2, "y": h // 2}]
    for i in range(6, 36):
        script[i] = [{"type": "mouse_move",
                      "x": w // 2 + (i - 5) * 8, "y": h // 2}]
    script[36] = [{"type": "mouse_up"}]
    script[40] = [{"type": "look", "dx": 15.0, "dy": -5.0}]
    for i in range(42, 52):
        script[i] = [{"type": "key", "key": "w", "dt": 1 / 30}]
    script[54] = [{"type": "orbit"}]
    script[72] = [{"type": "orbit"}]
    script[74] = [{"type": "focus", "slot": 0}]
    script[78] = [{"type": "scroll", "amount": 3.0}]
    return script


def main(n_frames: int = 90, n_cells: int = 10_000):
    t_start = time.perf_counter()

    def log(msg):
        print(f"[demo +{time.perf_counter() - t_start:6.1f}s] {msg}",
              flush=True)

    log(f"backend: {jax.default_backend()}")
    state, params, genome = bonded_colony(
        n_cells, neighbor_mode="dense", dense_k=2, use_pallas=True)
    log(f"colony built: {n_cells} cells")
    sim = Simulation(genome, params, auto_grow=False, scan_chunk=4)
    sim.state = state

    w, h = 800, 450
    v = ViewerLoop(sim, width=w, height=h, substeps=4, show_bonds=True)
    os.makedirs("demo", exist_ok=True)

    # Warm every jit path the script will touch (compile excluded from fps).
    log("warmup frame 1 (compiles step scan + raster)")
    v.frame([{"type": "mouse_down", "x": w // 2, "y": h // 2}])
    log("warmup frame 2")
    v.frame([{"type": "mouse_move", "x": w // 2 + 8, "y": h // 2}])
    v.frame([{"type": "mouse_up"}])
    v._frame_times.clear()
    log("warmup done; running scripted session")

    script = build_script(n_frames, w, h)
    t0 = time.perf_counter()
    stats = v.run(n_frames, script=script, out_dir="demo/frames")
    wall = time.perf_counter() - t0
    log(f"{n_frames} frames in {wall:.1f}s")

    fps_e2e = n_frames / wall
    # Render+readback, SAME visual channels as the loop above (bonds on,
    # labels off) — the apples-to-apples no-physics rate.
    from sph_tpu.render.overlay import render_cells_frame
    kw = dict(camera=v.camera, width=w, height=h,
              show_labels=v.show_labels, show_bonds=v.show_bonds)
    render_cells_frame(sim, **kw)
    t0 = time.perf_counter()
    n_r = 20
    for _ in range(n_r):
        render_cells_frame(sim, **kw)
    fps_render = n_r / (time.perf_counter() - t0)
    log(f"render+readback (loop channels): {fps_render:.1f} fps")

    # Pure device raster + image readback (no host overlays): the rate the
    # on-device impostor channel itself sustains through the relay.
    import jax.numpy as jnp
    from sph_tpu.render.impostor import render_spheres
    colors = jnp.asarray(sim.genome_dev.mode_color[:, :3])[
        jnp.clip(sim.state.mode, 0, len(sim.genome.modes) - 1)]
    mask = jnp.arange(sim.state.capacity) < sim.state.active_count
    raster = jax.jit(lambda pos, rad, rot: render_spheres(
        pos, rad, rot, colors, v.camera.view_params(), width=w, height=h,
        mask=mask))
    np.asarray(raster(sim.state.pos, sim.state.radius, sim.state.rot))
    t0 = time.perf_counter()
    for _ in range(n_r):
        np.asarray(raster(sim.state.pos, sim.state.radius, sim.state.rot))
    fps_raster = n_r / (time.perf_counter() - t0)
    log(f"device raster + readback only: {fps_raster:.1f} fps")

    # Sim-only steps/s at this population (one scan chunk per dispatch).
    sync = lambda: float(jnp.sum(sim.state.pos[0]))  # noqa: E731
    sim.step(120); sync()
    t0 = time.perf_counter()
    sim.step(240); sync()
    sps = 240 / (time.perf_counter() - t0)

    out = {
        "n_cells": n_cells,
        "bonds": int(jnp.sum(sim.state.bonds.active)),
        "frames": n_frames,
        "substeps_per_frame": v.substeps,
        "fps_end_to_end": round(fps_e2e, 1),
        "fps_render_readback_only": round(fps_render, 1),
        "fps_device_raster_readback": round(fps_raster, 1),
        "sim_only_steps_per_sec": round(sps, 1),
        "physics_steps_per_sec_e2e": round(fps_e2e * v.substeps, 1),
        "backend": jax.default_backend(),
        "drag_engaged_frames": sum(1 for s in stats if s["drag_slot"] >= 0),
        "note": "end-to-end includes ~27-30 ms/dispatch axon relay "
                "overhead per frame (2 dispatches: scan + raster) plus "
                "the 1.1 MB image readback through the tunnel",
    }
    with open("demo/stats.json", "w") as f:
        json.dump({"summary": out, "frames": stats}, f, indent=1)
    # keep 3 representative frames in-repo; drop the rest
    keep = {0, 20, n_frames - 1}
    for i in range(n_frames):
        p = f"demo/frames/view_{i:05d}.png"
        if i not in keep and os.path.exists(p):
            os.remove(p)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 90)
