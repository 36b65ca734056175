"""FluidSimulation host API: scene boot, stepping, metrics, checkpoint,
render; plus the app CLI smoke (headless frames)."""

import json
import subprocess
import sys

import numpy as np


def make_sim(n=300, substeps=20):
    from sph_tpu.engine.fluid import FluidSimulation

    return FluidSimulation.from_scene(
        "dam_break_2d", n_target=n, substeps=substeps
    )


def test_fluid_simulation_runs_and_reports():
    sim = make_sim()
    sim.run(40)
    m = sim.metrics()
    assert m["n_particles"] > 0
    assert m["dropped"] == 0
    assert np.isfinite(m["kinetic_energy"])
    assert m["mean_density"] > 100.0


def test_fluid_checkpoint_roundtrip(tmp_path):
    sim = make_sim()
    sim.run(40)
    p = str(tmp_path / "fluid.npz")
    sim.save(p)

    from sph_tpu.engine.fluid import FluidSimulation

    sim2 = FluidSimulation.load(p)
    np.testing.assert_array_equal(
        np.asarray(sim.dstate.px), np.asarray(sim2.dstate.px)
    )
    sim.run(20)
    sim2.run(20)
    np.testing.assert_array_equal(
        np.asarray(sim.dstate.px), np.asarray(sim2.dstate.px)
    )


def test_fluid_render_frame(tmp_path):
    sim = make_sim()
    sim.run(20)
    img = np.asarray(sim.render_frame(str(tmp_path / "f.png")))
    assert img.shape[-1] == 3
    assert (tmp_path / "f.png").exists()
    # The fluid must actually appear: some pixels well above background.
    assert img.max() > 0.3


def test_app_cli_fluid_smoke(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "sph_tpu.app", "fluid", "--scene",
         "dam_break_2d", "--n", "200", "--steps", "20", "--substeps", "20",
         "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=500,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    m = json.loads(line)
    assert m["n_particles"] > 0
