"""bf16 pair-math experiment on the fluid force pass (BASELINE.md "known
headroom ... bf16 pair-math evaluation (un-attempted)"; VERDICT r4 next #9).

Hypothesis under test: the VPU is f32-native, so bf16 pair math buys no
flops — any win must come from halved roll/VMEM traffic on the 8 field
tiles. The probe times the XLA-twin force sweep at the north-star 1M
config three ways, amortized inside a lax.scan (>=45 substeps/dispatch,
CLAUDE.md):

  f32 twin     — the production formulation (accs + mirrors, f32 fields)
  bf16 twin    — identical sweep with the FIELD TILES cast to bf16; the
                 pair terms evaluate in bf16 (python-float coeffs stay
                 weakly typed), accumulators stay f32 (f32 + bf16
                 promotes), rolls move half the bytes
  pallas f32   — the shipped kernel, for scale

plus the max |Δa| / max |a| accuracy cost of the bf16 variant.

Usage: python tools/probe_bf16.py [n_target]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from sph_tpu.ops.pallas.fluid import accel_pallas
from sph_tpu.sph.dense import (
    combine_mirror_parts, _sweep_xla, accel_pair_terms,
    make_dense_spec, make_dense_step, pack,
)
from sph_tpu.sph import kernels as KN
from sph_tpu.sph.scenes import dam_break_3d

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
SUB = 60
state, params = dam_break_3d(
    n_target=N, obstacles=(("cylinder_z", (1.2, 0.15), 0.12),),
)
params = params.replace(cell_factor=1.38, dense_k=8, rebin_every=6,
                        use_pallas=True)
spec = make_dense_spec(params, k=8, cell_factor=1.38)
d = pack(state, params, spec)
d = make_dense_step(params, spec, substeps=30, donate=False)(d)  # settle
print("N =", d.px.size, "tile =", d.px.shape, flush=True)


def scan_of(body, x):
    f = jax.jit(lambda x: jax.lax.scan(
        lambda c, _: (body(c), None), x, None, length=SUB)[0])
    out = f(x)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1]))
    best = 1e9
    for _i in range(6):
        t0 = time.perf_counter()
        out = f(x)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1]))
        best = min(best, (time.perf_counter() - t0) / SUB * 1000)
    return best


def force_fields(dd):
    pr2 = dd.prs / (dd.rho * dd.rho)
    irho = 1.0 / dd.rho
    return (dd.px, dd.py, dd.pz, dd.vx, dd.vy, dd.vz, irho, pr2)


m = params.particle_mass
PAIR = lambda *a: accel_pair_terms(  # noqa: E731
    params.h,
    float(-m * KN.spiky_grad_coeff(params.h, params.ndim)),
    float(params.viscosity * m
          * KN.viscosity_lap_coeff(params.h, params.ndim)),
    *a,
)


def sweep(fields):
    accs, m_row, m_cs = _sweep_xla(
        fields, PAIR, ncomp=3, self_init=None, spec=spec, sign=-1)
    return tuple(
        combine_mirror_parts(
            accs[c], m_row[c] if m_row else None,
            [ms[c] for ms in m_cs], spec, sign=-1)
        for c in range(3)
    )


def f32_twin(dd):
    ax, ay, az = sweep(force_fields(dd))
    # fold back so the scanned carry keeps the probe honest (prevents DCE)
    return dd.replace_fields(vx=dd.vx + 1e-12 * ax, vy=dd.vy + 1e-12 * ay,
                             vz=dd.vz + 1e-12 * az)


def bf16_twin(dd):
    fields = tuple(f.astype(jnp.bfloat16) for f in force_fields(dd))
    ax, ay, az = sweep(fields)
    return dd.replace_fields(
        vx=dd.vx + 1e-12 * ax.astype(jnp.float32),
        vy=dd.vy + 1e-12 * ay.astype(jnp.float32),
        vz=dd.vz + 1e-12 * az.astype(jnp.float32))


def pallas_force(dd):
    ax, ay, az = accel_pallas(dd, dd.prs / (dd.rho * dd.rho), params, spec)
    return dd.replace_fields(vx=dd.vx + 1e-12 * ax, vy=dd.vy + 1e-12 * ay,
                             vz=dd.vz + 1e-12 * az)


# Accuracy cost first (one dispatch each).
a32 = jax.jit(lambda dd: sweep(force_fields(dd)))(d)
a16 = jax.jit(lambda dd: sweep(
    tuple(f.astype(jnp.bfloat16) for f in force_fields(dd))))(d)
num = max(float(jnp.max(jnp.abs(x.astype(jnp.float32) - y)))
          for x, y in zip(a16, a32))
den = max(float(jnp.max(jnp.abs(y))) for y in a32)
print(f"bf16 accuracy: max|da| = {num:.3e}  max|a| = {den:.3e}  "
      f"rel = {num / den:.3e}", flush=True)

for name, body in (("f32 twin", f32_twin), ("bf16 twin", bf16_twin),
                   ("pallas f32", pallas_force)):
    ms = scan_of(body, d)
    print(f"{name:11s} {ms:7.3f} ms/step", flush=True)
