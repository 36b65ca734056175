"""Pallas TPU kernels for the dense-grid SPH hot path.

Same math and data layout as sph_tpu.sph.dense (see its module docstring for
the lane-roll pair-enumeration scheme), but the entire stencil loop runs in
VMEM: each grid program owns one z-plane [Y, L], loads the three z-planes it
needs once, and performs all (dz, dy, D) roll variants on-chip. HBM traffic
is ~3 reads + 1 write per field per pass instead of per-variant, and the
unrolled variant loop compiles in Mosaic instead of exploding XLA's HLO
optimizer (the pure-XLA twin takes minutes to compile at k=8).

Rolls wrap at block edges; the one-cell sentinel margin ring makes every
wrapped candidate self-rejecting, exactly as in the XLA twin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sph_tpu.sph import kernels as KN


def _interpret() -> bool:
    """Pallas TPU kernels run in interpreter mode on CPU (tests)."""
    return jax.default_backend() != "tpu"


def _roll2(x: jnp.ndarray, dy: int, d: int) -> jnp.ndarray:
    """Static roll of a [Y, L] tile: dy along sublanes, d along lanes."""
    if dy:
        x = jnp.roll(x, -dy, axis=0)
    if d:
        x = jnp.roll(x, -d, axis=1)
    return x


def _variant_offsets(k: int, ndim: int):
    dzs = (-1, 0, 1) if ndim == 3 else (0,)
    dys = (-1, 0, 1)
    ds = tuple(range(-(2 * k - 1), 2 * k))
    return dzs, dys, ds


def _density_kernel(*refs, h2: float, coeff: float, k: int, ndim: int):
    """refs: px/py/pz × (z−1, z, z+1) then out. 2D: only the center plane.

    The lane sweep D ∈ [−(2k−1), 2k−1] runs as a fori_loop carrying the
    rolled candidate planes, advancing them by roll(−1) each iteration —
    bounded VMEM live set and a small Mosaic program regardless of k.
    """
    n_z = 3 if ndim == 3 else 1
    px = [refs[i][0] for i in range(n_z)]
    py = [refs[n_z + i][0] for i in range(n_z)]
    pz = [refs[2 * n_z + i][0] for i in range(n_z)]
    out = refs[3 * n_z]

    cx, cy, cz = px[n_z // 2], py[n_z // 2], pz[n_z // 2]
    acc = jnp.zeros_like(cx)
    for zi in range(n_z):
        for dy in (-1, 0, 1):
            # Start the sweep at D = −(2k−1): pre-roll by +(2k−1) lanes.
            qx = _roll2(px[zi], dy, -(2 * k - 1))
            qy = _roll2(py[zi], dy, -(2 * k - 1))
            qz = _roll2(pz[zi], dy, -(2 * k - 1))

            def body(_i, carry):
                qx, qy, qz, acc = carry
                r2 = (cx - qx) ** 2 + (cy - qy) ** 2 + (cz - qz) ** 2
                t = jnp.maximum(h2 - r2, 0.0)
                acc = acc + t * t * t
                return (
                    _roll2(qx, 0, 1), _roll2(qy, 0, 1), _roll2(qz, 0, 1), acc
                )

            qx, qy, qz, acc = jax.lax.fori_loop(
                0, 4 * k - 1, body, (qx, qy, qz, acc)
            )
    out[0] = acc * coeff


def _accel_kernel(*refs, h: float, m: float, spiky_c: float, visc_mc: float,
                  k: int, ndim: int):
    """refs: (px,py,pz,vx,vy,vz,rho,pr2) × z-planes, then ax, ay, az."""
    n_z = 3 if ndim == 3 else 1
    f = lambda i, zi: refs[i * n_z + zi][0]  # noqa: E731
    PX, PY, PZ, VX, VY, VZ, RHO, PR2 = range(8)
    ax_ref, ay_ref, az_ref = refs[8 * n_z:8 * n_z + 3]

    cx, cy, cz = f(PX, n_z // 2), f(PY, n_z // 2), f(PZ, n_z // 2)
    cvx, cvy, cvz = f(VX, n_z // 2), f(VY, n_z // 2), f(VZ, n_z // 2)
    crho, cpr2 = f(RHO, n_z // 2), f(PR2, n_z // 2)

    ax = jnp.zeros_like(cx)
    ay = jnp.zeros_like(cx)
    az = jnp.zeros_like(cx)
    pre = -(2 * k - 1)
    for zi in range(n_z):
        for dy in (-1, 0, 1):
            carry = (
                _roll2(f(PX, zi), dy, pre),
                _roll2(f(PY, zi), dy, pre),
                _roll2(f(PZ, zi), dy, pre),
                _roll2(f(VX, zi), dy, pre),
                _roll2(f(VY, zi), dy, pre),
                _roll2(f(VZ, zi), dy, pre),
                _roll2(f(RHO, zi), dy, pre),
                _roll2(f(PR2, zi), dy, pre),
                ax, ay, az,
            )

            def body(_i, carry):
                qx, qy, qz, qvx, qvy, qvz, qrho, qpr2, ax, ay, az = carry
                dx = cx - qx
                dyv = cy - qy
                dzv = cz - qz
                r2 = dx * dx + dyv * dyv + dzv * dzv
                r = jnp.sqrt(jnp.maximum(r2, 1e-18))
                not_self = (r2 > 1e-16).astype(jnp.float32)
                hr = jnp.maximum(h - r, 0.0)

                cp = ((-m * spiky_c) * hr * hr / r) * (cpr2 + qpr2) * not_self
                ax = ax + cp * dx
                ay = ay + cp * dyv
                az = az + cp * dzv

                cv = (visc_mc * hr * not_self) / (crho * qrho)
                ax = ax + cv * (qvx - cvx)
                ay = ay + cv * (qvy - cvy)
                az = az + cv * (qvz - cvz)
                return (
                    _roll2(qx, 0, 1), _roll2(qy, 0, 1), _roll2(qz, 0, 1),
                    _roll2(qvx, 0, 1), _roll2(qvy, 0, 1), _roll2(qvz, 0, 1),
                    _roll2(qrho, 0, 1), _roll2(qpr2, 0, 1),
                    ax, ay, az,
                )

            carry = jax.lax.fori_loop(0, 4 * k - 1, body, carry)
            ax, ay, az = carry[8], carry[9], carry[10]
    ax_ref[0] = ax
    ay_ref[0] = ay
    az_ref[0] = az


def _plane_specs(n_fields: int, Z: int, Y: int, L: int, ndim: int):
    """One BlockSpec per (field, z-offset): block = one z-plane [1, Y, L].
    z±1 clamp into the sentinel margin at the boundary (harmless)."""
    specs = []
    offsets = (-1, 0, 1) if ndim == 3 else (0,)
    for _field in range(n_fields):
        for dz in offsets:
            specs.append(
                pl.BlockSpec(
                    (1, Y, L),
                    functools.partial(
                        lambda z, dz=0: (jnp.clip(z + dz, 0, Z - 1), 0, 0),
                        dz=dz,
                    ),
                    memory_space=pltpu.VMEM,
                )
            )
    return specs


def density_pallas(px, py, pz, params, spec) -> jnp.ndarray:
    """ρ·mask-free accumulator pass (caller applies occupancy fixup)."""
    Z, Y, L = px.shape
    h2 = params.h * params.h
    coeff = float(
        params.particle_mass * KN.poly6_coeff(params.h, params.ndim)
    )
    kernel = functools.partial(
        _density_kernel, h2=h2, coeff=coeff, k=spec.k, ndim=params.ndim
    )
    n_z = 3 if params.ndim == 3 else 1
    flops_per = 14 * (3 * n_z * (4 * spec.k - 1))
    return pl.pallas_call(
        kernel,
        grid=(Z,),
        in_specs=_plane_specs(3, Z, Y, L, params.ndim),
        out_specs=pl.BlockSpec(
            (1, Y, L), lambda z: (z, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Z, Y, L), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=Z * Y * L * flops_per,
            bytes_accessed=Z * Y * L * 4 * (3 * n_z + 1),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*[c for comp in (px, py, pz) for c in [comp] * n_z])


def accel_pallas(d, pr2, params, spec):
    """Pressure + viscosity acceleration (no gravity/obstacles here)."""
    Z, Y, L = d.px.shape
    visc_mc = float(
        params.viscosity * params.particle_mass
        * KN.viscosity_lap_coeff(params.h, params.ndim)
    )
    kernel = functools.partial(
        _accel_kernel,
        h=params.h, m=params.particle_mass,
        spiky_c=float(KN.spiky_grad_coeff(params.h, params.ndim)),
        visc_mc=visc_mc, k=spec.k, ndim=params.ndim,
    )
    n_z = 3 if params.ndim == 3 else 1
    fields = (d.px, d.py, d.pz, d.vx, d.vy, d.vz, d.rho, pr2)
    flops_per = 35 * (3 * n_z * (4 * spec.k - 1))
    out = pl.pallas_call(
        kernel,
        grid=(Z,),
        in_specs=_plane_specs(8, Z, Y, L, params.ndim),
        out_specs=[
            pl.BlockSpec((1, Y, L), lambda z: (z, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_shape=[jax.ShapeDtypeStruct((Z, Y, L), jnp.float32)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=Z * Y * L * flops_per,
            bytes_accessed=Z * Y * L * 4 * (8 * n_z + 3),
            transcendentals=Z * Y * L * (3 * n_z * (4 * spec.k - 1)),
        ),
        interpret=_interpret(),
    )(*[c for comp in fields for c in [comp] * n_z])
    return out
