"""Pallas TPU kernels for the dense-grid SPH hot path.

Same math and data layout as sph_tpu.sph.dense (see its module docstring for
the lane-roll pair-enumeration scheme), but the stencil loop runs in VMEM and
empty regions are skipped:

- grid over layout dim 0 (world x in 3D): each program owns one plane
  [N1, L] and loads its ±1 neighbor planes once (clamped BlockSpec index
  maps; the sentinel margin ring makes the clamp at the edges inert);
- within a program, work proceeds in sublane tiles of TB=8 rows, and a
  per-tile occupancy table (SMEM) gates the whole tile with pl.when — empty
  space costs DMA only, no VPU time. For a dam break the fluid's x–y
  footprint is ~20-30% of the box, so this is a ~3-4× win;
- the lane sweep D ∈ [−(2k−1), 2k−1] is a fori_loop carrying candidate
  tiles advanced by roll(−1) per iteration: bounded VMEM live set and a
  small Mosaic program regardless of k.

Bit-identical to the XLA twin (tests/test_dense.py)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sph_tpu.sph import kernels as KN

TB = 8  # sublane tile rows


def _interpret() -> bool:
    """Pallas TPU kernels run in interpreter mode on CPU (tests)."""
    return jax.default_backend() != "tpu"


def _roll_lanes(x: jnp.ndarray, d: int) -> jnp.ndarray:
    return jnp.roll(x, -d, axis=1) if d else x


def _pad_rows(p: jnp.ndarray) -> jnp.ndarray:
    """[N1, L] → [N1+2, L] with wraparound rows (margins are sentinel, so
    the wrap is inert — same argument as lane-roll wrap)."""
    return jnp.concatenate([p[-1:], p, p[:1]], axis=0)


def tile_occupancy(occ: jnp.ndarray) -> jnp.ndarray:
    """[N0, N1, L] occupancy → [N0, N1/TB] i32 tile flags.

    A tile must be computed if it OR any neighboring tile row holds fluid —
    its particles interact with neighbors' — but output-only tiles need own
    occupancy only (empty tiles have no particles to update). Own-occupancy
    is exactly right."""
    N0, N1, L = occ.shape
    t = occ.reshape(N0, N1 // TB, TB * L).max(axis=-1)
    # [N0, 1, nb]: keeps the SMEM block's trailing dims equal to the array's
    # (Pallas TPU block divisibility rule).
    return (t > 0.5).astype(jnp.int32)[:, None, :]


def _density_kernel(*refs, h2: float, coeff: float, k: int, n_z: int,
                    dys: tuple, nb: int):
    """refs: occ_tile, then px/py/pz × (z−1, z, z+1) planes, then out.

    The z-plane loop is outermost and only ONE z-plane's padded copies are
    live at a time (VMEM headroom at 1M+ scales); contributions accumulate
    into the output ref."""
    occ_t = refs[0]
    planes = refs[1:1 + 3 * n_z]
    out = refs[1 + 3 * n_z]

    out[0] = jnp.zeros_like(out[0])
    mid = n_z // 2
    for zi in range(n_z):
        pads = [_pad_rows(planes[c * n_z + zi][0]) for c in range(3)]
        for yt in range(nb):
            @pl.when(occ_t[0, 0, yt] > 0)
            def _(yt=yt, pads=pads, zi=zi):
                r0 = yt * TB
                cx = planes[0 * n_z + mid][0][r0:r0 + TB]
                cy = planes[1 * n_z + mid][0][r0:r0 + TB]
                cz = planes[2 * n_z + mid][0][r0:r0 + TB]
                acc = out[0, r0:r0 + TB, :]
                for dy in dys:
                    rs = r0 + 1 + dy
                    qx = _roll_lanes(pads[0][rs:rs + TB], -(2 * k - 1))
                    qy = _roll_lanes(pads[1][rs:rs + TB], -(2 * k - 1))
                    qz = _roll_lanes(pads[2][rs:rs + TB], -(2 * k - 1))

                    def body(_i, carry):
                        qx, qy, qz, acc = carry
                        r2 = (cx - qx) ** 2 + (cy - qy) ** 2 + (cz - qz) ** 2
                        t = jnp.maximum(h2 - r2, 0.0)
                        return (
                            _roll_lanes(qx, 1), _roll_lanes(qy, 1),
                            _roll_lanes(qz, 1), acc + t * t * t,
                        )

                    qx, qy, qz, acc = jax.lax.fori_loop(
                        0, 4 * k - 1, body, (qx, qy, qz, acc)
                    )
                out[0, r0:r0 + TB, :] = acc
    # One final scale keeps the summation order identical to the XLA twin
    # (skipped tiles are zero, so scaling the whole plane is safe).
    out[0] = out[0] * coeff


def _accel_kernel(*refs, h: float, m: float, spiky_c: float, visc_mc: float,
                  k: int, n_z: int, dys: tuple, nb: int):
    """refs: occ_tile, (px,py,pz,vx,vy,vz,rho,pr2) × z-planes, ax, ay, az.
    Same z-outer accumulate-into-output structure as the density kernel."""
    occ_t = refs[0]
    planes = refs[1:1 + 8 * n_z]
    ax_ref, ay_ref, az_ref = refs[1 + 8 * n_z:1 + 8 * n_z + 3]

    ax_ref[0] = jnp.zeros_like(ax_ref[0])
    ay_ref[0] = jnp.zeros_like(ay_ref[0])
    az_ref[0] = jnp.zeros_like(az_ref[0])
    mid = n_z // 2

    def C(field, r0):
        return planes[field * n_z + mid][0][r0:r0 + TB]

    for zi in range(n_z):
        pads = [_pad_rows(planes[f * n_z + zi][0]) for f in range(8)]
        for yt in range(nb):
            @pl.when(occ_t[0, 0, yt] > 0)
            def _(yt=yt, pads=pads, zi=zi):
                r0 = yt * TB
                cx, cy, cz = C(0, r0), C(1, r0), C(2, r0)
                cvx, cvy, cvz = C(3, r0), C(4, r0), C(5, r0)
                crho, cpr2 = C(6, r0), C(7, r0)
                ax = ax_ref[0, r0:r0 + TB, :]
                ay = ay_ref[0, r0:r0 + TB, :]
                az = az_ref[0, r0:r0 + TB, :]
                pre = -(2 * k - 1)
                for dy in dys:
                    rs = r0 + 1 + dy
                    carry = tuple(
                        _roll_lanes(pads[f][rs:rs + TB], pre)
                        for f in range(8)
                    ) + (ax, ay, az)

                    def body(_i, carry):
                        (qx, qy, qz, qvx, qvy, qvz, qrho, qpr2,
                         ax, ay, az) = carry
                        dx = cx - qx
                        dyv = cy - qy
                        dzv = cz - qz
                        r2 = dx * dx + dyv * dyv + dzv * dzv
                        r = jnp.sqrt(jnp.maximum(r2, 1e-18))
                        not_self = (r2 > 1e-16).astype(jnp.float32)
                        hr = jnp.maximum(h - r, 0.0)

                        cp = ((-m * spiky_c) * hr * hr / r) * (
                            cpr2 + qpr2
                        ) * not_self
                        ax = ax + cp * dx
                        ay = ay + cp * dyv
                        az = az + cp * dzv

                        cv = (visc_mc * hr * not_self) / (crho * qrho)
                        ax = ax + cv * (qvx - cvx)
                        ay = ay + cv * (qvy - cvy)
                        az = az + cv * (qvz - cvz)
                        return (
                            _roll_lanes(qx, 1), _roll_lanes(qy, 1),
                            _roll_lanes(qz, 1), _roll_lanes(qvx, 1),
                            _roll_lanes(qvy, 1), _roll_lanes(qvz, 1),
                            _roll_lanes(qrho, 1), _roll_lanes(qpr2, 1),
                            ax, ay, az,
                        )

                    carry = jax.lax.fori_loop(0, 4 * k - 1, body, carry)
                    ax, ay, az = carry[8], carry[9], carry[10]
                ax_ref[0, r0:r0 + TB, :] = ax
                ay_ref[0, r0:r0 + TB, :] = ay
                az_ref[0, r0:r0 + TB, :] = az


def _plane_specs(n_fields: int, N0: int, N1: int, L: int, stencil0: bool):
    """One BlockSpec per (field, dim0-offset): block = one plane [1, N1, L].
    ±1 offsets clamp into the sentinel margin at the boundary (harmless)."""
    specs = []
    offsets = (-1, 0, 1) if stencil0 else (0,)
    for _field in range(n_fields):
        for dz in offsets:
            specs.append(
                pl.BlockSpec(
                    (1, N1, L),
                    functools.partial(
                        lambda z, dz=0: (jnp.clip(z + dz, 0, N0 - 1), 0, 0),
                        dz=dz,
                    ),
                    memory_space=pltpu.VMEM,
                )
            )
    return specs


def _occ_spec(nb: int):
    return pl.BlockSpec(
        (1, 1, nb), lambda z: (z, 0, 0), memory_space=pltpu.SMEM
    )


def density_pallas(px, py, pz, occ, params, spec) -> jnp.ndarray:
    """Raw ρ accumulator pass (caller applies occupancy fixup)."""
    N0, N1, L = px.shape
    nb = N1 // TB
    occ_t = tile_occupancy(occ)
    h2 = params.h * params.h
    coeff = float(
        params.particle_mass * KN.poly6_coeff(params.h, params.ndim)
    )
    n_z = 3 if spec.stencil0 else 1
    dys = (-1, 0, 1) if spec.stencil1 else (0,)
    kernel = functools.partial(
        _density_kernel, h2=h2, coeff=coeff, k=spec.k, n_z=n_z, dys=dys, nb=nb
    )
    flops_per = 14 * (n_z * len(dys) * (4 * spec.k - 1))
    return pl.pallas_call(
        kernel,
        grid=(N0,),
        in_specs=[_occ_spec(nb)] + _plane_specs(3, N0, N1, L, spec.stencil0),
        out_specs=pl.BlockSpec(
            (1, N1, L), lambda z: (z, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N0, N1, L), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=N0 * N1 * L * flops_per,
            bytes_accessed=N0 * N1 * L * 4 * (3 * n_z + 1),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(occ_t, *[c for comp in (px, py, pz) for c in [comp] * n_z])


def accel_pallas(d, pr2, params, spec):
    """Pressure + viscosity acceleration (no gravity/obstacles here)."""
    N0, N1, L = d.px.shape
    nb = N1 // TB
    occ_t = tile_occupancy(d.occ)
    visc_mc = float(
        params.viscosity * params.particle_mass
        * KN.viscosity_lap_coeff(params.h, params.ndim)
    )
    n_z = 3 if spec.stencil0 else 1
    dys = (-1, 0, 1) if spec.stencil1 else (0,)
    kernel = functools.partial(
        _accel_kernel,
        h=params.h, m=params.particle_mass,
        spiky_c=float(KN.spiky_grad_coeff(params.h, params.ndim)),
        visc_mc=visc_mc, k=spec.k, n_z=n_z, dys=dys, nb=nb,
    )
    fields = (d.px, d.py, d.pz, d.vx, d.vy, d.vz, d.rho, pr2)
    flops_per = 35 * (n_z * len(dys) * (4 * spec.k - 1))
    out = pl.pallas_call(
        kernel,
        grid=(N0,),
        in_specs=[_occ_spec(nb)] + _plane_specs(8, N0, N1, L, spec.stencil0),
        out_specs=[
            pl.BlockSpec((1, N1, L), lambda z: (z, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_shape=[jax.ShapeDtypeStruct((N0, N1, L), jnp.float32)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=N0 * N1 * L * flops_per,
            bytes_accessed=N0 * N1 * L * 4 * (8 * n_z + 3),
            transcendentals=N0 * N1 * L * (3 * n_z * (4 * spec.k - 1)),
        ),
        interpret=_interpret(),
    )(occ_t, *[c for comp in fields for c in [comp] * n_z])
    return out
