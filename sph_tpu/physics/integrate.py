"""Motion + rotation integration passes (UpdateMotion / UpdateRotation,
SimulateParticles.compute:326-357, :379-408)."""

from __future__ import annotations

import jax.numpy as jnp

from sph_tpu.core import quat
from sph_tpu.core.types import SimParams, SimState


def update_motion(state: SimState, params: SimParams, dt=None) -> SimState:
    """Exponential damping, position integration, spherical boundary with
    reflection + boundary-friction torque (compute:326-357). `dt` may be a
    traced scalar (variable-dt compat, ParticleSystemController.cs:246)."""
    alive = (jnp.arange(state.capacity) < state.active_count)[:, None]
    dt = params.dt if dt is None else dt

    lin_damp = jnp.exp(-state.drag * params.global_drag_multiplier * dt)
    ang_damp = jnp.exp(-params.torque_damping * dt)

    vel = state.vel * lin_damp[:, None]
    ang = state.ang_vel * ang_damp
    pos = state.pos + vel * dt

    dist = jnp.linalg.norm(pos, axis=-1)
    outside = dist > params.spawn_radius
    norm = pos / jnp.maximum(dist, 1e-12)[:, None]

    pos_b = norm * params.spawn_radius
    # reflect(v, n) = v − 2(v·n)n (compute:345)
    v_dot_n = jnp.sum(vel * norm, axis=-1, keepdims=True)
    vel_b = vel - 2.0 * v_dot_n * norm

    tangential = vel_b - jnp.sum(vel_b * norm, axis=-1, keepdims=True) * norm
    # The reference adds the scalar 1e-6 to every component before normalizing
    # (compute:348).
    fr = tangential + 1e-6
    friction_dir = fr / jnp.maximum(
        jnp.linalg.norm(fr, axis=-1, keepdims=True), 1e-20
    )
    friction_mag = (
        jnp.linalg.norm(tangential, axis=-1) * params.boundary_friction
    )
    eff_r = state.radius * params.rolling_contact_radius_multiplier
    # cross(-n·r, -f̂·m) == cross(n·r, f̂·m) (compute:352)
    torque = jnp.cross(
        norm * eff_r[:, None], friction_dir * friction_mag[:, None]
    )
    ang_b = ang + torque / state.inertia[:, None] * dt

    out = outside[:, None]
    pos = jnp.where(alive & out, pos_b, jnp.where(alive, pos, state.pos))
    vel = jnp.where(alive & out, vel_b, jnp.where(alive, vel, state.vel))
    ang = jnp.where(alive & out, ang_b, jnp.where(alive, ang, state.ang_vel))
    return state.replace_fields(pos=pos, vel=vel, ang_vel=ang)


def update_rotation(state: SimState, params: SimParams, dt=None) -> SimState:
    """Drain the torque accumulator (already ×dt at accumulation time,
    compute:291), damp ω again, integrate the quaternion by axis-angle, and
    zero the accumulator (compute:379-408)."""
    alive = jnp.arange(state.capacity) < state.active_count
    dt = params.dt if dt is None else dt

    ang = state.ang_vel + state.torque_accum / state.inertia[:, None]
    ang = ang * jnp.exp(-params.torque_damping * dt)
    rot = quat.integrate_angular(state.rot, ang, dt)

    ang = jnp.where(alive[:, None], ang, state.ang_vel)
    rot = jnp.where(alive[:, None], rot, state.rot)
    return state.replace_fields(
        ang_vel=ang, rot=rot,
        torque_accum=jnp.zeros_like(state.torque_accum),
    )
