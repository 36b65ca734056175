"""Quaternion library, [x, y, z, w] layout, batched over leading axes.

Matches the reference's conventions: Hamilton product / conjugate / rotate as in
SimulateParticles.compute:359-377, Unity Euler (z-x-y extrinsic, roll=0) and
Quaternion.LookRotation as used by the division engine
(ParticleSystemController.cs:748-969).
"""

from __future__ import annotations

import jax.numpy as jnp

IDENTITY = jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)


def identity(shape=()) -> jnp.ndarray:
    """Identity quaternion(s) with the given batch shape."""
    return jnp.broadcast_to(IDENTITY, (*shape, 4))


def mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 ⊗ q2 (cf. quat_mul, SimulateParticles.compute:359-365)."""
    v1, w1 = q1[..., :3], q1[..., 3:4]
    v2, w2 = q2[..., :3], q2[..., 3:4]
    v = w1 * v2 + w2 * v1 + jnp.cross(v1, v2)
    w = w1 * w2 - jnp.sum(v1 * v2, axis=-1, keepdims=True)
    return jnp.concatenate([v, w], axis=-1)


def conjugate(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (= inverse for unit quaternions; compute:367-371)."""
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q (compute:373-377)."""
    u = q[..., :3]
    w = q[..., 3:4]
    return v + 2.0 * jnp.cross(u, jnp.cross(u, v) + w * v)


def normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion from a (normalized) axis and angle."""
    angle = jnp.asarray(angle)[..., None]
    s = jnp.sin(angle * 0.5)
    c = jnp.cos(angle * 0.5)
    return jnp.concatenate([axis * s, c], axis=-1)


def euler_direction(yaw_deg: jnp.ndarray, pitch_deg: jnp.ndarray) -> jnp.ndarray:
    """Unity `Quaternion.Euler(pitch, yaw, 0) * Vector3.forward`.

    Unity composes z-x-y (roll, then pitch, then yaw); with roll=0 the forward
    axis maps to (sin yaw·cos pitch, −sin pitch, cos yaw·cos pitch).
    Cf. GetDirection, ParticleSystemController.cs:966-969.
    """
    yaw = jnp.deg2rad(jnp.asarray(yaw_deg, dtype=jnp.float32))
    pitch = jnp.deg2rad(jnp.asarray(pitch_deg, dtype=jnp.float32))
    cp = jnp.cos(pitch)
    return jnp.stack(
        [jnp.sin(yaw) * cp, -jnp.sin(pitch), jnp.cos(yaw) * cp], axis=-1
    )


def from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (…,3,3, column-vectors convention) → quaternion [x,y,z,w].

    Branch-free Shepperd-style construction: computes all four candidate
    quaternions and selects by the largest pivot, so it is jit/vmap friendly.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Candidate 0: pivot on trace.
    t0 = 1.0 + tr
    q0 = jnp.stack([m21 - m12, m02 - m20, m10 - m01, t0], axis=-1)
    # Candidate 1: pivot on m00.
    t1 = 1.0 + m00 - m11 - m22
    q1 = jnp.stack([t1, m01 + m10, m02 + m20, m21 - m12], axis=-1)
    # Candidate 2: pivot on m11.
    t2 = 1.0 - m00 + m11 - m22
    q2 = jnp.stack([m01 + m10, t2, m12 + m21, m02 - m20], axis=-1)
    # Candidate 3: pivot on m22.
    t3 = 1.0 - m00 - m11 + m22
    q3 = jnp.stack([m02 + m20, m12 + m21, t3, m10 - m01], axis=-1)

    ts = jnp.stack([t0, t1, t2, t3], axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)
    idx = jnp.argmax(ts, axis=-1)
    q = jnp.take_along_axis(qs, idx[..., None, None].repeat(4, axis=-1), axis=-2)
    q = jnp.squeeze(q, axis=-2)
    return normalize(q)


def look_rotation(forward: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """Unity `Quaternion.LookRotation(forward, up)`.

    Builds an orthonormal frame with z = f̂, x = normalize(up × f̂), y = z × x,
    then converts to a quaternion. Used for child orientations on division
    (ParticleSystemController.cs:757, :760).
    """
    z = forward / jnp.maximum(jnp.linalg.norm(forward, axis=-1, keepdims=True), 1e-12)
    x = jnp.cross(up, z)
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    y = jnp.cross(z, x)
    # Column-vector rotation matrix whose columns are the basis vectors.
    m = jnp.stack([x, y, z], axis=-1)
    return from_matrix(m)


def axis3(q: jnp.ndarray):
    """Body frame axes (right, up, forward) = q·(x̂, ŷ, ẑ)."""
    right = rotate(q, jnp.array([1.0, 0.0, 0.0], dtype=jnp.float32))
    upv = rotate(q, jnp.array([0.0, 1.0, 0.0], dtype=jnp.float32))
    fwd = rotate(q, jnp.array([0.0, 0.0, 1.0], dtype=jnp.float32))
    return right, upv, fwd


def integrate_angular(q: jnp.ndarray, omega: jnp.ndarray, dt: float,
                      angle_eps: float = 1e-5) -> jnp.ndarray:
    """Axis-angle quaternion integration (UpdateRotation, compute:394-404).

    dq = (axis·sin(θ/2), cos(θ/2)) with θ = |ω·dt|; skipped below angle_eps.
    """
    w_dt = omega * dt
    angle = jnp.linalg.norm(w_dt, axis=-1, keepdims=True)
    axis = w_dt / jnp.maximum(angle, 1e-20)
    s = jnp.sin(angle * 0.5)
    c = jnp.cos(angle * 0.5)
    dq = jnp.concatenate([axis * s, c], axis=-1)
    q_new = normalize(mul(dq, q))
    return jnp.where(angle > angle_eps, q_new, q)
