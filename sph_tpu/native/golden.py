"""ctypes bindings for the native golden-model core (golden.cpp).

Built on demand with g++ (no pybind11 in this image); the shared object is
cached next to the source and rebuilt when the source changes.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "golden.cpp")
_LOCK = threading.Lock()
_LIB = None

f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _src_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def ensure_built() -> str:
    """Compile golden.cpp → a content-addressed .so; return its path."""
    so = os.path.join(_DIR, f"_golden_{_src_hash()}.so")
    if not os.path.exists(so):
        with _LOCK:
            if not os.path.exists(so):
                tmp = so + ".tmp"
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                     "-o", tmp, _SRC],
                    check=True, capture_output=True,
                )
                os.replace(tmp, so)
    return so


def _lib():
    global _LIB
    if _LIB is None:
        with _LOCK:
            if _LIB is None:
                lib = ctypes.CDLL(ensure_built())
                lib.contact_forces.argtypes = [
                    ctypes.c_int, ctypes.c_int, f32p, f32p, f32p, f32p,
                    ctypes.c_float, ctypes.c_float, ctypes.c_float,
                    ctypes.c_float, ctypes.c_float, ctypes.c_float,
                    f32p, f32p, f32p,
                ]
                lib.update_motion.argtypes = [
                    ctypes.c_int, ctypes.c_int, f32p, f32p, f32p, f32p, f32p,
                    f32p, ctypes.c_float, ctypes.c_float, ctypes.c_float,
                    ctypes.c_float, ctypes.c_float, ctypes.c_float,
                ]
                lib.update_rotation.argtypes = [
                    ctypes.c_int, ctypes.c_int, f32p, f32p, f32p, f32p,
                    ctypes.c_float, ctypes.c_float,
                ]
                lib.adhesion_deltas.argtypes = [
                    ctypes.c_int, ctypes.c_int, i32p, i32p, u8p,
                    f32p, f32p, f32p, f32p, ctypes.c_int,
                    f32p, f32p, f32p, f32p, f32p, f32p, f32p,
                    ctypes.c_float, f32p, f32p,
                ]
                lib.sph_density_accel.argtypes = [
                    ctypes.c_int, ctypes.c_int, f32p, f32p,
                    ctypes.c_float, ctypes.c_float, ctypes.c_float,
                    ctypes.c_float, ctypes.c_float, ctypes.c_float,
                    f32p, f32p,
                ]
                _LIB = lib
    return _LIB


def _f(a):
    return np.ascontiguousarray(np.asarray(a), np.float32)


def contact_forces_native(state, params):
    """Contact pass oracle: (force, torque, accum) numpy arrays."""
    n = state.pos.shape[0]
    force = np.zeros((n, 3), np.float32)
    torque = np.zeros((n, 3), np.float32)
    accum = np.zeros((n, 3), np.float32)
    _lib().contact_forces(
        n, int(state.active_count), _f(state.pos), _f(state.vel),
        _f(state.ang_vel), _f(state.radius),
        params.repulsion_strength, params.torque_factor,
        params.rolling_contact_radius_multiplier,
        params.contact_epsilon, params.slip_epsilon, params.dt,
        force, torque, accum,
    )
    return force, torque, accum


def update_motion_native(state, params):
    """Motion pass oracle: (pos, vel, ang_vel)."""
    n = state.pos.shape[0]
    pos, vel, ang = _f(state.pos).copy(), _f(state.vel).copy(), _f(state.ang_vel).copy()
    _lib().update_motion(
        n, int(state.active_count), pos, vel, ang,
        _f(state.radius), _f(state.inertia), _f(state.drag),
        params.global_drag_multiplier, params.torque_damping,
        params.boundary_friction, params.rolling_contact_radius_multiplier,
        params.spawn_radius, params.dt,
    )
    return pos, vel, ang


def update_rotation_native(state, params):
    """Rotation pass oracle: (ang_vel, rot)."""
    n = state.pos.shape[0]
    ang = _f(state.ang_vel).copy()
    rot = _f(state.rot).copy()
    accum = _f(state.torque_accum).copy()
    _lib().update_rotation(
        n, int(state.active_count), ang, rot, accum, _f(state.inertia),
        params.torque_damping, params.dt,
    )
    return ang, rot


def adhesion_deltas_native(state, params, genome_dev):
    """Adhesion pass oracle: (dv [n,3], dq [n,4])."""
    import numpy as _np

    b = state.bonds
    n = state.pos.shape[0]
    nb = b.capacity
    n_modes = max(int(genome_dev.n_modes), 1)
    mode = _np.clip(_np.asarray(b.uid_a) % n_modes, 0, n_modes - 1)
    rest = _f(_np.asarray(genome_dev.adhesion_rest_length)[mode])
    stiff = _f(_np.asarray(genome_dev.adhesion_spring_stiffness)[mode])
    damp = _f(_np.asarray(genome_dev.adhesion_spring_damping)[mode])
    astiff = _f(
        _np.asarray(genome_dev.orientation_constraint_strength)[mode] * 10.0
    )
    dv = np.zeros((n, 3), np.float32)
    dq = np.zeros((n, 4), np.float32)
    _lib().adhesion_deltas(
        n, nb,
        np.ascontiguousarray(np.asarray(b.slot_a), np.int32),
        np.ascontiguousarray(np.asarray(b.slot_b), np.int32),
        np.ascontiguousarray(np.asarray(b.active), np.uint8),
        rest, stiff, damp, astiff,
        1 if params.enable_anchor_constraints else 0,
        _f(b.anchor_a), _f(b.anchor_b), _f(b.rel_orientation),
        _f(state.pos), _f(state.vel), _f(state.rot), _f(state.mass),
        params.dt, dv, dq,
    )
    return dv, dq


def sph_density_accel_native(pos, vel, params):
    """WCSPH density+acceleration oracle (no gravity/obstacles)."""
    n = pos.shape[0]
    rho = np.zeros(n, np.float32)
    acc = np.zeros((n, 3), np.float32)
    _lib().sph_density_accel(
        n, params.ndim, _f(pos), _f(vel),
        params.h, params.particle_mass, params.rest_density,
        params.tait_b, params.gamma, params.viscosity,
        rho, acc,
    )
    return rho, acc
