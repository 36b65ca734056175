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
                # posix_spawn path ONLY (no pipes, close_fds=False, no env/
                # cwd overrides): capture_output's pipes force CPython onto
                # fork_exec, and forking a pytest process with dozens of
                # live XLA threads deadlocked pre-exec (all threads
                # futex-parked, no g++ child, observed twice in round 3 —
                # a malloc-lock-at-fork class hang). vfork-based
                # posix_spawn never runs child-side Python/libc cleanup,
                # so it cannot inherit a held lock.
                log_path = os.path.join(_DIR, "_golden_build.log")
                with open(log_path, "w") as log:
                    r = subprocess.run(
                        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                         "-o", tmp, _SRC],
                        stdout=log, stderr=log, close_fds=False,
                        timeout=300,   # the build is ~1 s; never hang
                    )
                if r.returncode != 0:
                    with open(log_path) as log:
                        raise RuntimeError(
                            "golden.cpp build failed:\n" + log.read()[-2000:]
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
                lib.queue_splits.argtypes = [
                    ctypes.c_int, ctypes.c_int, ctypes.c_float,
                    ctypes.c_int, ctypes.c_int,
                    f32p, i32p, i32p, f32p, f32p, f32p, f32p, f32p, f32p,
                    ctypes.c_float, ctypes.c_float,
                    i32p, f32p, f32p, f32p,
                    i32p, i32p, i32p, i32p, i32p,
                    f32p, f32p, f32p, f32p, f32p, f32p,
                ]
                lib.process_splits.argtypes = [
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    i32p, i32p, i32p, i32p,
                    f32p, f32p, f32p, f32p, f32p, f32p,
                    f32p, f32p, f32p, i32p, f32p,
                    f32p, f32p, f32p, f32p, f32p, f32p, i32p, i32p, i32p,
                    i32p, i32p, i32p,
                    u8p, u8p, u8p, ctypes.c_int,
                    ctypes.c_int, u8p, i32p, i32p, i32p, i32p, i32p, i32p,
                    u8p, i32p, f32p, f32p, f32p, u8p,
                    ctypes.c_int,
                ]
                lib.update_bond_zones.argtypes = [
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_float, ctypes.c_int,
                    f32p, f32p, i32p, f32p, f32p,
                    u8p, i32p, i32p, i32p,
                    i32p, i32p, f32p, f32p, u8p,
                ]
                lib.filter_bonds.argtypes = [
                    ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p,
                    i32p, i32p, i32p, i32p, i32p, u8p,
                ]
                _LIB = lib
    return _LIB


def _f(a):
    """ALWAYS a writable copy. np.asarray of a CPU jax array is a
    ZERO-COPY read-only view (np.shares_memory == True), ascontiguousarray
    preserves it when dtype/layout already match, and ctypes writes
    straight through the data pointer — the oracle was corrupting LIVE jax
    buffers (proven: a ctypes store changed the jax array), which flaked
    test_reference_scenario_topology_sequence order-dependently."""
    return np.array(np.asarray(a), np.float32, copy=True)


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


def _i(a):
    """Writable copy — see _f for why a view would corrupt jax state."""
    return np.array(np.asarray(a), np.int32, copy=True)


def _u8(a):
    """Writable copy — see _f for why a view would corrupt jax state."""
    return np.array(np.asarray(a), np.uint8, copy=True)


def _bond_arrays(b):
    """BondTable -> dict of mutable numpy arrays (C layout)."""
    return {
        "active": _u8(b.active), "uid_a": _i(b.uid_a), "uid_b": _i(b.uid_b),
        "slot_a": _i(b.slot_a), "slot_b": _i(b.slot_b),
        "zone_a": _i(b.zone_a), "zone_b": _i(b.zone_b),
        "child_to_child": _u8(b.child_to_child),
        "created_step": _i(b.created_step),
        "rel_orientation": _f(b.rel_orientation).copy(),
        "anchor_a": _f(b.anchor_a).copy(), "anchor_b": _f(b.anchor_b).copy(),
        "anchors_set": _u8(b.anchors_set),
    }


def queue_splits_native(state, params, genome_dev, dt=None):
    """Division queue oracle (UpdateCellDivisionTimers + SplitCell,
    cs:631-778): returns (timer [n], pending dict) matching
    biology.division.queue_splits."""
    n = state.pos.shape[0]
    S = state.pending.parent_slot.shape[0]
    n_modes = max(int(genome_dev.n_modes), 1)
    timer = _f(state.split_timer).copy()
    count = np.zeros(1, np.int32)
    p = {
        "parent_slot": np.full(S, -1, np.int32),
        "mode_a": np.zeros(S, np.int32), "mode_b": np.zeros(S, np.int32),
        "parent_mode": np.zeros(S, np.int32),
        "pos_a": np.zeros((S, 3), np.float32),
        "pos_b": np.zeros((S, 3), np.float32),
        "vel_a": np.zeros((S, 3), np.float32),
        "vel_b": np.zeros((S, 3), np.float32),
        "rot_a": np.tile(np.array([0, 0, 0, 1], np.float32), (S, 1)),
        "rot_b": np.tile(np.array([0, 0, 0, 1], np.float32), (S, 1)),
    }
    _lib().queue_splits(
        n, int(state.active_count),
        params.dt if dt is None else float(dt), n_modes, S,
        _f(genome_dev.split_interval),
        _i(genome_dev.child_a_mode_index), _i(genome_dev.child_b_mode_index),
        _f(genome_dev.parent_split_yaw), _f(genome_dev.parent_split_pitch),
        _f(genome_dev.child_a_orientation_yaw),
        _f(genome_dev.child_a_orientation_pitch),
        _f(genome_dev.child_b_orientation_yaw),
        _f(genome_dev.child_b_orientation_pitch),
        params.spawn_overlap_offset, params.split_velocity_magnitude,
        _i(state.mode), timer, _f(state.pos), _f(state.rot),
        count, p["parent_slot"], p["mode_a"], p["mode_b"], p["parent_mode"],
        p["pos_a"], p["pos_b"], p["vel_a"], p["vel_b"],
        p["rot_a"], p["rot_b"],
    )
    p["count"] = int(count[0])
    return timer, p


def process_splits_native(state, genome_dev):
    """Split application oracle (ProcessPendingSplits, cs:780-964 +
    HandleCellSplit, CAM:425-509): returns a dict with the updated per-cell
    arrays, scalars (active_count, next_uid, overflow) and bond table."""
    n = state.pos.shape[0]
    pend = state.pending
    S = pend.parent_slot.shape[0]
    n_modes = max(int(genome_dev.n_modes), 1)
    b = _bond_arrays(state.bonds)
    out = {
        "pos": _f(state.pos).copy(), "vel": _f(state.vel).copy(),
        "rot": _f(state.rot).copy(), "mode": _i(state.mode),
        "ang_vel": _f(state.ang_vel).copy(),
        "radius": _f(state.radius).copy(), "mass": _f(state.mass).copy(),
        "inertia": _f(state.inertia).copy(), "drag": _f(state.drag).copy(),
        "repulsion": _f(state.repulsion).copy(),
        "split_timer": _f(state.split_timer).copy(),
        "uid": _i(state.uid), "parent_uid": _i(state.parent_uid),
        "child_type": _i(state.child_type),
    }
    active = np.array([int(state.active_count)], np.int32)
    next_uid = np.array([int(state.next_uid)], np.int32)
    overflow = np.array([0], np.int32)
    _lib().process_splits(
        n, S, int(pend.count),
        _i(pend.parent_slot), _i(pend.mode_a), _i(pend.mode_b),
        _i(pend.parent_mode),
        _f(pend.pos_a), _f(pend.pos_b), _f(pend.vel_a), _f(pend.vel_b),
        _f(pend.rot_a), _f(pend.rot_b),
        out["pos"], out["vel"], out["rot"], out["mode"], out["ang_vel"],
        out["radius"], out["mass"], out["inertia"], out["drag"],
        out["repulsion"], out["split_timer"], out["uid"],
        out["parent_uid"], out["child_type"],
        active, next_uid, overflow,
        _u8(genome_dev.child_a_keep_adhesion),
        _u8(genome_dev.child_b_keep_adhesion),
        _u8(genome_dev.parent_make_adhesion), n_modes,
        state.bonds.capacity, b["active"], b["uid_a"], b["uid_b"],
        b["slot_a"], b["slot_b"], b["zone_a"], b["zone_b"],
        b["child_to_child"], b["created_step"], b["rel_orientation"],
        b["anchor_a"], b["anchor_b"], b["anchors_set"],
        int(state.step_count),
    )
    out.update(active_count=int(active[0]), next_uid=int(next_uid[0]),
               overflow=int(overflow[0]), bonds=b)
    return out


def update_bond_zones_native(state, params, genome_dev):
    """Bond zone/anchor refresh oracle (UpdateBondZones, CAM:338-423):
    returns the updated bond-table dict."""
    n = state.pos.shape[0]
    b = _bond_arrays(state.bonds)
    _lib().update_bond_zones(
        n, state.bonds.capacity, int(state.step_count),
        params.inheritance_angle_deg, max(int(genome_dev.n_modes), 1),
        _f(state.pos), _f(state.rot), _i(state.mode),
        _f(genome_dev.parent_split_yaw), _f(genome_dev.parent_split_pitch),
        b["active"], b["slot_a"], b["slot_b"], b["created_step"],
        b["zone_a"], b["zone_b"], b["anchor_a"], b["anchor_b"],
        b["anchors_set"],
    )
    return b


def filter_bonds_native(state):
    """Shortest-bond prune oracle (FilterBonds, CAM:184-243): returns the
    post-prune active mask [B] (uint8)."""
    b = state.bonds
    active = _u8(b.active)
    _lib().filter_bonds(
        state.pos.shape[0], b.capacity, int(state.step_count), _f(state.pos),
        _i(b.slot_a), _i(b.slot_b), _i(b.zone_a), _i(b.zone_b),
        _i(b.created_step), active,
    )
    return active


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
