// Native golden-model core: scalar C++ implementation of the deterministic
// executable spec (DESIGN.md §2-§4) used as an independent oracle for the
// JAX engine. Double-precision accumulation, float32 I/O.
//
// This is the rebuild's "native tier": the reference's device code is HLSL
// (SimulateParticles.compute); the formulas below re-derive K4/K6/K7/K10/K11
// semantics per the spec, independent of the JAX vectorization.

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

struct V3 {
    double x = 0, y = 0, z = 0;
};

inline V3 v3(const float* p, int i) {
    return V3{p[3 * i], p[3 * i + 1], p[3 * i + 2]};
}
inline void store(float* p, int i, const V3& v) {
    p[3 * i] = (float)v.x;
    p[3 * i + 1] = (float)v.y;
    p[3 * i + 2] = (float)v.z;
}
inline V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
inline V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline V3 operator*(V3 a, double s) { return {a.x * s, a.y * s, a.z * s}; }
inline double dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline V3 cross(V3 a, V3 b) {
    return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
            a.x * b.y - a.y * b.x};
}
inline double norm(V3 a) { return std::sqrt(dot(a, a)); }

struct Q4 {
    double x = 0, y = 0, z = 0, w = 1;
};
inline Q4 q4(const float* p, int i) {
    return Q4{p[4 * i], p[4 * i + 1], p[4 * i + 2], p[4 * i + 3]};
}
inline void store(float* p, int i, const Q4& q) {
    p[4 * i] = (float)q.x;
    p[4 * i + 1] = (float)q.y;
    p[4 * i + 2] = (float)q.z;
    p[4 * i + 3] = (float)q.w;
}
// Hamilton product (SimulateParticles.compute:359-365 semantics).
inline Q4 qmul(Q4 a, Q4 b) {
    V3 va{a.x, a.y, a.z}, vb{b.x, b.y, b.z};
    V3 v = vb * a.w + va * b.w + cross(va, vb);
    return {v.x, v.y, v.z, a.w * b.w - dot(va, vb)};
}
inline Q4 qconj(Q4 q) { return {-q.x, -q.y, -q.z, q.w}; }
inline V3 qrotate(Q4 q, V3 v) {
    V3 u{q.x, q.y, q.z};
    V3 t = cross(u, cross(u, v) + v * q.w);
    return v + t * 2.0;
}
inline Q4 qnormalize(Q4 q) {
    double n = std::sqrt(q.x * q.x + q.y * q.y + q.z * q.z + q.w * q.w);
    if (n < 1e-12) return {0, 0, 0, 1};
    return {q.x / n, q.y / n, q.z / n, q.w / n};
}
inline Q4 axis_angle(V3 axis, double angle) {
    double s = std::sin(angle * 0.5);
    return {axis.x * s, axis.y * s, axis.z * s, std::cos(angle * 0.5)};
}

}  // namespace

extern "C" {

// Contact pass (DESIGN.md §2 / compute:211-309): brute-force pair sums.
// Outputs: force [n,3], torque [n,3], accum [n,3] (= torque·dt).
void contact_forces(
    int n, int active, const float* pos, const float* vel,
    const float* angvel, const float* radius,
    float repulsion_strength, float torque_factor,
    float rolling_mult, float contact_eps, float slip_eps, float dt,
    float* out_force, float* out_torque, float* out_accum) {
    for (int i = 0; i < n; ++i) {
        V3 F{}, T{};
        if (i < active) {
            V3 pi = v3(pos, i), vi = v3(vel, i), wi = v3(angvel, i);
            double ri = radius[i] * 0.5;  // compute:225
            for (int j = 0; j < active; ++j) {
                if (j == i) continue;
                V3 pj = v3(pos, j);
                double rj = radius[j] * 0.5;
                V3 delta = pi - pj;
                double dist = norm(delta);
                double overlap = (ri + rj) - dist;
                if (overlap <= contact_eps) continue;
                V3 dir = delta * (1.0 / (dist > 1e-12 ? dist : 1e-12));
                double sum_r = ri + rj;
                double falloff = overlap / sum_r;  // == 1 - dist/sum_r
                if (falloff > 1) falloff = 1;
                if (falloff < 0) falloff = 0;
                F = F + dir * (falloff * repulsion_strength * falloff);

                // Rolling friction (compute:263-289).
                V3 vj = v3(vel, j), wj = v3(angvel, j);
                V3 arm_i = dir * (-ri), arm_j = dir * rj;
                V3 surf_i = vi + cross(wi, arm_i);
                V3 surf_j = vj + cross(wj, arm_j);
                V3 rel = surf_i - surf_j;
                V3 tang = rel - dir * dot(rel, dir);
                double slip = norm(tang);
                if (slip <= slip_eps) continue;
                V3 fdir = tang * (1.0 / slip);
                double mag = std::pow(std::abs(slip * torque_factor), 1.25);
                if (mag > 10.0) mag = 10.0;
                double rT = falloff * falloff * ri * rolling_mult;
                T = T + cross(dir * rT, fdir * mag);
            }
        }
        store(out_force, i, F);
        store(out_torque, i, T);
        store(out_accum, i, T * dt);
    }
}

// Motion pass (compute:326-357).
void update_motion(
    int n, int active, float* pos, float* vel, float* angvel,
    const float* radius, const float* inertia, const float* drag,
    float global_drag, float torque_damping, float boundary_friction,
    float rolling_mult, float spawn_radius, float dt) {
    for (int i = 0; i < active && i < n; ++i) {
        V3 p = v3(pos, i), v = v3(vel, i), w = v3(angvel, i);
        double lin = std::exp(-(double)drag[i] * global_drag * dt);
        double ang = std::exp(-(double)torque_damping * dt);
        v = v * lin;
        w = w * ang;
        p = p + v * dt;
        double d = norm(p);
        if (d > spawn_radius) {
            V3 nrm = p * (1.0 / d);
            p = nrm * spawn_radius;
            v = v - nrm * (2.0 * dot(v, nrm));  // reflect
            V3 tang = v - nrm * dot(v, nrm);
            V3 fr = {tang.x + 1e-6, tang.y + 1e-6, tang.z + 1e-6};
            double fn = norm(fr);
            V3 fdir = fr * (1.0 / (fn > 1e-20 ? fn : 1e-20));
            double mag = norm(tang) * boundary_friction;
            double eff_r = radius[i] * rolling_mult;
            V3 tq = cross(nrm * eff_r, fdir * mag);
            w = w + tq * (dt / inertia[i]);
        }
        store(pos, i, p);
        store(vel, i, v);
        store(angvel, i, w);
    }
}

// Rotation pass (compute:379-408): drain accum (already ×dt), damp, integrate.
void update_rotation(
    int n, int active, float* angvel, float* rot, float* accum,
    const float* inertia, float torque_damping, float dt) {
    for (int i = 0; i < active && i < n; ++i) {
        V3 w = v3(angvel, i);
        V3 tq = v3(accum, i);
        w = w + tq * (1.0 / inertia[i]);
        w = w * std::exp(-(double)torque_damping * dt);
        V3 wdt = w * dt;
        double angle = norm(wdt);
        Q4 q = q4(rot, i);
        if (angle > 1e-5) {
            V3 axis = wdt * (1.0 / angle);
            q = qnormalize(qmul(axis_angle(axis, angle), q));
        }
        store(rot, i, q);
        store(angvel, i, w);
        store(accum, i, V3{});
    }
}

// Adhesion constraints (DESIGN.md §4 / compute:424-607): per-bond deltas
// accumulated into dv [n,3] and dq [n,4].
void adhesion_deltas(
    int n, int n_bonds,
    const int* slot_a, const int* slot_b, const uint8_t* active_bond,
    const float* rest, const float* stiff, const float* damp,
    const float* anchor_stiff, int enable_anchor,
    const float* anchor_a, const float* anchor_b, const float* rel_q,
    const float* pos, const float* vel, const float* rot, const float* mass,
    float dt, float* out_dv, float* out_dq) {
    std::memset(out_dv, 0, sizeof(float) * 3 * n);
    std::memset(out_dq, 0, sizeof(float) * 4 * n);
    for (int b = 0; b < n_bonds; ++b) {
        if (!active_bond[b]) continue;
        int ia = slot_a[b], ib = slot_b[b];
        if (ia < 0 || ib < 0 || ia >= n || ib >= n) continue;
        V3 pa = v3(pos, ia), pb = v3(pos, ib);
        V3 va = v3(vel, ia), vb = v3(vel, ib);
        Q4 qa = q4(rot, ia), qb = q4(rot, ib);

        // Spring (compute:436-456).
        V3 delta = pb - pa;
        double dist = norm(delta);
        if (dist > 1e-6) {
            V3 dir = delta * (1.0 / dist);
            V3 force = dir * ((dist - rest[b]) * stiff[b]);
            force = force + dir * (dot(vb - va, dir) * damp[b]);
            V3 dva = force * (dt / mass[ia]);
            V3 dvb = force * (-dt / mass[ib]);
            out_dv[3 * ia] += (float)dva.x;
            out_dv[3 * ia + 1] += (float)dva.y;
            out_dv[3 * ia + 2] += (float)dva.z;
            out_dv[3 * ib] += (float)dvb.x;
            out_dv[3 * ib + 1] += (float)dvb.y;
            out_dv[3 * ib + 2] += (float)dvb.z;
        }

        if (!enable_anchor) continue;
        double strength = anchor_stiff[b] * dt;  // compute:460

        // Anchor swing (compute:457-539).
        V3 aa = v3(anchor_a, b), ab = v3(anchor_b, b);
        V3 wa = pa + qrotate(qa, aa);
        V3 wb = pb + qrotate(qb, ab);
        V3 ad = wb - wa;
        double adist = norm(ad);
        if (adist > 1e-6) {
            V3 adir = ad * (1.0 / adist);
            struct End {
                int idx; Q4 q; V3 local; V3 desired;
            } ends[2] = {{ia, qa, aa, adir}, {ib, qb, ab, adir * -1.0}};
            for (auto& e : ends) {
                V3 rw = qrotate(e.q, e.local);
                V3 axis = cross(rw, e.desired);
                double alen = norm(axis);
                if (alen <= 1e-6) continue;
                axis = axis * (1.0 / alen);
                double eff = std::abs(dot(cross(axis, rw), e.desired));
                if (eff <= 1e-6) continue;
                Q4 rq = axis_angle(axis, strength * eff * 5.0);
                Q4 dq = qmul(rq, e.q);
                out_dq[4 * e.idx] += (float)(dq.x - e.q.x);
                out_dq[4 * e.idx + 1] += (float)(dq.y - e.q.y);
                out_dq[4 * e.idx + 2] += (float)(dq.z - e.q.z);
                out_dq[4 * e.idx + 3] += (float)(dq.w - e.q.w);
            }
        }

        // Relative orientation (compute:541-583).
        Q4 cur = qmul(qconj(qa), qb);
        Q4 target = q4(rel_q, b);
        Q4 corr = qmul(target, qconj(cur));
        V3 cv{corr.x, corr.y, corr.z};
        double cangle = 2.0 * std::atan2(norm(cv), std::abs(corr.w));
        if (cangle > 1e-6) {
            V3 axis = cv * (1.0 / (norm(cv) > 1e-20 ? norm(cv) : 1e-20));
            double os = strength * 2.0;
            double angles[2] = {-os * cangle * 0.5, os * cangle * 0.5};
            int idxs[2] = {ia, ib};
            Q4 qs[2] = {qa, qb};
            for (int e = 0; e < 2; ++e) {
                Q4 rq = axis_angle(axis, angles[e]);
                Q4 dq = qmul(rq, qs[e]);
                out_dq[4 * idxs[e]] += (float)(dq.x - qs[e].x);
                out_dq[4 * idxs[e] + 1] += (float)(dq.y - qs[e].y);
                out_dq[4 * idxs[e] + 2] += (float)(dq.z - qs[e].z);
                out_dq[4 * idxs[e] + 3] += (float)(dq.w - qs[e].w);
            }
        }
    }
}

// WCSPH density + acceleration (DESIGN.md §6): brute-force oracle.
void sph_density_accel(
    int n, int ndim, const float* pos, const float* vel,
    float h, float mass, float rest_density, float tait_b, float gamma,
    float viscosity, float* out_rho, float* out_acc) {
    double h2 = (double)h * h;
    double poly6 = (ndim == 3) ? 315.0 / (64.0 * M_PI * std::pow((double)h, 9))
                               : 4.0 / (M_PI * std::pow((double)h, 8));
    double spiky = (ndim == 3) ? -45.0 / (M_PI * std::pow((double)h, 6))
                               : -30.0 / (M_PI * std::pow((double)h, 5));
    double visc = (ndim == 3) ? 45.0 / (M_PI * std::pow((double)h, 6))
                              : 40.0 / (M_PI * std::pow((double)h, 5));
    // density
    for (int i = 0; i < n; ++i) {
        V3 pi = v3(pos, i);
        double acc = 0;
        for (int j = 0; j < n; ++j) {
            V3 d = pi - v3(pos, j);
            double r2 = dot(d, d);
            if (r2 < h2) {
                double t = h2 - r2;
                acc += t * t * t;
            }
        }
        double rho = mass * poly6 * acc;
        out_rho[i] = (float)(rho > 1e-6 ? rho : 1e-6);
    }
    // pressure + accel
    for (int i = 0; i < n; ++i) {
        V3 pi = v3(pos, i), vi = v3(vel, i);
        double rho_i = out_rho[i];
        double p_i = tait_b * (std::pow(rho_i / rest_density, (double)gamma) - 1.0);
        if (p_i < 0) p_i = 0;
        V3 a{};
        for (int j = 0; j < n; ++j) {
            if (j == i) continue;
            V3 d = pi - v3(pos, j);
            double r2 = dot(d, d);
            if (r2 >= h2 || r2 <= 1e-16) continue;
            double r = std::sqrt(r2);
            double rho_j = out_rho[j];
            double p_j = tait_b * (std::pow(rho_j / rest_density, (double)gamma) - 1.0);
            if (p_j < 0) p_j = 0;
            double hr = h - r;
            double cp = -mass * (p_i / (rho_i * rho_i) + p_j / (rho_j * rho_j))
                        * spiky * hr * hr / r;
            a = a + d * cp;
            double cv = viscosity * mass * visc * hr / (rho_i * rho_j);
            a = a + (v3(vel, j) - vi) * cv;
        }
        store(out_acc, i, a);
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Topology: division slot policy + bond graph (DESIGN.md §5 / §4).
//
// Independent scalar re-derivation of the division engine
// (ParticleSystemController.cs:631-969) and the adhesion bond graph
// (CellAdhesionManager.cs:184-509): timers/ready/capacity-cap queueing,
// A-overwrites/B-appends slot policy with A-then-B uid allocation, bond
// inheritance (in-place rewrite, ZoneC duplication into free slots, the
// parentMakeAdhesion A<->B bond), zone classification, anchor placement,
// and the per-side shortest-bond FilterBonds prune.
// ---------------------------------------------------------------------------

namespace {

// Unity Quaternion.Euler(pitch, yaw, 0) * Vector3.forward (cs:966-969).
inline V3 euler_direction(double yaw_deg, double pitch_deg) {
    double yaw = yaw_deg * M_PI / 180.0, pitch = pitch_deg * M_PI / 180.0;
    double cp = std::cos(pitch);
    return {std::sin(yaw) * cp, -std::sin(pitch), std::cos(yaw) * cp};
}

// Rotation matrix with columns (x, y, z) -> quaternion, largest-pivot
// Shepperd construction (first max wins on ties, matching the JAX argmax).
inline Q4 from_matrix(V3 x, V3 y, V3 z) {
    double m00 = x.x, m01 = y.x, m02 = z.x;
    double m10 = x.y, m11 = y.y, m12 = z.y;
    double m20 = x.z, m21 = y.z, m22 = z.z;
    double t[4] = {1.0 + m00 + m11 + m22, 1.0 + m00 - m11 - m22,
                   1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22};
    Q4 q[4] = {
        {m21 - m12, m02 - m20, m10 - m01, t[0]},
        {t[1], m01 + m10, m02 + m20, m21 - m12},
        {m01 + m10, t[2], m12 + m21, m02 - m20},
        {m02 + m20, m12 + m21, t[3], m10 - m01},
    };
    int best = 0;
    for (int i = 1; i < 4; ++i)
        if (t[i] > t[best]) best = i;
    return qnormalize(q[best]);
}

// Unity Quaternion.LookRotation(forward, up) (cs:757, :760).
inline Q4 look_rotation(V3 forward, V3 up) {
    double fn = norm(forward);
    V3 z = forward * (1.0 / (fn > 1e-12 ? fn : 1e-12));
    V3 xv = cross(up, z);
    double xn = norm(xv);
    xv = xv * (1.0 / (xn > 1e-12 ? xn : 1e-12));
    V3 yv = cross(z, xv);
    return from_matrix(xv, yv, z);
}

// ClassifyBondDirection (CellAdhesionManager.cs:320-336).
inline int classify_zone(V3 cell_pos, Q4 cell_rot, V3 other_pos,
                         double split_yaw, double split_pitch,
                         double inh_angle_deg) {
    V3 bd = other_pos - cell_pos;
    double n = norm(bd);
    bd = bd * (1.0 / (n > 1e-12 ? n : 1e-12));
    V3 local = qrotate(qconj(cell_rot), bd);
    V3 split = euler_direction(split_yaw, split_pitch);
    double d = dot(local, split);
    if (d > 1.0) d = 1.0;
    if (d < -1.0) d = -1.0;
    double angle_deg = std::acos(d) * 180.0 / M_PI;
    if (std::abs(angle_deg - 90.0) <= inh_angle_deg) return 2;  // ZoneC
    return d > 0 ? 1 : 0;  // ZoneB : ZoneA
}

}  // namespace

extern "C" {

// UpdateCellDivisionTimers + SplitCell queueing (cs:631-778): advance f32
// timers, detect ready cells in slot order, cap at free capacity, reset
// timers for EVERY ready cell (queued or not, cs:682), and emit the split
// geometry (positions, velocities, look-rotations, child modes) for the
// queued cells. Timer arithmetic stays float32 — the spec stores timers f32
// and the ready epsilon (cs:659) is calibrated to that accumulation.
void queue_splits(
    int n, int active_count, float dt, int n_modes, int S,
    const float* split_interval,                  // [n_modes]
    const int* child_a_mode, const int* child_b_mode,
    const float* parent_split_yaw, const float* parent_split_pitch,
    const float* ca_yaw, const float* ca_pitch,
    const float* cb_yaw, const float* cb_pitch,
    float spawn_overlap_offset, float split_velocity_magnitude,
    const int* mode, float* timer,                // [n] io
    const float* pos, const float* rot,           // [n,3], [n,4]
    int* out_count, int* p_slot, int* p_mode_a, int* p_mode_b,
    int* p_parent_mode,
    float* p_pos_a, float* p_pos_b, float* p_vel_a, float* p_vel_b,
    float* p_rot_a, float* p_rot_b) {
    int allowed = n - active_count;
    if (allowed < 0) allowed = 0;
    if (allowed > S) allowed = S;
    // The reference returns BEFORE the timer-advance loop when there is no
    // headroom or no modes (cs:648-649): timers freeze at capacity.
    if (n - active_count <= 0 || n_modes <= 0) { *out_count = 0; return; }
    int count = 0;
    for (int i = 0; i < n; ++i) {
        bool alive = i < active_count;
        if (alive) timer[i] = timer[i] + dt;  // f32 accumulation
        bool mode_valid = alive && mode[i] >= 0 && mode[i] < n_modes;
        int mc = mode[i];
        if (mc < 0) mc = 0;
        if (mc > n_modes - 1) mc = n_modes - 1;
        if (mc < 0) mc = 0;
        bool ready = mode_valid &&
                     timer[i] >= split_interval[mc] - 0.001f;
        if (!ready) continue;
        timer[i] = 0.0f;  // reset even when the queue is full (cs:682)
        if (count >= allowed) continue;

        int k = count++;
        p_slot[k] = i;
        p_parent_mode[k] = mc;
        int ca = child_a_mode[mc], cb = child_b_mode[mc];
        p_mode_a[k] = (ca >= 0 && ca < n_modes) ? ca : mc;
        p_mode_b[k] = (cb >= 0 && cb < n_modes) ? cb : mc;

        Q4 q = q4(rot, i);
        V3 right = qrotate(q, {1, 0, 0});
        V3 up = qrotate(q, {0, 1, 0});
        V3 fwd = qrotate(q, {0, 0, 1});
        auto local_to_world = [&](V3 d) {
            return right * d.x + up * d.y + fwd * d.z;
        };
        V3 split_dir = local_to_world(
            euler_direction(parent_split_yaw[mc], parent_split_pitch[mc]));
        V3 p = v3(pos, i);
        store(p_pos_a, k, p + split_dir * (double)spawn_overlap_offset);
        store(p_pos_b, k, p - split_dir * (double)spawn_overlap_offset);
        store(p_vel_a, k, split_dir * (double)split_velocity_magnitude);
        store(p_vel_b, k, split_dir * (double)(-split_velocity_magnitude));
        V3 dir_a = local_to_world(euler_direction(ca_yaw[mc], ca_pitch[mc]));
        V3 dir_b = local_to_world(euler_direction(cb_yaw[mc], cb_pitch[mc]));
        store(p_rot_a, k, look_rotation(dir_a, up));
        store(p_rot_b, k, look_rotation(dir_b, up));
    }
    *out_count = count;
}

// HandleCellSplit (CellAdhesionManager.cs:425-509): every bond touching the
// parent is rewritten in place to its inheriting child (or deactivated);
// the ZoneC-both-keep case duplicates into free slots (ascending index);
// parentMakeAdhesion adds a fresh A<->B ZoneC bond. Returns inserts lost to
// capacity. Replicates the reference quirk of passing `zoneA` as the
// child's zone in the ZoneC branch regardless of the parent's end (CAM:477).
static int handle_cell_split_native(
    int n_bonds, uint8_t* b_active, int* b_uid_a, int* b_uid_b,
    int* b_slot_a, int* b_slot_b, int* b_zone_a, int* b_zone_b,
    uint8_t* b_c2c, int* b_created, float* b_rel,
    float* b_anch_a, float* b_anch_b, uint8_t* b_anch_set,
    const float* rot, int n,
    int parent_uid, int uid_a, int uid_b, int slot_a_new, int slot_b_new,
    int keep_a, int keep_b, int make_adhesion, int step_count) {
    auto clipn = [&](int s) { return s < 0 ? 0 : (s >= n ? n - 1 : s); };
    // Captured per-bond originals for the insert phase.
    struct Dup {
        int neighbor_uid, neighbor_slot, neighbor_zone, pass_zone;
    };
    Dup* dups = new Dup[n_bonds];
    int n_dup_want = 0;

    for (int b = 0; b < n_bonds; ++b) {
        bool touches = b_active[b] &&
            (b_uid_a[b] == parent_uid || b_uid_b[b] == parent_uid);
        if (!touches) continue;
        bool a_is_parent = b_uid_a[b] == parent_uid;
        int neighbor_uid = a_is_parent ? b_uid_b[b] : b_uid_a[b];
        int neighbor_slot = a_is_parent ? b_slot_b[b] : b_slot_a[b];
        int neighbor_zone = a_is_parent ? b_zone_b[b] : b_zone_a[b];
        int parent_zone = a_is_parent ? b_zone_a[b] : b_zone_b[b];
        int pass_zone = parent_zone == 2 ? b_zone_a[b] : parent_zone;

        // 0 = none, 1 = child A, 2 = child B.
        int inherit = 0;
        if (parent_zone == 2) inherit = keep_a ? 1 : (keep_b ? 2 : 0);
        else if (parent_zone == 1) inherit = keep_a ? 1 : 0;
        else inherit = keep_b ? 2 : 0;

        if (parent_zone == 2 && keep_a && keep_b)
            dups[n_dup_want++] = {neighbor_uid, neighbor_slot,
                                  neighbor_zone, pass_zone};

        if (inherit == 0) {
            // Pure drop: deactivate AND stamp created_step — dropping a
            // mixed bond can strip its group's prune exemption, and the
            // stamp is filter_bonds' settled-gate reopen signal
            // (biology/bonds.py handle_cell_split, same rule).
            b_active[b] = 0;
            b_created[b] = step_count;
            continue;
        }
        int child_uid = inherit == 1 ? uid_a : uid_b;
        int child_slot = inherit == 1 ? slot_a_new : slot_b_new;
        Q4 rel = qmul(qconj(q4(rot, clipn(child_slot))),
                      q4(rot, clipn(neighbor_slot)));
        b_uid_a[b] = child_uid;
        b_uid_b[b] = neighbor_uid;
        b_slot_a[b] = child_slot;
        b_slot_b[b] = neighbor_slot;
        b_zone_a[b] = pass_zone;
        b_zone_b[b] = neighbor_zone;
        b_c2c[b] = 0;
        b_created[b] = step_count;
        store(b_rel, b, rel);
        b_anch_a[3 * b] = b_anch_a[3 * b + 1] = b_anch_a[3 * b + 2] = 0;
        b_anch_b[3 * b] = b_anch_b[3 * b + 1] = b_anch_b[3 * b + 2] = 0;
        b_anch_set[b] = 0;
    }

    // Free slots post-rewrite, ascending (the JAX stable argsort order).
    int dropped = 0, free_cursor = 0;
    int* free_slots = new int[n_bonds];
    int n_free = 0;
    for (int b = 0; b < n_bonds; ++b)
        if (!b_active[b]) free_slots[n_free++] = b;

    Q4 q_b_new = q4(rot, clipn(slot_b_new));
    for (int d = 0; d < n_dup_want; ++d) {
        if (free_cursor >= n_free) {
            ++dropped;
            continue;
        }
        int t = free_slots[free_cursor++];
        b_active[t] = 1;
        b_uid_a[t] = uid_b;
        b_uid_b[t] = dups[d].neighbor_uid;
        b_slot_a[t] = slot_b_new;
        b_slot_b[t] = dups[d].neighbor_slot;
        b_zone_a[t] = dups[d].pass_zone;
        b_zone_b[t] = dups[d].neighbor_zone;
        b_c2c[t] = 0;
        b_created[t] = step_count;
        store(b_rel, t,
              qmul(qconj(q_b_new), q4(rot, clipn(dups[d].neighbor_slot))));
        b_anch_a[3 * t] = b_anch_a[3 * t + 1] = b_anch_a[3 * t + 2] = 0;
        b_anch_b[3 * t] = b_anch_b[3 * t + 1] = b_anch_b[3 * t + 2] = 0;
        b_anch_set[t] = 0;
    }

    if (make_adhesion) {
        if (free_cursor >= n_free) {
            ++dropped;
        } else {
            int t = free_slots[free_cursor++];
            Q4 rel = qmul(qconj(q4(rot, clipn(slot_a_new))), q_b_new);
            b_active[t] = 1;
            b_uid_a[t] = uid_a;
            b_uid_b[t] = uid_b;
            b_slot_a[t] = slot_a_new;
            b_slot_b[t] = slot_b_new;
            b_zone_a[t] = 2;
            b_zone_b[t] = 2;
            b_c2c[t] = 1;
            b_created[t] = step_count;
            store(b_rel, t, rel);
            b_anch_a[3 * t] = b_anch_a[3 * t + 1] = b_anch_a[3 * t + 2] = 0;
            b_anch_b[3 * t] = b_anch_b[3 * t + 1] = b_anch_b[3 * t + 2] = 0;
            b_anch_set[t] = 0;
        }
    }
    delete[] dups;
    delete[] free_slots;
    return dropped;
}

// ProcessPendingSplits (cs:780-964): apply queued splits sequentially.
// Child A overwrites the parent slot, child B appends at active_count;
// uids allocated A-then-B in queue order; struct fields (radius, mass,
// inertia, drag, repulsion, ang_vel) copied parent -> B; bond inheritance
// per split via HandleCellSplit with the genome keep flags of the PARENT's
// mode (cs:936). overflow accumulates bond inserts lost to capacity.
void process_splits(
    int n, int S, int pending_count,
    const int* p_slot, const int* p_mode_a, const int* p_mode_b,
    const int* p_parent_mode,
    const float* p_pos_a, const float* p_pos_b,
    const float* p_vel_a, const float* p_vel_b,
    const float* p_rot_a, const float* p_rot_b,
    float* pos, float* vel, float* rot, int* mode, float* ang_vel,
    float* radius, float* mass, float* inertia, float* drag,
    float* repulsion, float* timer, int* uid, int* parent_uid,
    int* child_type,
    int* active_count_io, int* next_uid_io, int* overflow_io,
    const uint8_t* keep_a, const uint8_t* keep_b, const uint8_t* make_adh,
    int n_modes,
    int n_bonds, uint8_t* b_active, int* b_uid_a, int* b_uid_b,
    int* b_slot_a, int* b_slot_b, int* b_zone_a, int* b_zone_b,
    uint8_t* b_c2c, int* b_created, float* b_rel,
    float* b_anch_a, float* b_anch_b, uint8_t* b_anch_set,
    int step_count) {
    for (int k = 0; k < S; ++k) {
        if (k >= pending_count || *active_count_io >= n) continue;
        int pslot = p_slot[k];
        if (pslot < 0) pslot = 0;
        if (pslot > n - 1) pslot = n - 1;
        int slot_b = *active_count_io;
        if (slot_b > n - 1) slot_b = n - 1;

        int puid = uid[pslot];
        int uid_a = *next_uid_io, uid_b = *next_uid_io + 1;

        // Child A overwrites the parent slot; child B appends.
        for (int c = 0; c < 3; ++c) {
            pos[3 * pslot + c] = p_pos_a[3 * k + c];
            pos[3 * slot_b + c] = p_pos_b[3 * k + c];
            vel[3 * pslot + c] = p_vel_a[3 * k + c];
            vel[3 * slot_b + c] = p_vel_b[3 * k + c];
            ang_vel[3 * slot_b + c] = ang_vel[3 * pslot + c];
        }
        for (int c = 0; c < 4; ++c) {
            rot[4 * pslot + c] = p_rot_a[4 * k + c];
            rot[4 * slot_b + c] = p_rot_b[4 * k + c];
        }
        mode[pslot] = p_mode_a[k];
        mode[slot_b] = p_mode_b[k];
        radius[slot_b] = radius[pslot];
        mass[slot_b] = mass[pslot];
        inertia[slot_b] = inertia[pslot];
        drag[slot_b] = drag[pslot];
        repulsion[slot_b] = repulsion[pslot];
        timer[pslot] = 0.0f;
        timer[slot_b] = 0.0f;
        uid[pslot] = uid_a;
        uid[slot_b] = uid_b;
        parent_uid[pslot] = puid;
        parent_uid[slot_b] = puid;
        child_type[pslot] = 0;
        child_type[slot_b] = 1;

        // Adhesion flags from CHILD A's resolved mode (the reference reads
        // particleData[parentIndex].modeIndex AFTER the slot was
        // overwritten with childAModeIndex, cs:857 write / cs:933 read).
        int pm = p_mode_a[k];
        if (pm < 0) pm = 0;
        if (pm > n_modes - 1) pm = n_modes - 1;
        if (pm < 0) pm = 0;
        int dropped = handle_cell_split_native(
            n_bonds, b_active, b_uid_a, b_uid_b, b_slot_a, b_slot_b,
            b_zone_a, b_zone_b, b_c2c, b_created, b_rel,
            b_anch_a, b_anch_b, b_anch_set, rot, n,
            puid, uid_a, uid_b, pslot, slot_b,
            keep_a[pm], keep_b[pm], make_adh[pm], step_count);

        *active_count_io += 1;
        *next_uid_io += 2;
        *overflow_io += dropped;
    }
}

// UpdateBondZones (CAM:338-423): bonds are only (re)classified within one
// step of creation; anchors are set exactly one step after creation as the
// body-frame surface direction along the bond (radius hardcoded 1.0).
void update_bond_zones(
    int n, int n_bonds, int step_count, float inh_angle_deg, int n_modes,
    const float* pos, const float* rot, const int* mode,
    const float* split_yaw, const float* split_pitch,
    const uint8_t* b_active, const int* b_slot_a, const int* b_slot_b,
    const int* b_created,
    int* b_zone_a, int* b_zone_b,
    float* b_anch_a, float* b_anch_b, uint8_t* b_anch_set) {
    auto clipn = [&](int s) { return s < 0 ? 0 : (s >= n ? n - 1 : s); };
    int nm = n_modes > 1 ? n_modes : 1;
    for (int b = 0; b < n_bonds; ++b) {
        if (!b_active[b] || step_count > b_created[b] + 1) continue;
        int ia = clipn(b_slot_a[b]), ib = clipn(b_slot_b[b]);
        V3 pa = v3(pos, ia), pb = v3(pos, ib);
        Q4 qa = q4(rot, ia), qb = q4(rot, ib);

        if (step_count == b_created[b] + 1 && !b_anch_set[b]) {
            V3 bd = pb - pa;
            double nrm_ = norm(bd);
            bd = bd * (1.0 / (nrm_ > 1e-12 ? nrm_ : 1e-12));
            store(b_anch_a, b, qrotate(qconj(qa), bd));
            store(b_anch_b, b, qrotate(qconj(qb), bd * -1.0));
            b_anch_set[b] = 1;
        }

        int ma = mode[ia], mb = mode[ib];
        if (ma < 0) ma = 0;
        if (ma > nm - 1) ma = nm - 1;
        if (mb < 0) mb = 0;
        if (mb > nm - 1) mb = nm - 1;
        b_zone_a[b] = classify_zone(pa, qa, pb, split_yaw[ma],
                                    split_pitch[ma], inh_angle_deg);
        b_zone_b[b] = classify_zone(pb, qb, pa, split_yaw[mb],
                                    split_pitch[mb], inh_angle_deg);
    }
}

// FilterBonds (CAM:184-243): eligible bonds group per SIDE — (cellA, zoneA)
// over A-ends, independently (cellB, zoneB) over B-ends — and within each
// group everything but the geometrically shortest is removed (union of the
// two verdicts). Groups containing any C<->(A|B) bond are exempt; bonds
// created this step are exempt; ties keep the lowest bond index.
void filter_bonds(
    int n, int n_bonds, int step_count, const float* pos,
    const int* b_slot_a, const int* b_slot_b,
    const int* b_zone_a, const int* b_zone_b, const int* b_created,
    uint8_t* b_active) {
    auto clipn = [&](int s) { return s < 0 ? 0 : (s >= n ? n - 1 : s); };
    bool* elig = new bool[n_bonds];
    bool* mixed = new bool[n_bonds];
    float* dist = new float[n_bonds];
    bool* rm = new bool[n_bonds];
    for (int b = 0; b < n_bonds; ++b) {
        elig[b] = b_active[b] && b_created[b] < step_count;
        mixed[b] = (b_zone_a[b] == 2) != (b_zone_b[b] == 2);
        // f32 distance to match the device engine's key metric exactly.
        V3 d = v3(pos, clipn(b_slot_b[b])) - v3(pos, clipn(b_slot_a[b]));
        dist[b] = (float)norm(d);
        rm[b] = false;
    }
    for (int side = 0; side < 2; ++side) {
        const int* slot = side == 0 ? b_slot_a : b_slot_b;
        const int* zone = side == 0 ? b_zone_a : b_zone_b;
        for (int b = 0; b < n_bonds; ++b) {
            if (!elig[b]) continue;
            float best = dist[b];
            int best_idx = b;
            bool any_mixed = mixed[b];
            for (int o = 0; o < n_bonds; ++o) {
                if (o == b || !elig[o] || slot[o] != slot[b] ||
                    zone[o] != zone[b])
                    continue;
                any_mixed = any_mixed || mixed[o];
                if (dist[o] < best || (dist[o] == best && o < best_idx)) {
                    best = dist[o];
                    best_idx = o;
                }
            }
            if (!any_mixed && best_idx != b) rm[b] = true;
        }
    }
    for (int b = 0; b < n_bonds; ++b)
        if (rm[b]) b_active[b] = 0;
    delete[] elig;
    delete[] mixed;
    delete[] dist;
    delete[] rm;
}

}  // extern "C"
