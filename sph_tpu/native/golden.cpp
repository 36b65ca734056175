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
