// Native kinematics for the Franka Panda arm (7 DoF).
//
// Capability parity: reference pybullet_engine/ikfast/franka_panda/
// ikfast_panda_arm.cpp (OpenRAVE-generated analytical IK exporting
// ComputeFk/ComputeIk with joint 7 free). Rebuilt from scratch:
// exact FK over the Panda's modified-DH chain and a damped-least-squares
// IK that solves the 6-DoF pose with q7 pinned (the reference's free
// joint), multi-seeded for global coverage, joint-limit aware. This is
// host-side C++ feeding the verification oracle, not a TPU kernel.
//
// Build: see build.py (g++ -O2 -shared -fPIC).

#include <cmath>
#include <cstring>
#include <algorithm>

extern "C" {

static const int NJ = 7;

// Modified DH parameters (Craig): a_{i-1}, d_i, alpha_{i-1}
// from the Franka Control Interface documentation.
static const double DH_A[NJ + 1]     = {0.0, 0.0, 0.0, 0.0825, -0.0825, 0.0, 0.088, 0.0};
static const double DH_D[NJ + 1]     = {0.333, 0.0, 0.316, 0.0, 0.384, 0.0, 0.0, 0.107};
static const double DH_ALPHA[NJ + 1] = {0.0, -M_PI_2, M_PI_2, M_PI_2, -M_PI_2, M_PI_2, M_PI_2, 0.0};

static const double Q_MIN[NJ] = {-2.8973, -1.7628, -2.8973, -3.0718, -2.8973, -0.0175, -2.8973};
static const double Q_MAX[NJ] = { 2.8973,  1.7628,  2.8973, -0.0698,  2.8973,  3.7525,  2.8973};

struct Mat4 { double m[16]; };

static void mat4_identity(Mat4& out) {
    std::memset(out.m, 0, sizeof(out.m));
    out.m[0] = out.m[5] = out.m[10] = out.m[15] = 1.0;
}

static void mat4_mul(const Mat4& a, const Mat4& b, Mat4& out) {
    Mat4 r;
    for (int i = 0; i < 4; ++i)
        for (int j = 0; j < 4; ++j) {
            double s = 0;
            for (int k = 0; k < 4; ++k) s += a.m[i * 4 + k] * b.m[k * 4 + j];
            r.m[i * 4 + j] = s;
        }
    out = r;
}

// modified-DH link transform: Rx(alpha_{i-1}) * Tx(a_{i-1}) * Rz(theta_i) * Tz(d_i)
static void dh_transform(double a, double d, double alpha, double theta, Mat4& t) {
    double ct = std::cos(theta), st = std::sin(theta);
    double ca = std::cos(alpha), sa = std::sin(alpha);
    t.m[0] = ct;        t.m[1] = -st;       t.m[2] = 0;    t.m[3] = a;
    t.m[4] = st * ca;   t.m[5] = ct * ca;   t.m[6] = -sa;  t.m[7] = -d * sa;
    t.m[8] = st * sa;   t.m[9] = ct * sa;   t.m[10] = ca;  t.m[11] = d * ca;
    t.m[12] = 0;        t.m[13] = 0;        t.m[14] = 0;   t.m[15] = 1;
}

// FK: joints[7] -> flange pose as a 4x4 row-major matrix out[16].
// Also fills per-joint origins/axes when the pointers are non-null
// (used by the geometric Jacobian).
static void fk_full(const double* q, Mat4& out,
                    double* origins /*7*3*/, double* axes /*7*3*/) {
    Mat4 t, link;
    mat4_identity(t);
    for (int i = 0; i < NJ; ++i) {
        dh_transform(DH_A[i], DH_D[i], DH_ALPHA[i], q[i], link);
        mat4_mul(t, link, t);
        if (origins) {
            origins[i * 3 + 0] = t.m[3];
            origins[i * 3 + 1] = t.m[7];
            origins[i * 3 + 2] = t.m[11];
        }
        if (axes) {  // joint axis = z column of the frame
            axes[i * 3 + 0] = t.m[2];
            axes[i * 3 + 1] = t.m[6];
            axes[i * 3 + 2] = t.m[10];
        }
    }
    // flange
    dh_transform(DH_A[NJ], DH_D[NJ], DH_ALPHA[NJ], 0.0, link);
    mat4_mul(t, link, out);
}

void panda_fk(const double* q, double* pose16) {
    Mat4 t;
    fk_full(q, t, nullptr, nullptr);
    std::memcpy(pose16, t.m, sizeof(t.m));
}

// Joint-frame origins plus the flange origin: out[(NJ+1) * 3]. Used by the
// capsule link-collision model for motion planning.
void panda_fk_points(const double* q, double* out) {
    Mat4 t;
    double origins[NJ * 3];
    fk_full(q, t, origins, nullptr);
    std::memcpy(out, origins, sizeof(origins));
    out[NJ * 3 + 0] = t.m[3];
    out[NJ * 3 + 1] = t.m[7];
    out[NJ * 3 + 2] = t.m[11];
}

// 6x7 geometric Jacobian at configuration q (row-major).
static void jacobian(const double* q, double* J) {
    Mat4 t;
    double origins[NJ * 3], axes[NJ * 3];
    fk_full(q, t, origins, axes);
    double pe[3] = {t.m[3], t.m[7], t.m[11]};
    for (int i = 0; i < NJ; ++i) {
        const double* z = &axes[i * 3];
        const double* o = &origins[i * 3];
        double r[3] = {pe[0] - o[0], pe[1] - o[1], pe[2] - o[2]};
        // linear: z x r
        J[0 * NJ + i] = z[1] * r[2] - z[2] * r[1];
        J[1 * NJ + i] = z[2] * r[0] - z[0] * r[2];
        J[2 * NJ + i] = z[0] * r[1] - z[1] * r[0];
        // angular: z
        J[3 * NJ + i] = z[0];
        J[4 * NJ + i] = z[1];
        J[5 * NJ + i] = z[2];
    }
}

// pose error target vs current: translation delta + rotation-vector delta
static void pose_error(const Mat4& target, const Mat4& cur, double* err6) {
    err6[0] = target.m[3] - cur.m[3];
    err6[1] = target.m[7] - cur.m[7];
    err6[2] = target.m[11] - cur.m[11];
    // R_err = R_t * R_c^T ; rotation vector from skew part
    double re[9];
    for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j) {
            double s = 0;
            for (int k = 0; k < 3; ++k)
                s += target.m[i * 4 + k] * cur.m[j * 4 + k];
            re[i * 3 + j] = s;
        }
    double trace = re[0] + re[4] + re[8];
    double c = std::max(-1.0, std::min(1.0, (trace - 1.0) / 2.0));
    double angle = std::acos(c);
    if (angle < 1e-10) { err6[3] = err6[4] = err6[5] = 0; return; }
    double s2 = 2.0 * std::sin(angle);
    err6[3] = angle * (re[7] - re[5]) / s2;
    err6[4] = angle * (re[2] - re[6]) / s2;
    err6[5] = angle * (re[3] - re[1]) / s2;
}

// solve (J J^T + lambda I) y = e  (6x6, Gaussian elimination), dq = J^T y
static void dls_step(const double* J, const double* e, double lambda, double* dq) {
    double A[36], y[6];
    for (int i = 0; i < 6; ++i)
        for (int j = 0; j < 6; ++j) {
            double s = 0;
            for (int k = 0; k < NJ; ++k) s += J[i * NJ + k] * J[j * NJ + k];
            A[i * 6 + j] = s + (i == j ? lambda : 0.0);
        }
    double b[6];
    std::memcpy(b, e, sizeof(b));
    // gaussian elimination with partial pivoting
    int piv[6] = {0, 1, 2, 3, 4, 5};
    for (int col = 0; col < 6; ++col) {
        int best = col;
        for (int r = col + 1; r < 6; ++r)
            if (std::fabs(A[piv[r] * 6 + col]) > std::fabs(A[piv[best] * 6 + col]))
                best = r;
        std::swap(piv[col], piv[best]);
        double p = A[piv[col] * 6 + col];
        if (std::fabs(p) < 1e-14) continue;
        for (int r = col + 1; r < 6; ++r) {
            double f = A[piv[r] * 6 + col] / p;
            for (int c2 = col; c2 < 6; ++c2)
                A[piv[r] * 6 + c2] -= f * A[piv[col] * 6 + c2];
            b[piv[r]] -= f * b[piv[col]];
        }
    }
    for (int row = 5; row >= 0; --row) {
        double s = b[piv[row]];
        for (int c2 = row + 1; c2 < 6; ++c2) s -= A[piv[row] * 6 + c2] * y[c2];
        double p = A[piv[row] * 6 + row];
        y[row] = (std::fabs(p) < 1e-14) ? 0.0 : s / p;
    }
    for (int k = 0; k < NJ; ++k) {
        double s = 0;
        for (int i = 0; i < 6; ++i) s += J[i * NJ + k] * y[i];
        dq[k] = s;
    }
}

// Core DLS solve. fix_q7 != 0 pins the wrist joint (the reference's free
// joint held at a sampled value); otherwise all 7 joints move.
static int ik_dls(const double* target16, const double* seed, int fix_q7,
                  double q7, double* q_out, int max_iters, double tol) {
    Mat4 target;
    std::memcpy(target.m, target16, sizeof(target.m));
    double q[NJ];
    std::memcpy(q, seed, sizeof(q));
    if (fix_q7) q[6] = q7;

    double J[6 * NJ], e[6], dq[NJ];
    Mat4 cur;
    for (int it = 0; it < max_iters; ++it) {
        fk_full(q, cur, nullptr, nullptr);
        pose_error(target, cur, e);
        double en = 0;
        for (int i = 0; i < 6; ++i) en += e[i] * e[i];
        if (std::sqrt(en) < tol) {
            for (int i = 0; i < NJ; ++i) {
                if (q[i] < Q_MIN[i] - 1e-9 || q[i] > Q_MAX[i] + 1e-9) return 0;
            }
            std::memcpy(q_out, q, sizeof(q));
            return 1;
        }
        jacobian(q, J);
        if (fix_q7)  // zero the fixed joint's column so q7 never moves
            for (int i = 0; i < 6; ++i) J[i * NJ + 6] = 0.0;
        dls_step(J, e, 1e-6 + en * 0.1, dq);
        int last = fix_q7 ? NJ - 1 : NJ;
        for (int i = 0; i < last; ++i) {
            q[i] += dq[i];
            // soft clamp into limits (keeps iterates feasible)
            q[i] = std::max(Q_MIN[i], std::min(Q_MAX[i], q[i]));
        }
    }
    return 0;
}

// IK with q7 fixed (the reference's free joint). Returns 1 on success.
// target: 4x4 row-major flange pose; seed: initial 7-joint configuration.
int panda_ik_q7(const double* target16, double q7, const double* seed,
                double* q_out, int max_iters, double tol) {
    return ik_dls(target16, seed, 1, q7, q_out, max_iters, tol);
}

// Unconstrained 7-DoF IK (used by gen_ik to discover the solution family).
int panda_ik_free(const double* target16, const double* seed,
                  double* q_out, int max_iters, double tol) {
    return ik_dls(target16, seed, 0, 0.0, q_out, max_iters, tol);
}

// Batch IK over multiple seeds; returns number of distinct solutions found
// (up to max_solutions), written consecutively to solutions (7 doubles each).
int panda_ik_q7_multiseed(const double* target16, double q7,
                          const double* seeds, int n_seeds,
                          double* solutions, int max_solutions,
                          int max_iters, double tol) {
    int found = 0;
    double q[NJ];
    for (int s = 0; s < n_seeds && found < max_solutions; ++s) {
        if (!panda_ik_q7(target16, q7, seeds + s * NJ, q, max_iters, tol))
            continue;
        bool dup = false;
        for (int f = 0; f < found; ++f) {
            double dist = 0;
            for (int i = 0; i < NJ; ++i) {
                double d = solutions[f * NJ + i] - q[i];
                dist += d * d;
            }
            if (dist < 1e-4) { dup = true; break; }
        }
        if (!dup) {
            std::memcpy(solutions + found * NJ, q, sizeof(q));
            ++found;
        }
    }
    return found;
}

void panda_joint_limits(double* lo, double* hi) {
    std::memcpy(lo, Q_MIN, sizeof(Q_MIN));
    std::memcpy(hi, Q_MAX, sizeof(Q_MAX));
}

// ----------------------------------------------------------------------- //
// batched 2-D convex collision (SAT) — host-side oracle, FCL's role in the
// reference (envs/collisions.py).
// polys: [n, max_v, 2]; counts: vertices per poly; out: [n, n] 0/1 matrix
void convex_collisions(const double* polys, const int* counts, int n,
                       int max_v, double eps, unsigned char* out) {
    for (int i = 0; i < n; ++i)
        for (int j = 0; j < n; ++j) out[i * n + j] = 0;

    for (int i = 0; i < n; ++i) {
        for (int j = i + 1; j < n; ++j) {
            const double* p1 = polys + i * max_v * 2;
            const double* p2 = polys + j * max_v * 2;
            int n1 = counts[i], n2 = counts[j];
            bool separated = false;
            for (int side = 0; side < 2 && !separated; ++side) {
                const double* pa = side ? p2 : p1;
                int na = side ? n2 : n1;
                for (int k = 0; k < na; ++k) {
                    double ex = pa[((k + 1) % na) * 2] - pa[k * 2];
                    double ey = pa[((k + 1) % na) * 2 + 1] - pa[k * 2 + 1];
                    double ax = -ey, ay = ex;
                    double norm = std::sqrt(ax * ax + ay * ay);
                    if (norm < 1e-12) continue;
                    ax /= norm; ay /= norm;
                    double lo1 = 1e300, hi1 = -1e300, lo2 = 1e300, hi2 = -1e300;
                    for (int v = 0; v < n1; ++v) {
                        double d = ax * p1[v * 2] + ay * p1[v * 2 + 1];
                        lo1 = std::min(lo1, d); hi1 = std::max(hi1, d);
                    }
                    for (int v = 0; v < n2; ++v) {
                        double d = ax * p2[v * 2] + ay * p2[v * 2 + 1];
                        lo2 = std::min(lo2, d); hi2 = std::max(hi2, d);
                    }
                    if (std::min(hi1, hi2) - std::max(lo1, lo2) <= eps) {
                        separated = true;
                        break;
                    }
                }
            }
            if (!separated) {
                out[i * n + j] = 1;
                out[j * n + i] = 1;
            }
        }
    }
}

}  // extern "C"
