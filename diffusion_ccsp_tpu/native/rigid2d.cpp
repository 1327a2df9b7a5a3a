// 2-D rigid-body dynamics for stability verification (the PyBullet role).
//
// Capability parity: reference demo_utils.py:837-842 runs 600 PyBullet steps
// and checks nothing moved (check_stable, demo_utils.py:1177-1182). This is
// a from-scratch impulse-based stepper for oriented boxes under gravity:
// semi-implicit Euler, SAT contact manifolds (up to 2 points), sequential
// impulses with Baumgarte positional correction and Coulomb friction.
// Host-side C++; complements the exact static LP oracle in
// envs/stability.py with a dynamics-grade check.
//
// World convention matches envs/stability.py: x horizontal, y vertical
// (gravity -y), floor is a half-space at y = floor_y.

#include <cmath>
#include <cstring>
#include <algorithm>

namespace {

struct Vec2 { double x, y; };
static Vec2 v2(double x, double y) { return {x, y}; }
static Vec2 add(Vec2 a, Vec2 b) { return {a.x + b.x, a.y + b.y}; }
static Vec2 sub(Vec2 a, Vec2 b) { return {a.x - b.x, a.y - b.y}; }
static Vec2 mul(Vec2 a, double s) { return {a.x * s, a.y * s}; }
static double dot(Vec2 a, Vec2 b) { return a.x * b.x + a.y * b.y; }
static double cross(Vec2 a, Vec2 b) { return a.x * b.y - a.y * b.x; }
static Vec2 crossSV(double s, Vec2 v) { return {-s * v.y, s * v.x}; }

struct Body {
    Vec2 pos;
    double angle;
    Vec2 vel;
    double omega;
    double w, h;     // extents
    double inv_m;
    double inv_i;
};

struct Contact {
    int a, b;        // body indices; b == -1 means the floor
    Vec2 point;
    Vec2 normal;     // from a to b (or floor normal +y with roles flipped)
    double penetration;
    double acc_n = 0, acc_t = 0;  // warm-start accumulators (per step)
};

static void box_corners(const Body& b, Vec2* out) {
    double c = std::cos(b.angle), s = std::sin(b.angle);
    double hw = b.w / 2, hh = b.h / 2;
    const double lx[4] = {hw, -hw, -hw, hw};
    const double ly[4] = {hh, hh, -hh, -hh};
    for (int k = 0; k < 4; ++k) {
        out[k] = {b.pos.x + c * lx[k] - s * ly[k],
                  b.pos.y + s * lx[k] + c * ly[k]};
    }
}

// SAT over both boxes' axes; builds up to 2 contact points by clipping the
// incident face against the reference face side planes.
static int collide_boxes(const Body& A, const Body& B, int ia, int ib,
                         Contact* out) {
    Vec2 ca[4], cb[4];
    box_corners(A, ca);
    box_corners(B, cb);

    double best_pen = 1e300;
    Vec2 best_axis{0, 0};
    int best_owner = 0;  // 0: axis from A, 1: from B

    for (int owner = 0; owner < 2; ++owner) {
        const Vec2* poly = owner ? cb : ca;
        for (int e = 0; e < 4; ++e) {
            Vec2 edge = sub(poly[(e + 1) % 4], poly[e]);
            double len = std::sqrt(dot(edge, edge));
            if (len < 1e-12) continue;
            Vec2 axis = {-edge.y / len, edge.x / len};
            double amin = 1e300, amax = -1e300, bmin = 1e300, bmax = -1e300;
            for (int k = 0; k < 4; ++k) {
                double da = dot(axis, ca[k]);
                double db = dot(axis, cb[k]);
                amin = std::min(amin, da); amax = std::max(amax, da);
                bmin = std::min(bmin, db); bmax = std::max(bmax, db);
            }
            double pen = std::min(amax, bmax) - std::max(amin, bmin);
            if (pen <= 0) return 0;  // separated
            if (pen < best_pen) {
                best_pen = pen;
                // orient axis from A toward B
                double ac = dot(axis, A.pos), bc = dot(axis, B.pos);
                best_axis = (bc >= ac) ? axis : mul(axis, -1.0);
                best_owner = owner;
            }
        }
    }

    // contact points: vertices of the "incident" box deepest along the axis
    const Vec2* inc = best_owner == 0 ? cb : ca;
    Vec2 n = best_owner == 0 ? best_axis : mul(best_axis, -1.0);
    // depth of incident vertices along -n relative to reference box max
    const Vec2* ref = best_owner == 0 ? ca : cb;
    double ref_max = -1e300;
    for (int k = 0; k < 4; ++k) ref_max = std::max(ref_max, dot(n, ref[k]));

    int count = 0;
    // pick up to 2 incident vertices inside the reference surface
    struct VP { double depth; Vec2 p; };
    VP vps[4];
    int nv = 0;
    for (int k = 0; k < 4; ++k) {
        double depth = ref_max - dot(n, inc[k]);
        if (depth > -1e-9) vps[nv++] = {depth, inc[k]};
    }
    std::sort(vps, vps + nv, [](const VP& a, const VP& b) { return a.depth > b.depth; });
    for (int k = 0; k < std::min(nv, 2); ++k) {
        Contact c;
        c.a = ia; c.b = ib;
        c.point = vps[k].p;
        c.normal = best_owner == 0 ? best_axis : best_axis;  // A->B
        c.penetration = std::max(vps[k].depth, 0.0);
        out[count++] = c;
    }
    if (count == 0) {
        Contact c;
        c.a = ia; c.b = ib;
        c.point = mul(add(A.pos, B.pos), 0.5);
        c.normal = best_axis;
        c.penetration = best_pen;
        out[count++] = c;
    }
    return count;
}

static int collide_floor(const Body& A, int ia, double floor_y, Contact* out) {
    Vec2 c[4];
    box_corners(A, c);
    int count = 0;
    for (int k = 0; k < 4 && count < 2; ++k) {
        double pen = floor_y - c[k].y;
        if (pen > 0) {
            Contact ct;
            ct.a = ia; ct.b = -1;
            ct.point = c[k];
            ct.normal = {0, -1};  // from body toward floor
            ct.penetration = pen;
            out[count++] = ct;
        }
    }
    return count;
}

}  // namespace

extern "C" {

// Simulate n boxes for `steps` substeps of dt. states: per body
// [x, y, angle] in, updated in place. extents [w, h] per body.
// Returns max displacement (position) across bodies over the rollout.
double rigid2d_simulate(double* states, const double* extents, int n,
                        double floor_y, double gravity, double friction,
                        double dt, int steps, int solver_iters) {
    const double density = 1.0;
    Body* bodies = new Body[n];
    double* sx = new double[n];
    double* sy = new double[n];
    for (int i = 0; i < n; ++i) {
        bodies[i].pos = {states[i * 3], states[i * 3 + 1]};
        bodies[i].angle = states[i * 3 + 2];
        bodies[i].vel = {0, 0};
        bodies[i].omega = 0;
        bodies[i].w = extents[i * 2];
        bodies[i].h = extents[i * 2 + 1];
        double m = density * bodies[i].w * bodies[i].h;
        bodies[i].inv_m = 1.0 / m;
        double I = m * (bodies[i].w * bodies[i].w + bodies[i].h * bodies[i].h) / 12.0;
        bodies[i].inv_i = 1.0 / I;
        sx[i] = bodies[i].pos.x;
        sy[i] = bodies[i].pos.y;
    }

    Contact contacts[512];
    for (int step = 0; step < steps; ++step) {
        // integrate velocities
        for (int i = 0; i < n; ++i) {
            bodies[i].vel.y -= gravity * dt;
        }

        // contact generation
        int nc = 0;
        for (int i = 0; i < n && nc < 500; ++i) {
            nc += collide_floor(bodies[i], i, floor_y, contacts + nc);
            for (int j = i + 1; j < n && nc < 500; ++j) {
                nc += collide_boxes(bodies[i], bodies[j], i, j, contacts + nc);
            }
        }

        // sequential impulse solver
        const double baumgarte = 0.2, slop = 1e-4;
        for (int it = 0; it < solver_iters; ++it) {
            for (int k = 0; k < nc; ++k) {
                Contact& c = contacts[k];
                Body& A = bodies[c.a];
                Body* B = c.b >= 0 ? &bodies[c.b] : nullptr;

                Vec2 ra = sub(c.point, A.pos);
                Vec2 rb = B ? sub(c.point, B->pos) : v2(0, 0);
                Vec2 va = add(A.vel, crossSV(A.omega, ra));
                Vec2 vb = B ? add(B->vel, crossSV(B->omega, rb)) : v2(0, 0);
                Vec2 rel = sub(vb, va);

                // normal impulse (normal points A->B / body->floor)
                double vn = dot(rel, c.normal);
                double ran = cross(ra, c.normal);
                double kn = A.inv_m + ran * ran * A.inv_i;
                if (B) {
                    double rbn = cross(rb, c.normal);
                    kn += B->inv_m + rbn * rbn * B->inv_i;
                }
                double bias = -baumgarte / dt * std::max(c.penetration - slop, 0.0);
                double dpn = -(vn + bias) / kn;
                double new_acc = std::max(c.acc_n + dpn, 0.0);
                dpn = new_acc - c.acc_n;
                c.acc_n = new_acc;
                Vec2 pn = mul(c.normal, dpn);
                A.vel = sub(A.vel, mul(pn, A.inv_m));
                A.omega -= A.inv_i * cross(ra, pn);
                if (B) {
                    B->vel = add(B->vel, mul(pn, B->inv_m));
                    B->omega += B->inv_i * cross(rb, pn);
                }

                // friction impulse
                Vec2 t = {-c.normal.y, c.normal.x};
                va = add(A.vel, crossSV(A.omega, ra));
                vb = B ? add(B->vel, crossSV(B->omega, rb)) : v2(0, 0);
                rel = sub(vb, va);
                double vt = dot(rel, t);
                double rat = cross(ra, t);
                double kt = A.inv_m + rat * rat * A.inv_i;
                if (B) {
                    double rbt = cross(rb, t);
                    kt += B->inv_m + rbt * rbt * B->inv_i;
                }
                double dpt = -vt / kt;
                double max_f = friction * c.acc_n;
                double new_t = std::max(-max_f, std::min(max_f, c.acc_t + dpt));
                dpt = new_t - c.acc_t;
                c.acc_t = new_t;
                Vec2 pt = mul(t, dpt);
                A.vel = sub(A.vel, mul(pt, A.inv_m));
                A.omega -= A.inv_i * cross(ra, pt);
                if (B) {
                    B->vel = add(B->vel, mul(pt, B->inv_m));
                    B->omega += B->inv_i * cross(rb, pt);
                }
            }
        }

        // integrate positions
        for (int i = 0; i < n; ++i) {
            bodies[i].pos = add(bodies[i].pos, mul(bodies[i].vel, dt));
            bodies[i].angle += bodies[i].omega * dt;
        }
    }

    double max_disp = 0;
    for (int i = 0; i < n; ++i) {
        states[i * 3] = bodies[i].pos.x;
        states[i * 3 + 1] = bodies[i].pos.y;
        states[i * 3 + 2] = bodies[i].angle;
        double dx = bodies[i].pos.x - sx[i];
        double dy = bodies[i].pos.y - sy[i];
        max_disp = std::max(max_disp, std::sqrt(dx * dx + dy * dy));
    }
    delete[] bodies;
    delete[] sx;
    delete[] sy;
    return max_disp;
}

}  // extern "C"
