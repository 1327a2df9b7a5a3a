// 3-D gravity-settle and contact queries for yaw-only boxes (the PyBullet
// role for robot-scene verification).
//
// Capability parity: the reference verifies robot placements in PyBullet
// (objects must rest where placed; demo_utils.py:765-820) and stability by
// simulation (demo_utils.py:837-842). For yaw-only box scenes the dynamics
// question factorizes: (a) does every box rest at its height (drop test) and
// (b) is its center of mass supported (topple test)? This module answers
// both exactly with quasi-static settling:
//   1. boxes settle bottom-up: each drops to the highest surface beneath its
//      rotated footprint (floor or a lower box's top face);
//   2. the contact patch of a box is the union of its footprint
//      intersections with its supports; the CoM must project inside the
//      convex hull of the patch vertices or the box topples.
// Convex footprint intersection is Sutherland-Hodgman clipping of the two
// rotated rectangles. Host-side C++, ctypes-exported.

#include <algorithm>
#include <cmath>
#include <cstring>

namespace {

struct P2 { double x, y; };

static void rect_corners(double cx, double cy, double w, double l,
                         double yaw, P2* out) {
    double c = std::cos(yaw), s = std::sin(yaw);
    const double lx[4] = {w / 2, -w / 2, -w / 2, w / 2};
    const double ly[4] = {l / 2, l / 2, -l / 2, -l / 2};
    for (int k = 0; k < 4; ++k) {
        out[k] = {cx + c * lx[k] - s * ly[k], cy + s * lx[k] + c * ly[k]};
    }
}

static double poly_area(const P2* p, int n) {
    double a = 0;
    for (int i = 0; i < n; ++i) {
        int j = (i + 1) % n;
        a += p[i].x * p[j].y - p[j].x * p[i].y;
    }
    return 0.5 * a;
}

// Sutherland-Hodgman: clip subject polygon by convex clip polygon (CCW).
// Returns vertex count (<= 16).
static int clip_convex(const P2* subj, int ns, const P2* clip, int nc,
                       P2* out) {
    P2 buf1[16], buf2[16];
    int n = ns;
    for (int i = 0; i < ns; ++i) buf1[i] = subj[i];
    P2* cur = buf1;
    P2* nxt = buf2;
    for (int e = 0; e < nc && n > 0; ++e) {
        P2 a = clip[e], b = clip[(e + 1) % nc];
        double ex = b.x - a.x, ey = b.y - a.y;
        int m = 0;
        for (int i = 0; i < n; ++i) {
            P2 p = cur[i], q = cur[(i + 1) % n];
            // cross(edge, a->p): >= 0 means p lies left of the CCW edge,
            // i.e. inside the clip polygon (rect_corners emits CCW)
            double sp = ex * (p.y - a.y) - ey * (p.x - a.x);
            double sq = ex * (q.y - a.y) - ey * (q.x - a.x);
            bool pin = sp >= 0, qin = sq >= 0;
            if (pin) {
                if (m < 16) nxt[m++] = p;
            }
            if (pin != qin) {
                double denom = sp - sq;
                double t = (std::fabs(denom) < 1e-12) ? 0.5 : sp / denom;
                if (m < 16)
                    nxt[m++] = {p.x + t * (q.x - p.x), p.y + t * (q.y - p.y)};
            }
        }
        std::swap(cur, nxt);
        n = m;
    }
    for (int i = 0; i < n; ++i) out[i] = cur[i];
    return n;
}

// convex hull (monotone chain) of up to 64 points; returns hull size
static int convex_hull(P2* pts, int n, P2* hull) {
    if (n < 3) {
        for (int i = 0; i < n; ++i) hull[i] = pts[i];
        return n;
    }
    std::sort(pts, pts + n, [](const P2& a, const P2& b) {
        return a.x < b.x || (a.x == b.x && a.y < b.y);
    });
    auto cross = [](const P2& o, const P2& a, const P2& b) {
        return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
    };
    int k = 0;
    for (int i = 0; i < n; ++i) {
        while (k >= 2 && cross(hull[k - 2], hull[k - 1], pts[i]) <= 0) --k;
        hull[k++] = pts[i];
    }
    int lower = k + 1;
    for (int i = n - 2; i >= 0; --i) {
        while (k >= lower && cross(hull[k - 2], hull[k - 1], pts[i]) <= 0) --k;
        hull[k++] = pts[i];
    }
    return k - 1;
}

static bool point_in_hull(const P2& p, const P2* hull, int n, double tol) {
    if (n == 0) return false;
    if (n == 1)
        return std::hypot(p.x - hull[0].x, p.y - hull[0].y) <= tol;
    if (n == 2) {
        // distance to segment
        double dx = hull[1].x - hull[0].x, dy = hull[1].y - hull[0].y;
        double len2 = dx * dx + dy * dy;
        double t = len2 > 0
            ? std::max(0.0, std::min(1.0,
                ((p.x - hull[0].x) * dx + (p.y - hull[0].y) * dy) / len2))
            : 0.0;
        double qx = hull[0].x + t * dx, qy = hull[0].y + t * dy;
        return std::hypot(p.x - qx, p.y - qy) <= tol;
    }
    for (int i = 0; i < n; ++i) {
        const P2& a = hull[i];
        const P2& b = hull[(i + 1) % n];
        double c = (b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x);
        if (c < -tol) return false;
    }
    return true;
}

struct Box {
    double x, y, z, yaw;  // z = center height
    double w, l, h;
    int idx;
};

static double foot_overlap_area(const Box& a, const Box& b) {
    P2 ca[4], cb[4], out[16];
    rect_corners(a.x, a.y, a.w, a.l, a.yaw, ca);
    rect_corners(b.x, b.y, b.w, b.l, b.yaw, cb);
    int n = clip_convex(ca, 4, cb, 4, out);
    if (n < 3) return 0.0;
    return std::fabs(poly_area(out, n));
}

}  // namespace

extern "C" {

// Settle yaw-only boxes under gravity and check CoM support.
//
// states   [n*4]: (x, y, z_center, yaw), updated in place with settled z.
// extents  [n*3]: (w, l, h).
// out_topple [n]: 1 where the settled box's CoM is outside its contact hull.
// Returns the max |z displacement| over boxes.
double rigid3d_settle(double* states, const double* extents, int n,
                      double floor_z, double contact_tol,
                      unsigned char* out_topple) {
    if (n <= 0) return 0.0;
    Box* boxes = new Box[n];
    for (int i = 0; i < n; ++i) {
        boxes[i] = {states[4 * i], states[4 * i + 1], states[4 * i + 2],
                    states[4 * i + 3], extents[3 * i], extents[3 * i + 1],
                    extents[3 * i + 2], i};
    }
    // settle in ascending initial-bottom order: supports settle first
    int* order = new int[n];
    for (int i = 0; i < n; ++i) order[i] = i;
    std::sort(order, order + n, [&](int a, int b) {
        return (boxes[a].z - boxes[a].h / 2) < (boxes[b].z - boxes[b].h / 2);
    });

    double max_disp = 0.0;
    for (int oi = 0; oi < n; ++oi) {
        Box& b = boxes[order[oi]];
        double old_bottom = b.z - b.h / 2;
        double rest = floor_z;
        for (int oj = 0; oj < oi; ++oj) {
            const Box& s = boxes[order[oj]];
            double top = s.z + s.h / 2;
            // a candidate support must be below (its top at or under the
            // box's current bottom, within tolerance) and overlap in plan
            if (top <= old_bottom + contact_tol &&
                foot_overlap_area(b, s) > 1e-9) {
                rest = std::max(rest, top);
            }
        }
        double disp = std::fabs(old_bottom - rest);
        max_disp = std::max(max_disp, disp);
        b.z = rest + b.h / 2;
    }

    // topple: CoM inside the convex hull of all contact-patch vertices
    for (int oi = 0; oi < n; ++oi) {
        const Box& b = boxes[order[oi]];
        double bottom = b.z - b.h / 2;
        P2 pts[64];
        int np = 0;
        if (bottom <= floor_z + contact_tol) {
            // resting on the floor: whole footprint supports
            P2 c[4];
            rect_corners(b.x, b.y, b.w, b.l, b.yaw, c);
            for (int k = 0; k < 4 && np < 64; ++k) pts[np++] = c[k];
        } else {
            for (int oj = 0; oj < n; ++oj) {
                if (oj == oi) continue;
                const Box& s = boxes[order[oj]];
                double top = s.z + s.h / 2;
                if (std::fabs(top - bottom) > contact_tol) continue;
                P2 ca[4], cb[4], patch[16];
                rect_corners(b.x, b.y, b.w, b.l, b.yaw, ca);
                rect_corners(s.x, s.y, s.w, s.l, s.yaw, cb);
                int m = clip_convex(ca, 4, cb, 4, patch);
                for (int k = 0; k < m && np < 64; ++k) pts[np++] = patch[k];
            }
        }
        P2 hull[64];
        int nh = convex_hull(pts, np, hull);
        P2 com{b.x, b.y};
        out_topple[b.idx] =
            point_in_hull(com, hull, nh, contact_tol) ? 0 : 1;
        states[4 * b.idx + 2] = b.z;
    }
    delete[] boxes;
    delete[] order;
    return max_disp;
}

// Contact/support query: writes (i, j) pairs where box i rests on box j
// (j == -1 means the floor). Returns the pair count (capped at max_pairs).
int rigid3d_contacts(const double* states, const double* extents, int n,
                     double floor_z, double contact_tol, int* out_pairs,
                     int max_pairs) {
    int cnt = 0;
    for (int i = 0; i < n && cnt < max_pairs; ++i) {
        Box bi{states[4 * i], states[4 * i + 1], states[4 * i + 2],
               states[4 * i + 3], extents[3 * i], extents[3 * i + 1],
               extents[3 * i + 2], i};
        double bottom = bi.z - bi.h / 2;
        if (std::fabs(bottom - floor_z) <= contact_tol) {
            out_pairs[2 * cnt] = i;
            out_pairs[2 * cnt + 1] = -1;
            ++cnt;
        }
        for (int j = 0; j < n && cnt < max_pairs; ++j) {
            if (j == i) continue;
            Box bj{states[4 * j], states[4 * j + 1], states[4 * j + 2],
                   states[4 * j + 3], extents[3 * j], extents[3 * j + 1],
                   extents[3 * j + 2], j};
            double top = bj.z + bj.h / 2;
            if (std::fabs(bottom - top) <= contact_tol &&
                foot_overlap_area(bi, bj) > 1e-9) {
                out_pairs[2 * cnt] = i;
                out_pairs[2 * cnt + 1] = j;
                ++cnt;
            }
        }
    }
    return cnt;
}

}  // extern "C"
