"""Native (C++) runtime components: Panda kinematics and the host-side
collision oracle, loaded through ctypes.

Capability parity: reference L0 — the ikfast CPython extension
(``pybullet_engine/ikfast/franka_panda/ikfast_panda_arm.cpp`` exporting
ComputeFk/ComputeIk with one free joint, built by
``pybullet_engine/ikfast/compile.py``) and the FCL collision backend
(``envs/collisions.py``). The library is compiled on first use with g++ and
cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "panda_kin.cpp")
_SRC2 = os.path.join(_DIR, "rigid2d.cpp")
_SRC3 = os.path.join(_DIR, "rigid3d.cpp")
_LIB = os.path.join(_DIR, "libpanda_kin.so")

_lib = None


def _build():
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC, _SRC2, _SRC3]
    subprocess.run(cmd, check=True, capture_output=True)


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    newest_src = max(
        os.path.getmtime(_SRC), os.path.getmtime(_SRC2),
        os.path.getmtime(_SRC3),
    )
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < newest_src:
        _build()
    lib = ctypes.CDLL(_LIB)
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)
    up = ctypes.POINTER(ctypes.c_ubyte)

    lib.panda_fk.argtypes = [dp, dp]
    lib.panda_fk_points.argtypes = [dp, dp]
    lib.panda_ik_q7.argtypes = [dp, ctypes.c_double, dp, dp, ctypes.c_int,
                                ctypes.c_double]
    lib.panda_ik_q7.restype = ctypes.c_int
    lib.panda_ik_free.argtypes = [dp, dp, dp, ctypes.c_int, ctypes.c_double]
    lib.panda_ik_free.restype = ctypes.c_int
    lib.panda_ik_q7_multiseed.argtypes = [
        dp, ctypes.c_double, dp, ctypes.c_int, dp, ctypes.c_int,
        ctypes.c_int, ctypes.c_double,
    ]
    lib.panda_ik_q7_multiseed.restype = ctypes.c_int
    lib.panda_joint_limits.argtypes = [dp, dp]
    lib.convex_collisions.argtypes = [dp, ip, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_double, up]
    lib.rigid2d_simulate.argtypes = [
        dp, dp, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_int,
    ]
    lib.rigid2d_simulate.restype = ctypes.c_double
    lib.rigid3d_settle.argtypes = [dp, dp, ctypes.c_int, ctypes.c_double,
                                   ctypes.c_double, up]
    lib.rigid3d_settle.restype = ctypes.c_double
    lib.rigid3d_contacts.argtypes = [dp, dp, ctypes.c_int, ctypes.c_double,
                                     ctypes.c_double, ip, ctypes.c_int]
    lib.rigid3d_contacts.restype = ctypes.c_int
    _lib = lib
    return lib


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class PandaKinematics:
    """FK / IK for the Franka Panda arm — the ``IKFastWrapper`` equivalent
    (reference ``pybullet_engine/ikfast/ikfast_common.py:28-111``): ``fk``,
    ``ik`` with the wrist joint fixed, and ``gen_ik`` sampling the free joint.
    """

    num_joints = 7
    free_joint = 6  # q7, as in the reference (ikfast_panda_arm GetFreeIndexes)

    def __init__(self):
        self.lib = load_library()
        lo = np.zeros(7)
        hi = np.zeros(7)
        self.lib.panda_joint_limits(_dptr(lo), _dptr(hi))
        self.lower = lo
        self.upper = hi

    def fk(self, q) -> np.ndarray:
        """joints[7] -> flange pose, 4x4."""
        q = np.ascontiguousarray(q, np.float64)
        out = np.zeros(16)
        self.lib.panda_fk(_dptr(q), _dptr(out))
        return out.reshape(4, 4)

    def fk_points(self, q) -> np.ndarray:
        """joints[7] -> [8, 3] joint-frame origins + flange origin (for the
        capsule link-collision model)."""
        q = np.ascontiguousarray(q, np.float64)
        out = np.zeros(8 * 3)
        self.lib.panda_fk_points(_dptr(q), _dptr(out))
        return out.reshape(8, 3)

    def ik(self, target_pose: np.ndarray, q7: float, seed=None,
           max_iters: int = 200, tol: float = 1e-5):
        """Solve for the 6 proximal joints with q7 fixed. Returns q[7] or
        None."""
        target = np.ascontiguousarray(target_pose, np.float64).reshape(16)
        if seed is None:
            seed = (self.lower + self.upper) / 2
        seed = np.ascontiguousarray(seed, np.float64)
        out = np.zeros(7)
        ok = self.lib.panda_ik_q7(
            _dptr(target), ctypes.c_double(q7), _dptr(seed), _dptr(out),
            max_iters, tol,
        )
        return out if ok else None

    def ik_free(self, target_pose: np.ndarray, seed=None,
                max_iters: int = 300, tol: float = 1e-5):
        """Unconstrained 7-DoF IK from one seed. Returns q[7] or None."""
        target = np.ascontiguousarray(target_pose, np.float64).reshape(16)
        if seed is None:
            seed = (self.lower + self.upper) / 2
        seed = np.ascontiguousarray(seed, np.float64)
        out = np.zeros(7)
        ok = self.lib.panda_ik_free(
            _dptr(target), _dptr(seed), _dptr(out), max_iters, tol
        )
        return out if ok else None

    def gen_ik(self, target_pose: np.ndarray, rng=None, num_seeds: int = 16,
               num_q7: int = 8, max_solutions: int = 16):
        """Yield distinct limit-respecting solutions for a target pose
        (reference ``ikfast_common.py:75-111`` gen_ik).

        Strategy: discover the solution family with unconstrained DLS from
        many seeds, then densify by perturbing each discovered solution's
        free joint and re-solving with q7 pinned — the free joint is only
        re-sampled inside the self-motion manifold's feasible range, where
        solutions actually exist.
        """
        if rng is None:
            rng = np.random.default_rng(0)
        target = np.ascontiguousarray(target_pose, np.float64).reshape(16)
        solutions: list[np.ndarray] = []

        def try_add(q):
            if q is None:
                return
            for s in solutions:
                if np.sum((s - q) ** 2) < 1e-4:
                    return
            solutions.append(q.copy())

        mid = (self.lower + self.upper) / 2
        seeds = [mid] + list(
            rng.uniform(self.lower * 0.8, self.upper * 0.8, (num_seeds - 1, 7))
        )
        for seed in seeds:
            if len(solutions) >= max_solutions:
                break
            try_add(self.ik_free(target, seed=seed))

        # densify along the free joint around found solutions
        base = list(solutions)
        for q in base:
            for dq7 in rng.uniform(-0.6, 0.6, num_q7):
                if len(solutions) >= max_solutions:
                    break
                q7 = float(np.clip(q[6] + dq7, self.lower[6], self.upper[6]))
                try_add(self.ik(target, q7=q7, seed=q))
        return solutions


def convex_collisions(polys: list[np.ndarray], eps: float = 1e-6) -> np.ndarray:
    """All-pairs collision matrix for convex 2-D polygons (host-side C++
    oracle; the FCL role of reference ``envs/collisions.py:58-130``)."""
    lib = load_library()
    n = len(polys)
    max_v = max(p.shape[0] for p in polys)
    buf = np.zeros((n, max_v, 2))
    counts = np.zeros(n, np.int32)
    for i, p in enumerate(polys):
        buf[i, : p.shape[0]] = p
        counts[i] = p.shape[0]
    out = np.zeros((n, n), np.uint8)
    lib.convex_collisions(
        _dptr(np.ascontiguousarray(buf)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n, max_v, eps,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out.astype(bool)


def simulate_boxes_2d(
    centers: np.ndarray,
    angles: np.ndarray,
    extents: np.ndarray,
    floor_y: float,
    gravity: float = 9.8,
    friction: float = 0.7,
    dt: float = 1.0 / 240.0,
    steps: int = 600,
    solver_iters: int = 10,
):
    """Dynamics rollout of oriented boxes under gravity — the PyBullet role
    in the reference's stability oracle (``demo_utils.py:837-842`` simulates
    600 steps and checks nothing moved).

    Returns (final_states [n, 3] of (x, y, angle), max_displacement).
    """
    lib = load_library()
    n = len(centers)
    states = np.ascontiguousarray(
        np.concatenate(
            [np.asarray(centers, float), np.asarray(angles, float)[:, None]],
            axis=1,
        ).reshape(-1)
    )
    ext = np.ascontiguousarray(np.asarray(extents, float).reshape(-1))
    disp = lib.rigid2d_simulate(
        _dptr(states), _dptr(ext), n, floor_y, gravity, friction, dt, steps,
        solver_iters,
    )
    return states.reshape(n, 3), float(disp)


def check_stable_dynamics(
    centers: np.ndarray,
    extents: np.ndarray,
    floor_y: float,
    tol: float = 0.03,
    **kw,
) -> bool:
    """check_stable equivalent (reference ``demo_utils.py:1177-1182``):
    simulate and require every box to stay within ``tol`` of its start."""
    angles = np.zeros(len(centers))
    _, disp = simulate_boxes_2d(centers, angles, extents, floor_y, **kw)
    return disp < tol


def settle_boxes_3d(
    centers: np.ndarray,
    yaws: np.ndarray,
    extents: np.ndarray,
    floor_z: float = 0.0,
    contact_tol: float = 0.02,
):
    """Gravity-settle yaw-only 3-D boxes (native rigid3d.cpp): each box drops
    to the highest surface under its footprint; a box whose CoM projects
    outside its contact hull topples. The PyBullet settle-test role for robot
    placements (reference demo_utils.py:765-820 executes in simulation).

    Returns (settled_centers [n, 3], max_drop, topple bool[n]).
    """
    lib = load_library()
    n = len(centers)
    states = np.ascontiguousarray(
        np.concatenate(
            [np.asarray(centers, float), np.asarray(yaws, float)[:, None]],
            axis=1,
        ).reshape(-1)
    )
    ext = np.ascontiguousarray(np.asarray(extents, float).reshape(-1))
    topple = np.zeros(n, np.uint8)
    disp = lib.rigid3d_settle(
        _dptr(states), _dptr(ext), n, floor_z, contact_tol,
        topple.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    out = states.reshape(n, 4)
    return out[:, :3].copy(), float(disp), topple.astype(bool)


def contacts_3d(
    centers: np.ndarray,
    yaws: np.ndarray,
    extents: np.ndarray,
    floor_z: float = 0.0,
    contact_tol: float = 0.02,
) -> list:
    """Support-contact query: [(i, j)] where box i rests on box j (j = -1 is
    the floor). The BulletWorld contact-query role
    (reference pybullet_engine/world.py contact APIs)."""
    lib = load_library()
    n = len(centers)
    states = np.ascontiguousarray(
        np.concatenate(
            [np.asarray(centers, float), np.asarray(yaws, float)[:, None]],
            axis=1,
        ).reshape(-1)
    )
    ext = np.ascontiguousarray(np.asarray(extents, float).reshape(-1))
    pairs = np.zeros(4 * n * n + 8, np.int32)
    cnt = lib.rigid3d_contacts(
        _dptr(states), _dptr(ext), n, floor_z, contact_tol,
        pairs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        2 * n * n + 4,
    )
    return [(int(pairs[2 * k]), int(pairs[2 * k + 1])) for k in range(cnt)]


def check_robot_settle(
    centers: np.ndarray,
    yaws: np.ndarray,
    extents: np.ndarray,
    floor_z: float = 0.0,
    tol: float = 0.03,
) -> bool:
    """Placement settle test: every box must already rest on a surface
    (drop < tol) and be CoM-supported (no topple)."""
    _, disp, topple = settle_boxes_3d(centers, yaws, extents, floor_z)
    return bool(disp < tol and not topple.any())
