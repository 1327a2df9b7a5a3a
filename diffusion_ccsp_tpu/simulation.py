"""Simulation-engine layer: named-body 3-D world with state savers, contact
queries, settling, grasp attachments, robots (Panda + UR5), and rendering.

Capability parity: reference L1 — ``pybullet_engine/world.py`` (BulletWorld:
name<->id registry, body state get/set, contact queries, WorldSaver /
BodyStateSaver, camera render) and ``pybullet_engine/models``
(PandaRobot ``panda_robot.py:38-771``, UR5Robot + suction gripper
``ur5_robot.py:30-313``, action primitives ``robot.py:28-342``).

TPU-native redesign: the engine state is plain numpy (no Bullet C API); the
physics role is the native quasi-static layer (``native/rigid3d.cpp``:
gravity settle, CoM-support topple test, contact queries) plus the exact LP
equilibrium oracle — deterministic and orders of magnitude cheaper than
timestepped dynamics for box worlds, which is all the reference simulates for
Tasks 3-4. Arms are kinematic chains (native DLS IK for the Panda, generic
DH + numpy DLS for the UR5); trajectory following is kinematic stepping with
capsule-link collision checks (``manipulation.py``).
"""

from __future__ import annotations

import dataclasses
import itertools

import numpy as np

from diffusion_ccsp_tpu.native import contacts_3d, settle_boxes_3d

# --------------------------------------------------------------------------- #
# bodies and world
# --------------------------------------------------------------------------- #


@dataclasses.dataclass
class BodyState:
    """Reference ``world.py:53-71`` (velocities are zero in the quasi-static
    engine; kept for API parity)."""

    position: np.ndarray  # [3]
    yaw: float
    linear_velocity: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3)
    )
    angular_velocity: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3)
    )

    def get_7dpose(self) -> np.ndarray:
        """(x, y, z, qx, qy, qz, qw) with a yaw-only quaternion."""
        h = self.yaw / 2
        return np.concatenate(
            [self.position, [0.0, 0.0, np.sin(h), np.cos(h)]]
        )


@dataclasses.dataclass
class Body:
    body_id: int
    name: str
    extents: np.ndarray  # [3]
    state: BodyState
    static: bool = False
    color: tuple = (0.6, 0.6, 0.6)


@dataclasses.dataclass
class ContactInfo:
    """Reference ``world.py:153-201``."""

    body_a: int
    body_b: int  # -1 = floor

    def a_name(self, world: "World3D") -> str:
        return world.body_name(self.body_a)

    def b_name(self, world: "World3D") -> str:
        return "floor" if self.body_b < 0 else world.body_name(self.body_b)


class World3D:
    """Named-body box world with settling physics and savers
    (reference BulletWorld, ``world.py:388-876``)."""

    def __init__(self, floor_z: float = 0.0):
        self.floor_z = floor_z
        self._bodies: dict[int, Body] = {}
        self._by_name: dict[str, int] = {}
        self._next_id = itertools.count(0)
        self._attachments: list[tuple] = []  # (robot, body_id, rel_pose)
        #: callables fn(world) invoked after every step() — used by
        #: execution recorders (reference VideoSaver, demo_utils.py:79-97)
        self.step_hooks: list = []

    # -- registry (reference _NameToIdentifier, world.py:27-49) ------------ #

    def add_box(
        self, name: str, extents, position, yaw: float = 0.0,
        static: bool = False, color=(0.6, 0.6, 0.6),
    ) -> int:
        if name in self._by_name:
            raise ValueError(f"duplicate body name {name!r}")
        bid = next(self._next_id)
        self._bodies[bid] = Body(
            bid, name, np.asarray(extents, float),
            BodyState(np.asarray(position, float), float(yaw)),
            static, color,
        )
        self._by_name[name] = bid
        return bid

    def remove_body(self, body_id: int):
        b = self._bodies.pop(body_id)
        del self._by_name[b.name]

    def body_name(self, body_id: int) -> str:
        return self._bodies[body_id].name

    def body_id(self, name: str) -> int:
        return self._by_name[name]

    @property
    def bodies(self) -> list[Body]:
        return list(self._bodies.values())

    # -- state get/set (reference world.py get/set_body_state) ------------- #

    def get_body_state(self, body_id: int) -> BodyState:
        s = self._bodies[body_id].state
        return BodyState(s.position.copy(), s.yaw)

    def set_body_state(self, body_id: int, state: BodyState):
        self._bodies[body_id].state = BodyState(
            np.asarray(state.position, float).copy(), float(state.yaw)
        )

    def get_body_state_by_name(self, name: str) -> BodyState:
        return self.get_body_state(self._by_name[name])

    # -- physics ------------------------------------------------------------ #

    def _dynamic(self) -> list[Body]:
        return [b for b in self._bodies.values() if not b.static]

    def step(self, settle: bool = True) -> float:
        """Settle all dynamic bodies under gravity (the reference's
        ``client.step`` / 600-step rollouts, ``demo_utils.py:837-842``).
        Returns the max drop distance."""
        dyn = self._dynamic()
        if not dyn:
            for fn in self.step_hooks:
                fn(self)
            return 0.0
        centers = np.stack([b.state.position for b in dyn])
        yaws = np.asarray([b.state.yaw for b in dyn])
        ext = np.stack([b.extents for b in dyn])
        new_centers, disp, topple = settle_boxes_3d(
            centers, yaws, ext, self.floor_z
        )
        if settle:
            for b, c in zip(dyn, new_centers):
                b.state.position = c
        self._last_topple = {
            b.body_id: bool(t) for b, t in zip(dyn, topple)
        }
        for robot, bid, rel in self._attachments:
            # attached bodies follow the robot flange, not gravity
            pose = robot.get_ee_pose4()
            self._bodies[bid].state.position = pose[:3, 3] + rel
        for fn in self.step_hooks:
            fn(self)
        return float(disp)

    def is_stable(self, tol: float = 0.03) -> bool:
        disp = self.step(settle=False)
        return disp < tol and not any(self._last_topple.values())

    def get_contacts(self) -> list[ContactInfo]:
        """Support contacts between dynamic bodies (reference
        ``world.py`` contact queries)."""
        dyn = self._dynamic()
        if not dyn:
            return []
        centers = np.stack([b.state.position for b in dyn])
        yaws = np.asarray([b.state.yaw for b in dyn])
        ext = np.stack([b.extents for b in dyn])
        pairs = contacts_3d(centers, yaws, ext, self.floor_z)
        ids = [b.body_id for b in dyn]
        return [
            ContactInfo(ids[i], -1 if j < 0 else ids[j]) for i, j in pairs
        ]

    # -- attachments (reference gripper constraint-grasping,
    #    panda_robot.py gripper constraints) -------------------------------- #

    def attach(self, robot, body_id: int):
        pose = robot.get_ee_pose4()
        rel = self._bodies[body_id].state.position - pose[:3, 3]
        self._attachments.append((robot, body_id, rel))

    def detach(self, body_id: int):
        self._attachments = [
            a for a in self._attachments if a[1] != body_id
        ]

    # -- rendering ----------------------------------------------------------#

    def render_camera(self, camera):
        """Perspective RGB-D render (reference BulletWorld camera render,
        ``world.py:585-630``). Returns (rgb uint8 [H,W,3], depth [H,W])."""
        from diffusion_ccsp_tpu.envs.camera import render_rgbd

        return render_rgbd(self, camera)

    def get_point_cloud(self, camera, max_points: int | None = None):
        """World-frame colored point cloud from one camera view (reference
        ``world.py:736-790`` point-cloud extraction via open3d).
        Returns (points [P,3], colors [P,3] in [0,1])."""
        from diffusion_ccsp_tpu.envs.camera import (
            depth_to_point_cloud,
            render_rgbd,
        )

        rgb, depth = render_rgbd(self, camera)
        return depth_to_point_cloud(depth, camera, rgb=rgb,
                                    max_points=max_points)

    def render_topdown(self, path: str | None = None, dpi: int = 80):
        """Top-down orthographic render (the reference's camera render role,
        ``world.py`` render / ``render_utils.py``)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.patches import Polygon as MplPoly

        fig, ax = plt.subplots(figsize=(5, 5), dpi=dpi)
        for b in sorted(
            self._bodies.values(), key=lambda b: b.state.position[2]
        ):
            c, s = np.cos(b.state.yaw), np.sin(b.state.yaw)
            w, l = b.extents[0] / 2, b.extents[1] / 2
            local = np.asarray(
                [[w, l], [-w, l], [-w, -l], [w, -l]]
            )
            rot = local @ np.asarray([[c, s], [-s, c]])
            ax.add_patch(
                MplPoly(
                    rot + b.state.position[:2], closed=True,
                    facecolor=b.color, edgecolor="k", alpha=0.85,
                )
            )
        ax.autoscale()
        ax.set_aspect("equal")
        if path:
            fig.savefig(path)
            plt.close(fig)
            return path
        return fig


class BodyStateSaver:
    """Reference ``world.py:258-276``."""

    def __init__(self, world: World3D, body_id: int):
        self.world = world
        self.body_id = body_id
        self.save()

    def save(self):
        self.state = self.world.get_body_state(self.body_id)

    def restore(self):
        self.world.set_body_state(self.body_id, self.state)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.restore()


class WorldSaver:
    """Save/restore every body's state (reference ``world.py:224-366``)."""

    def __init__(self, world: World3D):
        self.world = world
        self.save()

    def save(self):
        self.savers = [
            BodyStateSaver(self.world, b.body_id) for b in self.world.bodies
        ]

    def restore(self):
        for s in self.savers:
            s.restore()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.restore()


# --------------------------------------------------------------------------- #
# arms
# --------------------------------------------------------------------------- #


def _dh_transform(a, alpha, d, theta) -> np.ndarray:
    ct, st = np.cos(theta), np.sin(theta)
    ca, sa = np.cos(alpha), np.sin(alpha)
    return np.asarray(
        [
            [ct, -st * ca, st * sa, a * ct],
            [st, ct * ca, -ct * sa, a * st],
            [0.0, sa, ca, d],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )


class DHArm:
    """Generic serial arm from standard DH rows (a, alpha, d) with numpy
    geometric-Jacobian DLS IK — the engine behind non-Panda robots."""

    def __init__(self, dh_rows, lower, upper, base=np.eye(4)):
        self.dh = np.asarray(dh_rows, float)  # [n, 3] (a, alpha, d)
        self.lower = np.asarray(lower, float)
        self.upper = np.asarray(upper, float)
        self.base = base
        self.n = len(self.dh)

    def fk_frames(self, q) -> list[np.ndarray]:
        frames = [self.base]
        t = self.base.copy()
        for k in range(self.n):
            a, alpha, d = self.dh[k]
            t = t @ _dh_transform(a, alpha, d, q[k])
            frames.append(t)
        return frames

    def fk(self, q) -> np.ndarray:
        return self.fk_frames(q)[-1]

    def jacobian(self, q) -> np.ndarray:
        frames = self.fk_frames(q)
        p_end = frames[-1][:3, 3]
        jac = np.zeros((6, self.n))
        for k in range(self.n):
            z = frames[k][:3, 2]
            p = frames[k][:3, 3]
            jac[:3, k] = np.cross(z, p_end - p)
            jac[3:, k] = z
        return jac

    def ik(self, target: np.ndarray, seed=None, max_iters: int = 300,
           tol: float = 1e-5, damping: float = 0.05):
        """Damped-least-squares IK; returns q or None."""
        q = (
            np.asarray(seed, float).copy()
            if seed is not None
            else (self.lower + self.upper) / 2
        )
        for _ in range(max_iters):
            t = self.fk(q)
            dp = target[:3, 3] - t[:3, 3]
            rot = target[:3, :3] @ t[:3, :3].T
            ang = np.arccos(np.clip((np.trace(rot) - 1) / 2, -1.0, 1.0))
            if ang > 1e-9:
                axis = (
                    np.asarray(
                        [
                            rot[2, 1] - rot[1, 2],
                            rot[0, 2] - rot[2, 0],
                            rot[1, 0] - rot[0, 1],
                        ]
                    )
                    / (2 * np.sin(ang))
                )
                dw = axis * ang
            else:
                dw = np.zeros(3)
            err = np.concatenate([dp, dw])
            if np.abs(err).max() < tol:
                return np.clip(q, self.lower, self.upper)
            jac = self.jacobian(q)
            jt = jac.T
            dq = jt @ np.linalg.solve(
                jac @ jt + damping**2 * np.eye(6), err
            )
            q = np.clip(q + dq, self.lower, self.upper)
        return None

    def gen_ik(self, target: np.ndarray, rng=None, num_seeds: int = 12):
        rng = rng or np.random.default_rng(0)
        sols = []
        seeds = [(self.lower + self.upper) / 2] + list(
            rng.uniform(self.lower * 0.8, self.upper * 0.8,
                        (num_seeds - 1, self.n))
        )
        for s in seeds:
            q = self.ik(target, seed=s)
            if q is None:
                continue
            if all(np.sum((q - p) ** 2) > 1e-4 for p in sols):
                sols.append(q)
        return sols


#: standard UR5 DH table (a, alpha, d) — published Universal Robots values
UR5_DH = [
    (0.0, np.pi / 2, 0.089159),
    (-0.425, 0.0, 0.0),
    (-0.39225, 0.0, 0.0),
    (0.0, np.pi / 2, 0.10915),
    (0.0, -np.pi / 2, 0.09465),
    (0.0, 0.0, 0.0823),
]


class UR5Robot:
    """UR5 arm with a suction-style gripper (reference
    ``pybullet_engine/models/ur5/ur5_robot.py:30-313``): kinematic state,
    fk/ik/gen_ik, move_qpos trajectory stepping, suction activate/release
    implemented as world attachments."""

    HOME = np.asarray([0.0, -np.pi / 2, np.pi / 2, -np.pi / 2, -np.pi / 2, 0.0])

    def __init__(self, world: World3D | None = None, base=np.eye(4)):
        lim = np.full(6, 2 * np.pi)
        self.arm = DHArm(UR5_DH, -lim, lim, base=base)
        self.world = world
        self.qpos = self.HOME.copy()
        self._held: int | None = None

    # reference ur5_robot.py:80-101
    def get_qpos(self) -> np.ndarray:
        return self.qpos.copy()

    def set_qpos(self, q):
        self.qpos = np.asarray(q, float).copy()

    def get_home_qpos(self) -> np.ndarray:
        return self.HOME.copy()

    def reset_home_qpos(self):
        self.qpos = self.HOME.copy()

    def get_ee_pose4(self) -> np.ndarray:
        return self.arm.fk(self.qpos)

    def fk(self, q) -> np.ndarray:
        return self.arm.fk(q)

    def ik(self, target: np.ndarray, seed=None):
        return self.arm.ik(
            target, seed=seed if seed is not None else self.qpos
        )

    def gen_ik(self, target: np.ndarray, rng=None):
        return self.arm.gen_ik(target, rng=rng)

    def move_qpos(self, target_q, steps: int = 50, collision_fn=None) -> bool:
        """Kinematic trajectory stepping (reference move_qpos
        ``ur5_robot.py:143-176``); aborts on collision."""
        start = self.qpos.copy()
        for t in np.linspace(0.0, 1.0, steps):
            q = start + t * (np.asarray(target_q) - start)
            if collision_fn is not None and collision_fn(q):
                return False
            self.qpos = q
            if self.world is not None:
                self.world.step(settle=False)
        return True

    # suction gripper (reference ur5_robot.py activate/release_gripper)
    def activate_gripper(self, body_id: int | None = None) -> bool:
        if self.world is None:
            return False
        if body_id is None:
            # grab the closest dynamic body under the tool
            ee = self.get_ee_pose4()[:3, 3]
            best, best_d = None, np.inf
            for b in self.world.bodies:
                if b.static:
                    continue
                d = np.linalg.norm(
                    b.state.position + [0, 0, b.extents[2] / 2] - ee
                )
                if d < best_d:
                    best, best_d = b.body_id, d
            if best is None or best_d > 0.2:
                return False
            body_id = best
        self.world.attach(self, body_id)
        self._held = body_id
        return True

    def release_gripper(self):
        if self._held is not None and self.world is not None:
            self.world.detach(self._held)
        self._held = None


class PandaRobot:
    """Panda arm over the native kinematics (reference
    ``panda_robot.py:38-771``): ikfast-equivalent fk/ik/gen_ik, capsule
    collision model, trajectory following, pick-and-place primitive via
    ``manipulation.plan_pick_and_place``."""

    def __init__(self, world: World3D | None = None):
        from diffusion_ccsp_tpu.native import PandaKinematics

        self.kin = PandaKinematics()
        self.world = world
        from diffusion_ccsp_tpu.manipulation import PANDA_HOME

        self.qpos = PANDA_HOME.copy()
        self._held: int | None = None

    def get_qpos(self) -> np.ndarray:
        return self.qpos.copy()

    def set_qpos(self, q):
        self.qpos = np.asarray(q, float).copy()

    def get_ee_pose4(self) -> np.ndarray:
        return self.kin.fk(self.qpos)

    def fk(self, q) -> np.ndarray:
        return self.kin.fk(q)

    def ik(self, target, q7: float | None = None, seed=None):
        if q7 is None:
            return self.kin.ik_free(target, seed=seed)
        return self.kin.ik(target, q7=q7, seed=seed)

    def gen_ik(self, target, rng=None, **kw):
        return self.kin.gen_ik(target, rng=rng, **kw)

    def move_qpos_trajectory(self, path, collision_fn=None,
                             steps_per_edge: int = 10,
                             spline: bool = False) -> bool:
        """Follow a joint path kinematically with collision checks
        (reference move_qpos_trajectory_v2, ``panda_robot.py``). With
        ``spline`` the path is resampled through a natural cubic spline
        first (reference ``interpolation_utils.py:19-95``)."""
        if spline and len(path) > 2:
            from diffusion_ccsp_tpu.utils.interpolation import spline_path

            waypoints = spline_path(
                np.asarray(path), num=steps_per_edge * (len(path) - 1)
            )
            segments = zip(waypoints[:-1], waypoints[1:])
            steps_per_edge = 1
        else:
            segments = zip(path[:-1], path[1:])
        for a, b in segments:
            for t in np.linspace(0.0, 1.0, max(steps_per_edge, 1)):
                q = np.asarray(a) + t * (np.asarray(b) - np.asarray(a))
                if collision_fn is not None and collision_fn(q):
                    return False
                self.qpos = q
                if self.world is not None:
                    self.world.step(settle=False)
        return True

    def activate_gripper(self, body_id: int) -> bool:
        if self.world is None:
            return False
        self.world.attach(self, body_id)
        self._held = body_id
        return True

    def release_gripper(self):
        if self._held is not None and self.world is not None:
            self.world.detach(self._held)
        self._held = None
