"""Host-side success oracles for the evaluation protocol.

Capability parity: the reference scores stability tasks by PyBullet physics
verification (``demo_utils.py:987-1235`` via ``ddpm.py:653-661``) and robot
tasks by executing pick-and-place with IK and collision checks
(``demo_utils.py:765-820`` via ``ddpm.py:663-669``). Here the equivalents
are the exact static-equilibrium LP (plus optional native 2-D dynamics
confirmation) and the native-C++ IK / RRT planner of ``manipulation.py``.

Each oracle takes the batched (host numpy) graphs, sampled pose features, and
the on-device geometric verdict, and returns (ok [B], failure reason strings).
The device check is necessary (geometry must hold) — the oracle only runs on
samples that already pass it.
"""

from __future__ import annotations

import numpy as np


def _effective_aabb_np(extents: np.ndarray, yaw: np.ndarray) -> np.ndarray:
    """Exact AABB extents of a yaw-rotated rectangle:
    w' = |w cos| + |l sin|, l' = |w sin| + |l cos| (exact at any yaw, unlike
    the round-1 ±0.1-rad swap approximation)."""
    c, s = np.abs(np.cos(yaw)), np.abs(np.sin(yaw))
    w, l = extents[:, 0], extents[:, 1]
    return np.stack([w * c + l * s, w * s + l * c], -1)


def make_stability_oracle(dynamics: bool = False):
    """LP static-equilibrium verdict per sample (reference role:
    ``run_simulation`` + support checks, ``demo_utils.py:837-842,1032-1098``).

    Supports are taken from the graph's ``supportedby`` edges — the spec the
    sample must realize. With ``dynamics`` the native impulse stepper
    additionally confirms the verdict (``native/rigid2d.cpp``).
    """
    from diffusion_ccsp_tpu.envs.stability import check_static_equilibrium

    def oracle(graphs, poses: np.ndarray, ok_device: np.ndarray):
        geom = np.asarray(graphs.geom)
        edges = np.asarray(graphs.edges)
        etypes = np.asarray(graphs.edge_type)
        emask = np.asarray(graphs.edge_mask)
        nmask = np.asarray(graphs.node_mask)
        cmask = np.asarray(graphs.cond_mask)
        wdims = np.asarray(graphs.world_dims)
        b = poses.shape[0]
        ok = np.asarray(ok_device).copy()
        failures: list = [None] * b
        for i in range(b):
            if not ok[i]:
                failures[i] = "geometric"
                continue
            w, l = float(wdims[i, 0]), float(wdims[i, 1])
            tiles = [
                k for k in range(geom.shape[1])
                if nmask[i, k] and not cmask[i, k]
            ]
            cs, sn = poses[i, :, 2], poses[i, :, 3]
            nrm = np.maximum(np.sqrt(cs**2 + sn**2), 1e-9)
            yaw = np.arctan2(sn / nrm, cs / nrm)
            ext = _effective_aabb_np(
                geom[i, :, :2] * np.asarray([w, l]), yaw
            )
            centers = poses[i, :, :2] * np.asarray([w / 2, l / 2])
            remap = {g: k + 1 for k, g in enumerate(tiles)}
            supports = []
            for e in range(etypes.shape[1]):
                if emask[i, e] and etypes[i, e] == 1:  # supportedby
                    a, bb = int(edges[i, e, 0]), int(edges[i, e, 1])
                    supports.append((remap[a], 0 if bb == 0 else remap[bb]))
            sub_c, sub_e = centers[tiles], ext[tiles]
            # vertical contact: each declared support must actually touch
            # (the LP's contact intervals only test horizontal overlap)
            from diffusion_ccsp_tpu.envs.stability import CONTACT_TOL

            touching = True
            for a, bb in supports:
                bot_a = sub_c[a - 1, 1] - sub_e[a - 1, 1] / 2
                top_b = (
                    -l / 2 if bb == 0
                    else sub_c[bb - 1, 1] + sub_e[bb - 1, 1] / 2
                )
                if abs(bot_a - top_b) > CONTACT_TOL:
                    touching = False
                    break
            if not touching:
                ok[i] = False
                failures[i] = "contact"
                continue
            if not check_static_equilibrium(sub_c, sub_e, supports, -l / 2):
                ok[i] = False
                failures[i] = "equilibrium"
                continue
            if dynamics:
                from diffusion_ccsp_tpu.native import check_stable_dynamics

                if not check_stable_dynamics(
                    sub_c, sub_e, floor_y=-l / 2, tol=0.05
                ):
                    ok[i] = False
                    failures[i] = "dynamics"
        return ok, failures

    return oracle


def scene_from_robot_features(
    geom: np.ndarray, grasp: np.ndarray, pose: np.ndarray,
    nmask: np.ndarray, cmask: np.ndarray,
):
    """Denormalize one robot-mode problem (numpy mirror of
    ``ops.geometry3d.robot_scene_from_features``) into a RobotScene."""
    from diffusion_ccsp_tpu.envs.robot import RobotScene

    w0, l0, h0 = float(geom[0, 3]), float(geom[0, 4]), float(geom[0, 5])
    tiles = [k for k in range(geom.shape[0]) if nmask[k] and not cmask[k]]
    extents = np.stack(
        [geom[tiles, 0] * w0, geom[tiles, 1] * l0, geom[tiles, 2] * h0], -1
    )
    centers = np.stack(
        [
            pose[tiles, 0] * w0 / 2,
            pose[tiles, 1] * l0 / 2,
            pose[tiles, 2] * h0,
        ],
        -1,
    )
    cs, sn = pose[tiles, 3], pose[tiles, 4]
    nrm = np.maximum(np.sqrt(cs**2 + sn**2), 1e-9)
    yaws = np.arctan2(sn / nrm, cs / nrm)
    sides = [int(np.argmax(grasp[k])) for k in tiles]
    return RobotScene(
        container=(w0, l0, h0),
        centers=centers,
        extents=extents,
        yaws=yaws,
        grasp_sides=sides,
    )


def make_robot_oracle(plan_paths: bool = False, seed: int = 0,
                      settle: bool = True):
    """IK pick-and-place verdict per sample (reference role:
    ``pack_given_solution_json`` → ``pick_and_place``,
    ``demo_utils.py:765-820``). Every object must admit collision-free IK for
    its pick and place grasps (and, with ``plan_paths``, a joint path), and
    with ``settle`` the goal configuration must pass the native gravity-settle
    test (boxes rest where placed and are CoM-supported — the simulated
    execution role). Typed failure reasons follow the reference ('pick_q' /
    'place_q' / 'plan' / 'settle')."""
    from diffusion_ccsp_tpu.manipulation import plan_pick_and_place
    from diffusion_ccsp_tpu.native import PandaKinematics, check_robot_settle

    kin = PandaKinematics()

    def oracle(graphs, poses: np.ndarray, ok_device: np.ndarray):
        geom = np.asarray(graphs.geom)
        grasp = np.asarray(graphs.grasp)
        nmask = np.asarray(graphs.node_mask)
        cmask = np.asarray(graphs.cond_mask)
        b = poses.shape[0]
        ok = np.asarray(ok_device).copy()
        failures: list = [None] * b
        rng = np.random.default_rng(seed)
        for i in range(b):
            if not ok[i]:
                failures[i] = "geometric"
                continue
            scene = scene_from_robot_features(
                geom[i], grasp[i], poses[i], nmask[i], cmask[i]
            )
            if settle and not check_robot_settle(
                scene.centers, scene.yaws, scene.extents, floor_z=0.0
            ):
                ok[i] = False
                failures[i] = "settle"
                continue
            results = plan_pick_and_place(
                scene, kin=kin, rng=rng, plan_paths=plan_paths
            )
            bad = [r for r in results if not r.success]
            if bad:
                ok[i] = False
                failures[i] = bad[0].failure
        return ok, failures

    return oracle


def oracle_for_mode(input_mode: str, dynamics: bool = False,
                    plan_paths: bool = False):
    """The full-protocol oracle for a task family (None where the on-device
    geometric check IS the reference semantics: 2-D FCL-style modes)."""
    if "stability" in input_mode:
        return make_stability_oracle(dynamics=dynamics)
    if "robot" in input_mode:
        return make_robot_oracle(plan_paths=plan_paths)
    return None
