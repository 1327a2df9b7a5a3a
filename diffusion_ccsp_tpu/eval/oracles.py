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


#: post-settle tolerances (the reference's physics is forgiving: boxes are
#: *instantiated and simulated* — gaps close and micro-penetrations resolve
#: before any check runs, ``demo_utils.py:1112-1161``)
SETTLE_CONTACT_TOL = 0.03
BOUNDS_TOL = 0.05
PENETRATION_TOL = 0.03


def make_stability_oracle(dynamics: bool = False):
    """Full stability verdict per sample, mirroring the reference protocol
    (``stability_given_solution_json``, ``demo_utils.py:1101-1161``):
    instantiate the sampled boxes, **settle them under gravity** (the
    simulation role — native ``rigid3d_settle``), then require

      1. nothing toppled (CoM supported — the check_stable role),
      2. the settled support structure equals the declared ``supportedby``
         set (``get_support_structure`` comparison, :1144-1153),
      3. the stack stays inside the shelf (height limit :1155-1161 +
         horizontal walls),
      4. no residual interpenetration,
      5. exact static equilibrium (LP) of the settled configuration
         (+ optional native 2-D dynamics confirmation).

    Runs on every sample (``supersedes`` the strict device geometry, which
    rejects measure-zero-exact contacts the simulation resolves).
    """
    from diffusion_ccsp_tpu.envs.stability import check_static_equilibrium
    from diffusion_ccsp_tpu.native import contacts_3d, settle_boxes_3d

    def oracle(graphs, poses, ok_device):
        geom = np.asarray(graphs.geom)
        edges = np.asarray(graphs.edges)
        etypes = np.asarray(graphs.edge_type)
        emask = np.asarray(graphs.edge_mask)
        nmask = np.asarray(graphs.node_mask)
        cmask = np.asarray(graphs.cond_mask)
        wdims = np.asarray(graphs.world_dims)
        b = poses.shape[0]
        ok = np.zeros(b, bool)
        failures = [None] * b
        for i in range(b):
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
            )[tiles]
            centers = poses[i, :, :2][tiles] * np.asarray([w / 2, l / 2])
            n = len(tiles)

            # settle in the shelf plane: (x, depth, height), floor at z=0
            c3 = np.stack(
                [centers[:, 0], np.zeros(n), centers[:, 1] + l / 2], -1
            )
            e3 = np.stack([ext[:, 0], np.ones(n), ext[:, 1]], -1)
            settled, _, topple = settle_boxes_3d(
                c3, np.zeros(n), e3, floor_z=0.0,
                contact_tol=SETTLE_CONTACT_TOL,
            )
            if topple.any():
                failures[i] = "topple"
                continue

            # settled support structure == declared supportedby set
            pairs = contacts_3d(
                settled, np.zeros(n), e3, floor_z=0.0,
                contact_tol=SETTLE_CONTACT_TOL,
            )
            structure = {
                (a + 1, 0 if bb < 0 else bb + 1) for a, bb in pairs
            }
            remap = {g: k + 1 for k, g in enumerate(tiles)}
            declared = set()
            for e in range(etypes.shape[1]):
                if emask[i, e] and etypes[i, e] == 1:  # supportedby
                    a, bb = int(edges[i, e, 0]), int(edges[i, e, 1])
                    declared.add((remap[a], 0 if bb == 0 else remap[bb]))
            if structure != declared:
                failures[i] = "support_structure"
                continue

            # shelf bounds (height limit + walls)
            tops = settled[:, 2] + e3[:, 2] / 2
            if tops.max() > l + BOUNDS_TOL:
                failures[i] = "height"
                continue
            if (np.abs(settled[:, 0]) + e3[:, 0] / 2
                    > w / 2 + BOUNDS_TOL).any():
                failures[i] = "within"
                continue

            # residual interpenetration after settling
            bad = False
            for a in range(n):
                for bb in range(a + 1, n):
                    dx = (e3[a, 0] + e3[bb, 0]) / 2 - abs(
                        settled[a, 0] - settled[bb, 0]
                    )
                    dz = (e3[a, 2] + e3[bb, 2]) / 2 - abs(
                        settled[a, 2] - settled[bb, 2]
                    )
                    if dx > PENETRATION_TOL and dz > PENETRATION_TOL:
                        bad = True
                        break
                if bad:
                    break
            if bad:
                failures[i] = "collision"
                continue

            # exact static equilibrium of the settled configuration
            sub_c = np.stack([settled[:, 0], settled[:, 2] - l / 2], -1)
            supports = [
                (a + 1, 0 if j < 0 else j + 1) for a, j in pairs
            ]
            if not check_static_equilibrium(sub_c, ext, supports, -l / 2):
                failures[i] = "equilibrium"
                continue
            if dynamics:
                from diffusion_ccsp_tpu.native import check_stable_dynamics

                if not check_stable_dynamics(
                    sub_c, ext, floor_y=-l / 2, tol=0.05
                ):
                    failures[i] = "dynamics"
                    continue
            ok[i] = True
        return ok, failures

    oracle.supersedes = True
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
    """Executed-placement verdict per sample (reference role:
    ``pack_given_solution_json`` → ``pick_and_place``,
    ``demo_utils.py:765-820`` — objects are *released* in simulation, so
    sampled boxes may legitimately drop to rest). Protocol:

      1. settle the goal configuration under gravity (native rigid3d);
         failure only on *topple* (CoM unsupported) — drop distance itself is
         the release physics, not an error;
      2. re-check the device geometry (gin/gfree incl. grippers) on the
         settled poses;
      3. every object must admit collision-free IK for its pick and place
         grasps (and, with ``plan_paths``, a joint path).

    Typed failures follow the reference ('pick_q'/'place_q'/'plan') plus
    'topple' and 'geometry'. ``supersedes`` the raw-pose device verdict.
    """
    import jax
    import jax.numpy as jnp

    from diffusion_ccsp_tpu.manipulation import plan_pick_and_place
    from diffusion_ccsp_tpu.native import PandaKinematics, settle_boxes_3d
    from diffusion_ccsp_tpu.ops.geometry3d import (
        batched_robot_breakdown,
        batched_robot_satisfied,
    )

    kin = PandaKinematics()
    check = jax.jit(batched_robot_satisfied)
    breakdown = jax.jit(batched_robot_breakdown)

    def oracle(graphs, poses: np.ndarray, ok_device: np.ndarray):
        geom = np.asarray(graphs.geom)
        grasp = np.asarray(graphs.grasp)
        nmask = np.asarray(graphs.node_mask)
        cmask = np.asarray(graphs.cond_mask)
        b = poses.shape[0]
        ok = np.ones(b, bool)
        failures: list = [None] * b
        rng = np.random.default_rng(seed)
        scenes = [None] * b
        settled_poses = np.array(poses, copy=True)
        for i in range(b):
            scene = scene_from_robot_features(
                geom[i], grasp[i], poses[i], nmask[i], cmask[i]
            )
            scenes[i] = scene
            if settle:
                new_c, _, topple = settle_boxes_3d(
                    scene.centers, scene.yaws, scene.extents, floor_z=0.0,
                    contact_tol=SETTLE_CONTACT_TOL,
                )
                if topple.any():
                    ok[i] = False
                    failures[i] = "topple"
                    continue
                scene.centers = new_c
                # write settled z back into normalized pose features
                h0 = float(geom[i, 0, 5])
                tiles = [
                    k for k in range(geom.shape[1])
                    if nmask[i, k] and not cmask[i, k]
                ]
                for t, k in enumerate(tiles):
                    settled_poses[i, k, 2] = new_c[t, 2] / h0
        # one batched geometry check on the settled configurations, with the
        # named sub-check that failed (round-3: the blanket 'geometry' bucket
        # hid which device check dominates — VERDICT item 7)
        dev_graphs = jax.tree.map(jnp.asarray, graphs)
        dev_poses = jnp.asarray(settled_poses)
        geo_ok, _ = check(dev_graphs, dev_poses)
        geo_ok = np.asarray(geo_ok)
        subchecks = {
            k: np.asarray(v) for k, v in breakdown(dev_graphs, dev_poses).items()
        }
        for i in range(b):
            if not ok[i]:
                continue
            if not geo_ok[i]:
                ok[i] = False
                bad_checks = [k for k, v in subchecks.items() if not v[i]]
                failures[i] = (
                    "geometry:" + "+".join(sorted(bad_checks))
                    if bad_checks
                    else "geometry"
                )
                continue
            results = plan_pick_and_place(
                scenes[i], kin=kin, rng=rng, plan_paths=plan_paths
            )
            bad = [r for r in results if not r.success]
            if bad:
                ok[i] = False
                failures[i] = bad[0].failure
        return ok, failures

    oracle.supersedes = True
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
