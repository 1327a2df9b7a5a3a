"""Manipulation pipeline: grasp poses are kinematically reachable, full
pick-and-place planning succeeds for workspace-scaled scenes."""

import numpy as np
import pytest

from diffusion_ccsp_tpu.envs.robot import sample_robot_scene
from diffusion_ccsp_tpu.manipulation import (
    PANDA_HOME,
    WorkspaceTransform,
    grasp_flange_pose,
    plan_pick_and_place,
)
from diffusion_ccsp_tpu.native import PandaKinematics


@pytest.fixture(scope="module")
def kin():
    return PandaKinematics()


def test_grasp_pose_orientation():
    pose = grasp_flange_pose(
        np.asarray([0.5, 0.0, 0.1]), np.asarray([0.1, 0.1, 0.1]), side=4
    )
    # top grasp: approach straight down, flange above the object
    np.testing.assert_allclose(pose[:3, 2], [0, 0, -1], atol=1e-9)
    assert pose[2, 3] > 0.15
    r = pose[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-9)


def test_plan_pick_and_place_mostly_succeeds(kin):
    rng = np.random.default_rng(0)
    scene = sample_robot_scene(rng, min_num_objects=3, max_num_objects=4)
    results = plan_pick_and_place(scene, kin=kin, rng=rng)
    assert len(results) == scene.num_objects
    ok = [r for r in results if r.success]
    assert len(ok) >= max(1, scene.num_objects - 1), [
        (r.object_index, r.failure) for r in results
    ]
    for r in ok:
        # IK solutions actually reach their grasp poses
        assert r.path is not None and len(r.path) >= 2
        np.testing.assert_allclose(r.path[0], r.pick_q, atol=1e-9)
        np.testing.assert_allclose(r.path[-1], r.place_q, atol=1e-9)


def test_failure_reason_for_unreachable():
    kin = PandaKinematics()
    rng = np.random.default_rng(1)
    scene = sample_robot_scene(rng, min_num_objects=3, max_num_objects=3)
    # push the workspace far outside the Panda's reach
    tf = WorkspaceTransform(scale=0.15, offset=np.asarray([2.5, 0.0, 0.05]))
    results = plan_pick_and_place(scene, kin=kin, transform=tf, rng=rng)
    assert all(not r.success for r in results)
    assert all(r.failure in ("pick_q", "place_q") for r in results)
