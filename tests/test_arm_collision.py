"""Capsule arm-collision model: obstacle detection and planning integration."""

import numpy as np
import pytest

from diffusion_ccsp_tpu.manipulation import (
    PANDA_HOME,
    make_arm_collision_fn,
)
from diffusion_ccsp_tpu.native import PandaKinematics


@pytest.fixture(scope="module")
def kin():
    return PandaKinematics()


def test_free_space_not_colliding(kin):
    fn = make_arm_collision_fn(
        kin, np.asarray([[2.0, 2.0, 0.5]]), np.asarray([[0.2, 0.2, 0.2]])
    )
    assert not fn(PANDA_HOME)


def test_obstacle_at_elbow_detected(kin):
    # place a box right where the ready-pose elbow is (~(-0.2, 0, 0.56))
    fn = make_arm_collision_fn(
        kin, np.asarray([[-0.2, 0.0, 0.56]]), np.asarray([[0.2, 0.2, 0.2]])
    )
    assert fn(PANDA_HOME)


def test_below_floor_detected(kin):
    fn = make_arm_collision_fn(
        kin, np.zeros((0, 3)), np.zeros((0, 3)), floor_z=0.9
    )
    # ready pose keeps distal links around z ~ 0.6-0.7 < 0.9 floor
    assert fn(PANDA_HOME)


def test_planning_with_arm_collisions(kin):
    from diffusion_ccsp_tpu.envs.robot import sample_robot_scene
    from diffusion_ccsp_tpu.manipulation import plan_pick_and_place

    rng = np.random.default_rng(0)
    scene = sample_robot_scene(rng, min_num_objects=3, max_num_objects=3)
    results = plan_pick_and_place(
        scene, kin=kin, rng=rng, check_arm_collisions=True
    )
    assert len(results) == scene.num_objects
    for r in results:
        if r.success:
            assert r.path is not None
