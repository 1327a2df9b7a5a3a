"""Native 2-D rigid-body dynamics: canonical stability cases and agreement
with the static-equilibrium LP oracle on generated stacking scenes."""

import numpy as np
import pytest

from diffusion_ccsp_tpu.envs.stability import (
    check_static_equilibrium,
    sample_stability_scene,
)
from diffusion_ccsp_tpu.native import check_stable_dynamics, simulate_boxes_2d


def test_tower_stable():
    centers = np.asarray([[0.0, 0.25], [0.0, 0.75]])
    extents = np.asarray([[1.0, 0.5], [0.5, 0.5]])
    assert check_stable_dynamics(centers, extents, floor_y=0.0)


def test_overhang_falls():
    centers = np.asarray([[0.0, 0.25], [0.9, 0.75]])
    extents = np.asarray([[1.0, 0.5], [0.5, 0.5]])
    assert not check_stable_dynamics(centers, extents, floor_y=0.0)


def test_bridge_stable():
    c = np.asarray([[-0.6, 0.25], [0.6, 0.25], [0.0, 0.75]])
    e = np.asarray([[0.4, 0.5], [0.4, 0.5], [1.6, 0.5]])
    assert check_stable_dynamics(c, e, floor_y=0.0)


def test_floating_box_falls_to_floor():
    c = np.asarray([[0.0, 2.0]])
    e = np.asarray([[0.5, 0.5]])
    states, disp = simulate_boxes_2d(c, np.zeros(1), e, floor_y=0.0)
    assert disp > 1.0
    # settles on the floor: center ~ half-height
    assert abs(states[0, 1] - 0.25) < 0.05


def test_agrees_with_lp_oracle_on_sampled_scenes():
    """Scenes accepted by the LP static oracle must also survive dynamics
    (LP is exact for the frictionless model; friction only helps)."""
    rng = np.random.default_rng(0)
    agree = 0
    total = 0
    for _ in range(8):
        scene = sample_stability_scene(rng)
        floor = -scene.world_dims[1] / 2
        assert check_static_equilibrium(
            scene.centers, scene.extents, scene.supports, floor
        )
        total += 1
        agree += check_stable_dynamics(
            scene.centers, scene.extents, floor_y=floor, tol=0.05
        )
    # tolerate minor solver jitter on marginal scenes
    assert agree >= total - 1, (agree, total)
