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


# --------------------------------------------------------------------------- #
# rigid3d: gravity settle + contact queries
# --------------------------------------------------------------------------- #


def test_rigid3d_settle_and_contacts():
    import numpy as np

    from diffusion_ccsp_tpu.native import (
        check_robot_settle,
        contacts_3d,
        settle_boxes_3d,
    )

    centers = np.array(
        [[0, 0, 0.25], [0, 0, 0.75], [2, 2, 1.5], [0.5, 0, 1.2]], float
    )
    yaws = np.zeros(4)
    ext = np.array(
        [[1, 1, 0.5], [0.6, 0.6, 0.5], [0.4, 0.4, 0.4], [0.8, 0.8, 0.4]],
        float,
    )
    out, disp, topple = settle_boxes_3d(centers, yaws, ext)
    # floating box 2 drops to the floor
    assert abs(out[2, 2] - 0.2) < 1e-9
    assert disp > 1.0
    # overhanging box 3 (CoM at x=0.5 over box 1 spanning [-0.3, 0.3]) topples
    assert topple[3] and not topple[:3].any()
    assert (0, -1) in contacts_3d(out, yaws, ext)
    assert (1, 0) in contacts_3d(out, yaws, ext)
    # a clean stack settles in place
    assert check_robot_settle(centers[:2], yaws[:2], ext[:2])


def test_rigid3d_yawed_footprints():
    import numpy as np

    from diffusion_ccsp_tpu.native import settle_boxes_3d

    # a yawed box resting on a support: footprint overlap must use the
    # rotated rectangle
    centers = np.array([[0, 0, 0.25], [0.0, 0.0, 0.75]], float)
    yaws = np.array([0.0, np.pi / 4])
    ext = np.array([[1, 1, 0.5], [0.9, 0.2, 0.5]], float)
    out, disp, topple = settle_boxes_3d(centers, yaws, ext)
    assert disp < 1e-9 and not topple.any()


def test_rigid3d_cross_validates_stability_lp():
    """Project 2-D shelf scenes into the 3-D settle test and compare with the
    LP static-equilibrium oracle on ground-truth (stable) scenes."""
    import numpy as np

    from diffusion_ccsp_tpu.envs.stability import sample_stability_scene
    from diffusion_ccsp_tpu.native import settle_boxes_3d

    rng = np.random.default_rng(3)
    agree = 0
    n = 20
    for _ in range(n):
        sc = sample_stability_scene(rng, min_num_objects=4, max_num_objects=6)
        w, l = sc.world_dims
        # shelf (x, y-vertical) -> settle frame (x, depth, z-vertical)
        centers = np.stack(
            [
                sc.centers[:, 0],
                np.zeros(len(sc.centers)),
                sc.centers[:, 1] + l / 2,  # floor at z=0
            ],
            -1,
        )
        ext = np.stack(
            [sc.extents[:, 0], np.ones(len(sc.centers)), sc.extents[:, 1]], -1
        )
        _, disp, topple = settle_boxes_3d(
            centers, np.zeros(len(centers)), ext, floor_z=0.0
        )
        if disp < 0.03 and not topple.any():
            agree += 1
    # LP-stable scenes must virtually always pass the settle test (the
    # CoM-in-hull criterion is necessary-but-local; bridges are covered by
    # the union hull)
    assert agree >= n - 1, agree
