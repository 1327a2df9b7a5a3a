"""RGB-D camera + point-cloud capture (reference pybullet_engine/camera.py
take_picture/deprojection and BulletWorld point clouds, world.py:736-790)."""

import numpy as np

from diffusion_ccsp_tpu.envs.camera import (
    Camera,
    depth_to_point_cloud,
    render_rgbd,
)
from diffusion_ccsp_tpu.simulation import World3D


def _world_one_box():
    world = World3D()
    world.add_box("cube", extents=(1.0, 1.0, 1.0), position=(0, 0, 0.5),
                  color=(0.9, 0.2, 0.2))
    return world


def test_depth_at_center_matches_geometry():
    world = _world_one_box()
    cam = Camera(eye=np.asarray([0.0, 0.0, 5.0]),
                 target=np.asarray([0.0, 0.0, 0.0]),
                 up=np.asarray([0.0, 1.0, 0.0]), width=96, height=96)
    rgb, depth = render_rgbd(world, cam)
    # looking straight down from z=5 at a box whose top face is at z=1
    center = depth[48, 48]
    assert abs(center - 4.0) < 0.02
    assert rgb[48, 48].sum() > 0  # shaded red
    # background stays at inf
    assert np.isinf(depth[0, 0])


def test_point_cloud_deprojects_to_box_surface():
    world = _world_one_box()
    cam = Camera(eye=np.asarray([3.0, 2.0, 3.0]),
                 target=np.asarray([0.0, 0.0, 0.5]), width=128, height=96)
    rgb, depth = render_rgbd(world, cam)
    pts, cols = depth_to_point_cloud(depth, cam, rgb=rgb)
    assert len(pts) > 100 and len(pts) == len(cols)
    # every deprojected point lies on the box surface (within a pixel's error)
    d = np.max(np.abs(pts) - np.asarray([0.5, 0.5, 0.0]), axis=-1)
    on_surface = (np.abs(pts[:, 2] - 1.0) < 0.05) | (
        np.max(np.abs(pts[:, :2]), axis=-1) > 0.45
    )
    assert on_surface.mean() > 0.97
    assert (pts[:, 2] > -0.05).all() and (pts[:, 2] < 1.05).all()


def test_point_cloud_subsampling_and_world_api():
    world = _world_one_box()
    world.add_box("slab", extents=(2.0, 0.5, 0.2), position=(0.0, 1.2, 0.1),
                  color=(0.2, 0.4, 0.9))
    cam = Camera(eye=np.asarray([0.0, -3.0, 2.5]),
                 target=np.asarray([0.0, 0.0, 0.3]))
    rgb, depth = world.render_camera(cam)
    assert rgb.shape == (cam.height, cam.width, 3)
    pts, cols = world.get_point_cloud(cam, max_points=500)
    assert len(pts) == 500
    # both bodies visible: red-ish and blue-ish colors present
    assert (cols[:, 0] > cols[:, 2]).any() and (cols[:, 2] > cols[:, 0]).any()


def test_rotated_box_occludes_floor_box():
    """Yaw rotation reaches the rasterizer; nearer surfaces win the z-test."""
    world = World3D()
    world.add_box("back", extents=(2.0, 2.0, 0.2), position=(0, 0, 0.1))
    world.add_box("front", extents=(0.8, 0.4, 0.8),
                  position=(0.0, 0.0, 0.9), yaw=np.pi / 4,
                  color=(0.1, 0.8, 0.1))
    cam = Camera(eye=np.asarray([0.0, 0.0, 4.0]),
                 target=np.asarray([0.0, 0.0, 0.0]),
                 up=np.asarray([0.0, 1.0, 0.0]), width=96, height=96)
    rgb, depth = render_rgbd(world, cam)
    assert abs(depth[48, 48] - (4.0 - 1.3)) < 0.05  # front box top face
