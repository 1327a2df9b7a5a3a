"""OBJ mesh building/export (reference worlds.py:1169-1184, mesh_utils.py)."""

import numpy as np
import pytest

from diffusion_ccsp_tpu.envs.mesh_io import (
    box_mesh,
    extrude_polygon,
    load_obj,
    save_obj,
    triangle_scene_to_obj,
    world3d_to_obj,
)


def signed_volume(verts, faces):
    v = np.asarray(verts)[np.asarray(faces)]
    return float(np.einsum("fi,fi->", np.cross(v[:, 0], v[:, 1]), v[:, 2]) / 6.0)


def edge_multiset(faces):
    edges = {}
    for a, b, c in faces:
        for u, vtx in ((a, b), (b, c), (c, a)):
            edges[(u, vtx)] = edges.get((u, vtx), 0) + 1
    return edges


def assert_watertight(faces):
    """Closed orientable mesh: every directed edge is matched by its reverse."""
    edges = edge_multiset(faces)
    for (u, v), n in edges.items():
        assert n == 1, f"duplicate directed edge {(u, v)}"
        assert edges.get((v, u), 0) == 1, f"unmatched edge {(u, v)}"


def test_extrude_triangle_volume_and_closure():
    tri = np.array([[0.0, 0.0], [2.0, 0.0], [0.0, 1.0]])
    verts, faces = extrude_polygon(tri, height=0.5)
    assert_watertight(faces)
    assert signed_volume(verts, faces) == pytest.approx(1.0 * 0.5)  # area=1


def test_extrude_cw_input_is_reoriented():
    tri_cw = np.array([[0.0, 0.0], [0.0, 1.0], [2.0, 0.0]])
    verts, faces = extrude_polygon(tri_cw, height=0.5)
    assert signed_volume(verts, faces) == pytest.approx(0.5)


def test_box_mesh_volume_any_yaw():
    verts, faces = box_mesh([0.4, 0.3, 0.2], center=[1, 2, 3], yaw=0.7)
    assert_watertight(faces)
    assert signed_volume(verts, faces) == pytest.approx(0.4 * 0.3 * 0.2)
    assert np.allclose(verts.mean(axis=0), [1, 2, 3])


def test_obj_round_trip(tmp_path):
    verts, faces = box_mesh([1, 1, 1])
    p = str(tmp_path / "box.obj")
    save_obj(p, verts, faces, groups=[("box", 0)])
    v2, f2 = load_obj(p)
    assert np.allclose(v2, verts, atol=1e-5)
    assert signed_volume(v2, f2) == pytest.approx(1.0)


def test_triangle_scene_export(tmp_path):
    from diffusion_ccsp_tpu.envs.triangles import sample_triangle_scene

    scene = sample_triangle_scene(
        np.random.default_rng(0), min_num_objects=3, max_num_objects=3
    )
    p = str(tmp_path / "scene.obj")
    triangle_scene_to_obj(scene, p)
    text = open(p).read()
    for i in range(3):
        assert f"g tile_{i}" in text
    assert "g tray_floor" in text
    v, f = load_obj(p)
    # 5 tray boxes (8 verts each) + 3 prisms (6 verts each)
    assert len(v) == 5 * 8 + 3 * 6


def test_world3d_export(tmp_path):
    from diffusion_ccsp_tpu.simulation import World3D

    world = World3D()
    world.add_box("a", [0.2, 0.2, 0.2], [0, 0, 0.1])
    world.add_box("b", [0.2, 0.2, 0.2], [0, 0, 0.3], yaw=0.4)
    p = str(tmp_path / "world.obj")
    world3d_to_obj(world, p)
    v, f = load_obj(p)
    assert len(v) == 16 and len(f) == 24
    assert signed_volume(v, f) == pytest.approx(2 * 0.2**3)
