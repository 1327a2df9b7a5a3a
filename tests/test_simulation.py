"""Simulation layer (L1): World3D registry/state/savers/contacts/settling,
UR5 + Panda robots, suction attachment (reference pybullet_engine/world.py,
models/ur5/ur5_robot.py, models/panda/panda_robot.py)."""

import numpy as np

from diffusion_ccsp_tpu.simulation import (
    BodyStateSaver,
    PandaRobot,
    UR5Robot,
    World3D,
    WorldSaver,
)


def make_stack_world():
    w = World3D()
    w.add_box("base", (1.0, 1.0, 0.5), (0, 0, 0.25))
    w.add_box("top", (0.5, 0.5, 0.4), (0, 0, 0.7))
    return w


def test_world_registry_and_state():
    w = make_stack_world()
    assert w.body_name(w.body_id("top")) == "top"
    s = w.get_body_state_by_name("top")
    assert np.allclose(s.position, [0, 0, 0.7])
    s.position = np.asarray([0.1, 0.0, 0.7])
    w.set_body_state(w.body_id("top"), s)
    assert np.allclose(w.get_body_state_by_name("top").position[0], 0.1)
    # 7d pose API parity
    assert w.get_body_state_by_name("top").get_7dpose().shape == (7,)


def test_world_step_settles_and_contacts():
    w = make_stack_world()
    w.add_box("floater", (0.3, 0.3, 0.3), (2.0, 2.0, 1.5))
    disp = w.step()
    assert disp > 1.0  # the floater dropped
    assert abs(w.get_body_state_by_name("floater").position[2] - 0.15) < 1e-9
    names = {
        (c.a_name(w), c.b_name(w)) for c in w.get_contacts()
    }
    assert ("base", "floor") in names
    assert ("top", "base") in names
    assert w.is_stable()


def test_savers_roundtrip():
    w = make_stack_world()
    bid = w.body_id("top")
    with BodyStateSaver(w, bid):
        st = w.get_body_state(bid)
        st.position = np.asarray([5.0, 5.0, 5.0])
        w.set_body_state(bid, st)
    assert np.allclose(w.get_body_state(bid).position, [0, 0, 0.7])

    with WorldSaver(w):
        for b in w.bodies:
            st = b.state
            st.position = st.position + 1.0
    assert np.allclose(w.get_body_state_by_name("base").position, [0, 0, 0.25])


def test_ur5_fk_ik_roundtrip():
    r = UR5Robot()
    q = r.get_home_qpos() + 0.2
    target = r.fk(q)
    sol = r.arm.ik(target, seed=q + 0.05)
    assert sol is not None
    assert np.abs(r.fk(sol) - target).max() < 1e-4
    sols = r.gen_ik(target)
    assert len(sols) >= 1


def test_ur5_suction_pick():
    w = World3D()
    w.add_box("obj", (0.1, 0.1, 0.1), (0.4, 0.1, 0.05))
    r = UR5Robot(world=w)
    # reach above the object, approach from +z
    target = np.eye(4)
    target[:3, 3] = [0.4, 0.1, 0.12]
    target[:3, :3] = np.asarray([[1, 0, 0], [0, -1, 0], [0, 0, -1]])
    q = r.ik(target)
    assert q is not None
    assert r.move_qpos(q)
    assert r.activate_gripper()
    # move up: the attached object must follow the flange
    target2 = target.copy()
    target2[2, 3] = 0.4
    q2 = r.ik(target2)
    assert q2 is not None
    r.move_qpos(q2)
    w.step()
    assert w.get_body_state_by_name("obj").position[2] > 0.2
    r.release_gripper()
    w.step()
    # released: the object falls back to the floor
    assert abs(w.get_body_state_by_name("obj").position[2] - 0.05) < 1e-6


def test_panda_robot_trajectory():
    w = World3D()
    r = PandaRobot(world=w)
    q0 = r.get_qpos()
    q1 = q0 + 0.2
    assert r.move_qpos_trajectory([q0, q1])
    assert np.allclose(r.get_qpos(), q1)
    # fk/ik parity with the native layer
    target = r.fk(q1)
    sols = r.gen_ik(target)
    assert any(np.abs(r.fk(s) - target).max() < 1e-4 for s in sols)


def test_render_topdown(tmp_path):
    w = make_stack_world()
    p = w.render_topdown(str(tmp_path / "scene.png"))
    import os

    assert os.path.getsize(p) > 0
