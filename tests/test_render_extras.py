"""Collage monitor + orbiting-camera gif (reference robot_data_monitor.py,
visualizers.py:12-104)."""

import numpy as np

from diffusion_ccsp_tpu.envs.render import render_orbit_gif, save_collage


def test_save_collage(tmp_path):
    imgs = [np.full((32, 32, 3), c, np.uint8) for c in (10, 120, 240)]
    p = str(tmp_path / "collage.png")
    save_collage(imgs, p, titles=["a", "b", "c"])
    import PIL.Image

    im = PIL.Image.open(p)
    assert im.size[0] > 64 and im.size[1] > 32  # 2x2 grid of 3 tiles


def test_orbit_gif(tmp_path):
    from diffusion_ccsp_tpu.simulation import World3D

    world = World3D()
    world.add_box("floor", [1, 1, 0.1], [0, 0, -0.05], static=True)
    world.add_box("a", [0.2, 0.2, 0.2], [0.1, 0.0, 0.1], yaw=0.3)
    p = str(tmp_path / "orbit.gif")
    render_orbit_gif(world, p, frames=4)
    import PIL.Image

    im = PIL.Image.open(p)
    assert getattr(im, "n_frames", 1) == 4


def test_collect_data_collage_cli(tmp_path):
    import collect_data

    args = collect_data.get_args(
        ["--input_mode", "qualitative", "--num", "6", "--collage", "4",
         "--data_dir", str(tmp_path)]
    )
    collect_data.collect(args)
    assert (tmp_path / "qualitative_collage.png").exists()


def test_execution_recorder_pick_and_place(tmp_path):
    """UR5 suction pick-and-place captured through the step hook and
    replayed as a gif (reference VideoSaver role, demo_utils.py:79-97)."""
    import numpy as np

    from diffusion_ccsp_tpu.envs.render import ExecutionRecorder
    from diffusion_ccsp_tpu.simulation import UR5Robot, World3D

    world = World3D()
    world.add_box("floor", [2.0, 2.0, 0.1], [0, 0, -0.05], static=True)
    box = world.add_box("box", [0.08, 0.08, 0.08], [0.45, 0.1, 0.04])
    robot = UR5Robot(world)
    rec = ExecutionRecorder(world, robot, every=5)

    start_pos = world.get_body_state(box).position.copy()
    # hover above the box, grab it, carry it elsewhere, release
    def hover(p):
        t = np.eye(4)
        t[:3, :3] = np.diag([1.0, -1.0, -1.0])  # tool pointing down
        t[:3, 3] = p
        return t

    q1 = robot.ik(hover([0.45, 0.1, 0.13]))
    assert q1 is not None
    assert robot.move_qpos(q1, steps=20)
    assert robot.activate_gripper(box)
    q2 = robot.ik(hover([0.2, -0.3, 0.2]), seed=q1)
    assert q2 is not None
    assert robot.move_qpos(q2, steps=20)
    robot.release_gripper()
    world.step(settle=True)
    rec.close()

    end_pos = world.get_body_state(box).position
    assert np.linalg.norm(end_pos[:2] - start_pos[:2]) > 0.2  # it moved
    assert len(rec.frames) >= 5
    p = str(tmp_path / "exec.gif")
    rec.save_gif(p)
    import PIL.Image

    # gif encoders may merge identical consecutive frames
    assert PIL.Image.open(p).n_frames >= len(rec.frames) - 2


def test_execution_recorder_panda_skeleton():
    """Panda skeleton comes from native fk_points through the recorder."""
    from diffusion_ccsp_tpu.envs.render import ExecutionRecorder
    from diffusion_ccsp_tpu.simulation import PandaRobot, World3D

    world = World3D()
    robot = PandaRobot(world)
    rec = ExecutionRecorder(world, robot, every=1)
    skel = rec.frames[0][1]
    rec.close()
    assert skel is not None and skel.shape[1] == 3 and len(skel) >= 7
