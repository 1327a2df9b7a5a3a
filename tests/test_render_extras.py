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
