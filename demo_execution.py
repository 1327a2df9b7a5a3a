"""Pick-and-place execution demo: plan a full packing with the native
IK/RRT stack, execute it kinematically in the simulation layer, and save a
replay gif — the reference's trajectory-replay demo surface
(``demo_utils.py:179-498`` pick-and-place execution with VideoSaver mp4 /
gif outputs at :79-97, :447-461).

Usage: python demo_execution.py [--objects 3] [--out results/demo_execution.gif]
"""

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--objects", type=int, default=3)
    p.add_argument("--seed", type=int, default=4)
    p.add_argument("--out", default="results/demo_execution.gif")
    p.add_argument("--every", type=int, default=4,
                   help="record every k-th kinematic step")
    args = p.parse_args()

    from diffusion_ccsp_tpu.envs.render import ExecutionRecorder
    from diffusion_ccsp_tpu.envs.robot import sample_robot_scene
    from diffusion_ccsp_tpu.manipulation import (
        WorkspaceTransform,
        plan_pick_and_place,
    )
    from diffusion_ccsp_tpu.simulation import PandaRobot, World3D

    rng = np.random.default_rng(args.seed)
    scene = sample_robot_scene(
        rng, min_num_objects=args.objects, max_num_objects=args.objects
    )
    tf = WorkspaceTransform()
    plans = plan_pick_and_place(scene, transform=tf, rng=rng)
    n_ok = sum(r.success for r in plans)
    print(f"planned {n_ok}/{scene.num_objects} placements")

    # world: table + container floor outline; objects start at the staging
    # area and get carried to their goal poses
    world = World3D()
    world.add_box("table", [0.9, 1.1, 0.04], [0.45, 0.0, 0.03], static=True)
    robot = PandaRobot(world)
    rec = ExecutionRecorder(world, robot, every=args.every)

    pick_offset = np.asarray([0.45, -0.35, 0.05])
    executed = 0
    for r in plans:
        if not r.success:
            continue
        i = r.object_index
        ext = tf.extent(scene.extents[i])
        start = np.asarray(
            [pick_offset[0], pick_offset[1], 0.05 + ext[2] / 2]
        )
        bid = world.add_box(f"obj_{i}", ext, start)
        # move to pick, grab, follow the planned joint path, release
        robot.move_qpos_trajectory([robot.get_qpos(), r.pick_q], spline=False)
        robot.activate_gripper(bid)
        path = r.path or [r.pick_q, r.place_q]
        robot.move_qpos_trajectory(path, spline=len(path) > 2)
        robot.release_gripper()
        # objects rest at their planned goal pose; pin exactly (kinematic
        # demo — the settle test is the oracle's job, eval/oracles.py)
        goal = tf.point(scene.centers[i])
        st = world.get_body_state(bid)
        st.position = goal
        world.set_body_state(bid, st)
        rec.snapshot()
        executed += 1

    rec.close()
    rec.save_gif(args.out)
    print(f"executed {executed} placements, "
          f"{len(rec.frames)} frames -> {args.out}")


if __name__ == "__main__":
    main()
