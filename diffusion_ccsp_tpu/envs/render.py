"""World rendering: top-down scene images and denoising-history animations.

Capability parity: reference ``envs/render_utils.py`` (pyglet offscreen
top-down renders), ``envs/visualizers.py`` (world gifs), and
``networks/ddpm.py:845-904`` (denoising-history gif with a green/red
satisfaction progress bar). The reference needs trimesh+pyglet+OpenGL; here
rendering is matplotlib (headless-safe) — worlds are 2-D, so a top-down
orthographic render is just patch drawing.
"""

from __future__ import annotations

import io

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
from matplotlib.patches import Polygon as MplPolygon, Rectangle

from diffusion_ccsp_tpu.graphs import ConstraintGraph
from diffusion_ccsp_tpu.ops.geometry2d import WALL_T

# reference rainbow palette role: distinct tile colors (mesh_utils.py:16-59)
TILE_COLORS = [
    "#e6194b", "#3cb44b", "#ffe119", "#4363d8", "#f58231", "#911eb4",
    "#46f0f0", "#f032e6", "#bcf60c", "#fabebe", "#008080", "#e6beff",
]
GREEN = np.asarray([60, 179, 113])
RED = np.asarray([220, 20, 60])


def _tile_polygons_qualitative(graph: ConstraintGraph, pose: np.ndarray):
    """World-frame rectangles from qualitative features."""
    from diffusion_ccsp_tpu.ops.geometry2d import rect_corners
    import jax.numpy as jnp

    w, l = np.asarray(graph.world_dims)
    extents = np.asarray(graph.geom)[:, :2] * np.asarray([w, l])
    centers = pose[:, :2] * np.asarray([w / 2, l / 2])
    cs, sn = pose[:, 2], pose[:, 3]
    norm = np.maximum(np.sqrt(cs**2 + sn**2), 1e-9)
    yaw = np.arctan2(sn / norm, cs / norm)
    corners = np.asarray(
        rect_corners(jnp.asarray(centers), jnp.asarray(extents), jnp.asarray(yaw))
    )
    return corners


def _tile_polygons_triangles(graph: ConstraintGraph, pose: np.ndarray):
    from diffusion_ccsp_tpu.ops.geometry2d import triangle_vertices_from_features
    import jax.numpy as jnp

    return np.asarray(
        triangle_vertices_from_features(
            graph.geom, jnp.asarray(pose), graph.world_dims
        )
    )


def render_graph(
    graph: ConstraintGraph,
    pose: np.ndarray | None = None,
    input_mode: str = "qualitative",
    png_name: str | None = None,
    array: bool = False,
    title: str | None = None,
    figsize: float = 4.0,
):
    """Render one (unbatched) graph top-down. Returns an RGB array if
    ``array`` else None; optionally writes a png."""
    pose = np.asarray(graph.pose) if pose is None else np.asarray(pose)
    w, l = np.asarray(graph.world_dims)

    if "diffuse_pairwise" in input_mode:
        polys = _tile_polygons_triangles(graph, pose)
    elif "robot" in input_mode:
        # top-down footprint of the 3-D packing scene
        from diffusion_ccsp_tpu.ops.geometry3d import robot_scene_from_features
        from diffusion_ccsp_tpu.ops.geometry2d import rect_corners
        import jax.numpy as jnp

        centers, extents, yaw, _, _ = robot_scene_from_features(
            graph, jnp.asarray(pose)
        )
        polys = np.asarray(
            rect_corners(centers[:, :2], extents[:, :2], yaw)
        )
    else:
        polys = _tile_polygons_qualitative(graph, pose)

    fig, ax = plt.subplots(
        figsize=(figsize, figsize * (l + 2 * WALL_T) / (w + 2 * WALL_T))
    )
    # tray bottom + walls
    ax.add_patch(
        Rectangle((-w / 2, -l / 2), w, l, facecolor="#f2f2f2", edgecolor="none")
    )
    for (cx, cy), (ew, el) in [
        ((0, (l + WALL_T) / 2), (w, WALL_T)),
        ((0, -(l + WALL_T) / 2), (w, WALL_T)),
        ((-(w + WALL_T) / 2, 0), (WALL_T, l + 2 * WALL_T)),
        (((w + WALL_T) / 2, 0), (WALL_T, l + 2 * WALL_T)),
    ]:
        ax.add_patch(
            Rectangle(
                (cx - ew / 2, cy - el / 2), ew, el,
                facecolor="#c0c0c0", edgecolor="none",
            )
        )

    node_mask = np.asarray(graph.node_mask)
    cond_mask = np.asarray(graph.cond_mask)
    for i in range(polys.shape[0]):
        if not node_mask[i] or cond_mask[i]:
            continue
        color = TILE_COLORS[(i - 1) % len(TILE_COLORS)]
        ax.add_patch(
            MplPolygon(polys[i], closed=True, facecolor=color, alpha=0.85,
                       edgecolor="k", linewidth=0.5)
        )

    pad = WALL_T * 2
    ax.set_xlim(-w / 2 - pad, w / 2 + pad)
    ax.set_ylim(-l / 2 - pad, l / 2 + pad)
    ax.set_aspect("equal")
    ax.axis("off")
    if title:
        ax.set_title(title, fontsize=9)

    img = None
    if array or png_name is None:
        buf = io.BytesIO()
        fig.savefig(buf, format="png", dpi=80, bbox_inches="tight")
        buf.seek(0)
        import PIL.Image

        img = np.asarray(PIL.Image.open(buf).convert("RGB"))
    if png_name is not None:
        fig.savefig(png_name, dpi=80, bbox_inches="tight")
    plt.close(fig)
    return img


def render_denoising_gif(
    graph: ConstraintGraph,
    history: np.ndarray,
    satisfied_fn,
    gif_name: str,
    input_mode: str = "qualitative",
    n_frames: int = 50,
):
    """Animate the reverse chain for one graph with a green/red satisfaction
    progress bar (reference ``ddpm.py:845-904``).

    history: [T, N, P] pose features per step; satisfied_fn(graph, pose) ->
    bool.
    """
    import imageio

    steps = history.shape[0]
    n_frames = min(n_frames, steps)
    gap = max(int(steps / n_frames), 1)
    frames = []
    for s in range(steps):
        if s % gap != 0 and s != steps - 1:
            continue
        pose = np.clip(history[s], -1.0, 1.0)
        img = render_graph(graph, pose, input_mode=input_mode, array=True)
        ok = bool(satisfied_fn(graph, pose))
        h, w, _ = img.shape
        bar = np.full((12, w, 3), 255, np.uint8)
        fill = int(w * (s + 1) / steps)
        bar[:, :fill] = GREEN if ok else RED
        frames.append(np.concatenate([img, bar], axis=0))
    imageio.mimsave(gif_name, frames)
    return gif_name


def save_collage(
    images: list[np.ndarray],
    png_name: str,
    cols: int | None = None,
    titles: list[str] | None = None,
):
    """Tile RGB arrays into one dataset-monitor collage png (reference
    ``envs/robot_data_monitor.py:68-236`` builds the same grids from
    per-scene render pngs)."""
    n = len(images)
    if n == 0:
        raise ValueError("no images")
    cols = cols or int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    fig, axes = plt.subplots(
        rows, cols, figsize=(2.2 * cols, 2.2 * rows), squeeze=False
    )
    for k in range(rows * cols):
        ax = axes[k // cols][k % cols]
        ax.axis("off")
        if k < n:
            ax.imshow(images[k])
            if titles and k < len(titles):
                ax.set_title(titles[k], fontsize=7)
    fig.tight_layout(pad=0.3)
    fig.savefig(png_name, dpi=90)
    plt.close(fig)
    return png_name


def render_orbit_gif(
    world,
    gif_name: str,
    frames: int = 36,
    elev: float = 28.0,
    figsize: float = 4.0,
):
    """Orbiting-camera gif of a ``simulation.World3D`` scene (reference
    ``envs/visualizers.py:12-104`` orbiting renderer). Boxes are drawn as
    shaded 3-D polygon collections; the camera azimuth sweeps 360 degrees."""
    import imageio
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    from diffusion_ccsp_tpu.envs.mesh_io import box_mesh

    polys_per_body = []
    lim = 0.5
    for i, body in enumerate(world.bodies):
        v, f = box_mesh(body.extents, body.state.position, body.state.yaw)
        color = ("#c0c0c0" if body.static
                 else TILE_COLORS[i % len(TILE_COLORS)])
        polys_per_body.append((v[f], color))
        lim = max(lim, float(np.abs(v).max()))

    imgs = []
    for k in range(frames):
        fig = plt.figure(figsize=(figsize, figsize))
        ax = fig.add_subplot(projection="3d")
        for tris, color in polys_per_body:
            ax.add_collection3d(
                Poly3DCollection(
                    tris, facecolor=color, edgecolor="k",
                    linewidths=0.2, alpha=0.95,
                )
            )
        ax.set_xlim(-lim, lim); ax.set_ylim(-lim, lim); ax.set_zlim(0, lim)
        ax.set_box_aspect((1, 1, 0.5))
        ax.view_init(elev=elev, azim=360.0 * k / frames)
        ax.axis("off")
        buf = io.BytesIO()
        fig.savefig(buf, format="png", dpi=70, bbox_inches="tight")
        buf.seek(0)
        import PIL.Image

        imgs.append(np.asarray(PIL.Image.open(buf).convert("RGB")))
        plt.close(fig)
    # pad to a common shape (bbox_inches can vary by a pixel across frames)
    h = min(i.shape[0] for i in imgs); w = min(i.shape[1] for i in imgs)
    imageio.mimsave(gif_name, [i[:h, :w] for i in imgs])
    return gif_name


class ExecutionRecorder:
    """Record body poses + arm skeleton during an execution and replay the
    run as a 3-D gif (reference ``demo_utils.py:79-97`` VideoSaver mp4
    logging and the trajectory gif outputs at ``:447-461``).

    Registers itself as a ``World3D.step_hooks`` callback, so any kinematic
    trajectory following (``PandaRobot.move_qpos_trajectory``,
    ``UR5Robot.move_qpos``) is captured automatically.
    """

    def __init__(self, world, robot=None, every: int = 2):
        self.world, self.robot, self.every = world, robot, max(every, 1)
        self._count = 0
        self.frames: list = []
        world.step_hooks.append(self._hook)
        self.snapshot()

    def _skeleton(self):
        if self.robot is None:
            return None
        q = self.robot.get_qpos()
        kin = getattr(self.robot, "kin", None)
        if kin is not None and hasattr(kin, "fk_points"):
            return np.asarray(kin.fk_points(q))
        arm = getattr(self.robot, "arm", None)
        if arm is not None:
            # fk_frames already includes the base frame first
            return np.stack([f[:3, 3] for f in arm.fk_frames(q)])
        return None

    def _hook(self, world):
        self._count += 1
        if (self._count - 1) % self.every == 0:
            self.snapshot()

    def snapshot(self):
        bodies = [
            (b.extents.copy(), b.state.position.copy(), b.state.yaw,
             b.static, b.body_id)
            for b in self.world.bodies
        ]
        self.frames.append((bodies, self._skeleton()))

    def close(self):
        if self._hook in self.world.step_hooks:
            self.world.step_hooks.remove(self._hook)

    def save_gif(self, gif_name: str, elev: float = 25.0, azim: float = 40.0,
                 figsize: float = 4.0) -> str:
        import imageio
        from mpl_toolkits.mplot3d.art3d import Poly3DCollection

        from diffusion_ccsp_tpu.envs.mesh_io import box_mesh

        # fixed camera box over the whole run (corner bound per body)
        lim = 0.6
        for bodies, skel in self.frames:
            for ext, pos, _, _, _ in bodies:
                lim = max(lim, float((np.abs(pos) + np.abs(ext) / 2).max()))
            if skel is not None:
                lim = max(lim, float(np.abs(skel).max()))

        imgs = []
        for bodies, skel in self.frames:
            fig = plt.figure(figsize=(figsize, figsize))
            ax = fig.add_subplot(projection="3d")
            for ext, pos, yaw, static, bid in bodies:
                v, f = box_mesh(ext, pos, yaw)
                color = "#c0c0c0" if static else TILE_COLORS[bid % len(TILE_COLORS)]
                ax.add_collection3d(
                    Poly3DCollection(v[f], facecolor=color, edgecolor="k",
                                     linewidths=0.2, alpha=0.9)
                )
            if skel is not None:
                ax.plot(skel[:, 0], skel[:, 1], skel[:, 2], "-o",
                        color="#222222", markersize=3, linewidth=2.5)
                ax.scatter(*skel[-1], color="#d62728", s=40)  # tool point
            ax.set_xlim(-lim, lim); ax.set_ylim(-lim, lim); ax.set_zlim(0, lim)
            ax.set_box_aspect((1, 1, 0.5))
            ax.view_init(elev=elev, azim=azim)
            ax.axis("off")
            buf = io.BytesIO()
            fig.savefig(buf, format="png", dpi=70, bbox_inches="tight")
            buf.seek(0)
            import PIL.Image

            imgs.append(np.asarray(PIL.Image.open(buf).convert("RGB")))
            plt.close(fig)
        h = min(i.shape[0] for i in imgs); w = min(i.shape[1] for i in imgs)
        imageio.mimsave(gif_name, [i[:h, :w] for i in imgs])
        return gif_name
