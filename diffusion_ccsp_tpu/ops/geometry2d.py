"""On-device 2-D geometry: rotated-rectangle / convex-polygon collision (SAT)
and the qualitative constraint predicates — all JAX, all static shapes.

Capability parity:
- collision checking replaces the host-side FCL loop of reference
  ``envs/collisions.py:58-130`` (boxes and triangle prisms reduce to 2-D
  convex overlap under a pure yaw rotation);
- qualitative predicates mirror the extraction thresholds of reference
  ``envs/data_utils.py:427-621`` (alignment .05, touching .1, closeness .3,
  farness .5, overlap .6 — all × scale);
- containment mirrors the reference's tray walls: a tile is "in" iff it
  overlaps none of the 4 wall boxes (``envs/mesh_utils.py:174-193``,
  wall thickness t=0.1, ``envs/worlds.py:391-398``).

Everything is written per-graph with static [N] / [E] shapes and vmapped over
the problem batch, so the sample → check → select loop never leaves the
device (the reference re-builds a trimesh world per sample per try,
``ddpm.py:633-713``).

The reference extraction treats rotated boxes as axis-aligned unless the yaw
is within 0.1 rad of ±pi/2, in which case width/length swap
(``data_utils.py:457-460``); predicates below reproduce that, while the
*collision* test uses the true rotated footprint (as FCL does).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

# thresholds from reference envs/data_utils.py:444-448
ALIGNMENT = 0.05
TOUCHING = 0.1
CLOSENESS = 0.3
FARNESS = 0.5
OVERLAP_FRAC = 0.6
SIDE_EPS = 0.05  # the -0.05 slack on side gaps (data_utils.py:533,540,...)
WALL_T = 0.1  # tray wall thickness (mesh_utils.py:174)

# indices must match QUALITATIVE_CONSTRAINTS in constraints.py
_QUAL_IN = 0
_QUAL_CENTER_IN = 1
_QUAL_LEFT_IN = 2
_QUAL_RIGHT_IN = 3
_QUAL_TOP_IN = 4
_QUAL_BOTTOM_IN = 5
_QUAL_CFREE = 6
_QUAL_LEFT_OF = 7
_QUAL_TOP_OF = 8
_QUAL_CLOSE_TO = 9
_QUAL_AWAY_FROM = 10
_QUAL_H_ALIGNED = 11
_QUAL_V_ALIGNED = 12


def rect_corners(center: jnp.ndarray, extents: jnp.ndarray, yaw: jnp.ndarray) -> jnp.ndarray:
    """Corners of rotated rectangles.

    center [..., 2], extents [..., 2] (full w, l), yaw [...] -> [..., 4, 2].
    """
    hw = extents[..., 0] / 2
    hl = extents[..., 1] / 2
    local = jnp.stack(
        [
            jnp.stack([hw, hl], -1),
            jnp.stack([-hw, hl], -1),
            jnp.stack([-hw, -hl], -1),
            jnp.stack([hw, -hl], -1),
        ],
        axis=-2,
    )  # [..., 4, 2]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    rot = jnp.stack(
        [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], axis=-2
    )  # [..., 2, 2]
    return center[..., None, :] + jnp.einsum("...ij,...vj->...vi", rot, local)


def convex_overlap(poly1: jnp.ndarray, poly2: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Separating-axis test between two convex polygons.

    poly1 [..., V1, 2], poly2 [..., V2, 2] -> bool[...]: True if the interiors
    overlap by more than ``eps``. Degenerate (repeated-vertex) edges produce
    zero-length axes; those are excluded from the separation test (a zero
    axis carries no separating information), so padded polygons are safe.
    """

    def axes_of(poly):
        edges = jnp.roll(poly, -1, axis=-2) - poly  # [..., V, 2]
        normals = jnp.stack([-edges[..., 1], edges[..., 0]], axis=-1)
        norm = jnp.linalg.norm(normals, axis=-1, keepdims=True)
        return normals / jnp.maximum(norm, 1e-12), norm[..., 0] > 1e-9

    a1, v1 = axes_of(poly1)
    a2, v2 = axes_of(poly2)
    axes = jnp.concatenate([a1, a2], axis=-2)  # [..., A, 2]
    valid = jnp.concatenate([v1, v2], axis=-1)  # [..., A]

    def project(poly, axes):
        d = jnp.einsum("...ac,...nc->...an", axes, poly)  # [..., A, V]
        return d.min(axis=-1), d.max(axis=-1)

    lo1, hi1 = project(poly1, axes)
    lo2, hi2 = project(poly2, axes)
    overlap = jnp.minimum(hi1, hi2) - jnp.maximum(lo1, lo2)  # [..., A]
    separated = (overlap <= eps) & valid
    return ~separated.any(axis=-1)


def tray_wall_rects(world_dims: jnp.ndarray, t: float = WALL_T) -> jnp.ndarray:
    """Centers+extents of the 4 tray walls (reference ``mesh_utils.py:180-186``).

    world_dims [..., 2] -> ([..., 4, 2] centers, [..., 4, 2] extents).
    """
    w = world_dims[..., 0]
    l = world_dims[..., 1]
    zero = jnp.zeros_like(w)
    tt = jnp.full_like(w, t)
    centers = jnp.stack(
        [
            jnp.stack([zero, (l + t) / 2], -1),  # north
            jnp.stack([zero, -(l + t) / 2], -1),  # south
            jnp.stack([-(w + t) / 2, zero], -1),  # west
            jnp.stack([(w + t) / 2, zero], -1),  # east
        ],
        axis=-2,
    )
    extents = jnp.stack(
        [
            jnp.stack([w, tt], -1),
            jnp.stack([w, tt], -1),
            jnp.stack([tt, l + 2 * t], -1),
            jnp.stack([tt, l + 2 * t], -1),
        ],
        axis=-2,
    )
    return centers, extents


def effective_aabb(extents: jnp.ndarray, yaw: jnp.ndarray) -> jnp.ndarray:
    """Reference predicate geometry: swap w/l when |yaw| is within 0.1 of
    pi/2 modulo axis flips, else keep axis-aligned extents
    (``data_utils.py:457-460`` — |abs(yaw) - pi/2| < 0.1)."""
    swap = jnp.abs(jnp.abs(yaw) - jnp.pi / 2) < 0.1
    w, l = extents[..., 0], extents[..., 1]
    we = jnp.where(swap, l, w)
    le = jnp.where(swap, w, l)
    return jnp.stack([we, le], axis=-1)


def polygons_collide(
    corners: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    """Pairwise collision matrix for N convex polygons.

    corners [N, V, 2], mask [N] -> bool[N, N] (diagonal False).
    """
    n = corners.shape[0]
    v = corners.shape[1]
    p1 = jnp.repeat(corners[:, None], n, 1).reshape(n * n, v, 2)
    p2 = jnp.repeat(corners[None, :], n, 0).reshape(n * n, v, 2)
    hit = convex_overlap(p1, p2, eps).reshape(n, n)
    pair_mask = mask[:, None] & mask[None, :]
    return hit & pair_mask & ~jnp.eye(n, dtype=bool)


def polygons_hit_walls(
    corners: jnp.ndarray,
    mask: jnp.ndarray,
    world_dims: jnp.ndarray,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """[N] True where a polygon is not contained in the tray: it overlaps a
    wall band OR has a vertex beyond the tray rectangle (a convex shape with
    all vertices inside is fully inside; the vertex test catches shapes
    entirely beyond the thin wall band)."""
    outside = (
        (jnp.abs(corners[..., 0]) > world_dims[0] / 2 + eps)
        | (jnp.abs(corners[..., 1]) > world_dims[1] / 2 + eps)
    ).any(axis=-1)
    wc, we = tray_wall_rects(world_dims)
    wall_corners = rect_corners(wc, we, jnp.zeros(wc.shape[:-1]))  # [4,4,2]
    n, v = corners.shape[0], corners.shape[1]
    # pad wall rects to V vertices by repeating the last corner (degenerate
    # edges are SAT-safe)
    if v > 4:
        reps = jnp.repeat(wall_corners[:, -1:], v - 4, axis=1)
        wall_corners = jnp.concatenate([wall_corners, reps], axis=1)
    elif v < 4:
        reps = jnp.repeat(corners[:, -1:], 4 - v, axis=1)
        corners = jnp.concatenate([corners, reps], axis=1)
        v = 4
    t_rep = jnp.repeat(corners[:, None], 4, 1).reshape(n * 4, v, 2)
    w_rep = jnp.broadcast_to(wall_corners[None], (n, 4, v, 2)).reshape(n * 4, v, 2)
    hit = convex_overlap(t_rep, w_rep, eps).reshape(n, 4).any(axis=-1)
    return (hit | outside) & mask


@dataclasses.dataclass(frozen=True)
class Scene2D:
    """Denormalized per-node 2-D boxes for one graph (static [N] shapes)."""

    center: jnp.ndarray  # [N, 2]
    extents: jnp.ndarray  # [N, 2] true extents
    yaw: jnp.ndarray  # [N]
    node_mask: jnp.ndarray  # [N] bool, True for real *tiles* (container excluded)
    world_dims: jnp.ndarray  # [2]


def boxes_collide(scene: Scene2D, eps: float = 1e-6) -> jnp.ndarray:
    """Pairwise tile-tile collision matrix [N, N] (upper triangle meaningful)."""
    corners = rect_corners(scene.center, scene.extents, scene.yaw)  # [N,4,2]
    n = corners.shape[0]
    p1 = corners[:, None].repeat(n, 1).reshape(n * n, 4, 2)
    p2 = corners[None, :].repeat(n, 0).reshape(n * n, 4, 2)
    hit = convex_overlap(p1, p2, eps).reshape(n, n)
    pair_mask = scene.node_mask[:, None] & scene.node_mask[None, :]
    eye = jnp.eye(n, dtype=bool)
    return hit & pair_mask & ~eye


def walls_collide(scene: Scene2D, eps: float = 1e-6) -> jnp.ndarray:
    """[N] True where a tile overlaps any tray wall (i.e. is not contained)."""
    wc, we = tray_wall_rects(scene.world_dims)
    wall_corners = rect_corners(wc, we, jnp.zeros(wc.shape[:-1]))  # [4,4,2]
    tile_corners = rect_corners(scene.center, scene.extents, scene.yaw)  # [N,4,2]
    n = tile_corners.shape[0]
    t_rep = tile_corners[:, None].repeat(4, 1).reshape(n * 4, 4, 2)
    w_rep = jnp.broadcast_to(wall_corners[None], (n, 4, 4, 2)).reshape(n * 4, 4, 2)
    hit = convex_overlap(t_rep, w_rep, eps).reshape(n, 4).any(axis=-1)
    return hit & scene.node_mask


def _ranges(center, ext):
    left = center[..., 0] - ext[..., 0] / 2
    right = center[..., 0] + ext[..., 0] / 2
    bottom = center[..., 1] - ext[..., 1] / 2
    top = center[..., 1] + ext[..., 1] / 2
    return left, right, bottom, top


def _axis_overlap_enough(lo1, hi1, lo2, hi2):
    """Reference 'in range' test (``data_utils.py:512-524``): either interval
    nests in the other, or the raw overlap exceeds OVERLAP_FRAC of the smaller
    width."""
    nested = ((lo2 <= lo1) & (lo1 < hi1) & (hi1 <= hi2)) | (
        (lo1 <= lo2) & (lo2 < hi2) & (hi2 <= hi1)
    )
    overlap = jnp.minimum(hi1, hi2) - jnp.maximum(lo1, lo2)
    min_w = jnp.minimum(hi1 - lo1, hi2 - lo2)
    return nested | (overlap > min_w * OVERLAP_FRAC)


def qualitative_pair_predicates(scene: Scene2D, scale: float = 1.0):
    """All pairwise predicate matrices needed to check qualitative edges.

    Returns a dict of bool[N, N] arrays (entry [i, j] refers to the ordered
    pair (i, j)) plus bool[N] in-tray predicates. Mirrors reference
    ``data_utils.py:449-604``.
    """
    ext = effective_aabb(scene.extents, scene.yaw)  # [N,2]
    left, right, bottom, top = _ranges(scene.center, ext)
    x, y = scene.center[..., 0], scene.center[..., 1]

    alignment = ALIGNMENT * scale
    touching = TOUCHING * scale
    closeness = CLOSENESS * scale
    farness = FARNESS * scale

    # unary (w.r.t. tray centered at origin)
    center_in = jnp.sqrt(x**2 + y**2) < closeness
    left_in = right < 0
    right_in = left > 0
    top_in = bottom > 0
    bottom_in = top < 0

    # pairwise axis-overlap tests  [i, j]
    in_x = _axis_overlap_enough(left[:, None], right[:, None], left[None, :], right[None, :])
    in_y = _axis_overlap_enough(bottom[:, None], top[:, None], bottom[None, :], top[None, :])

    # directed gaps: d_top[i, j] = gap between j's bottom and i's top
    # (j above i); valid side relation iff x-ranges overlap enough.
    d_top = bottom[None, :] - top[:, None]
    d_bottom = bottom[:, None] - top[None, :]
    d_left = left[:, None] - right[None, :]  # j left of i
    d_right = left[None, :] - right[:, None]  # j right of i

    def side_rel(d, rng, thresh):
        return rng & (d >= -SIDE_EPS) & (d < thresh)

    # neighbor relations within `farness` (data_utils.py:527-577)
    nb_top = side_rel(d_top, in_x, farness)
    nb_bottom = side_rel(d_bottom, in_x, farness)
    nb_left = side_rel(d_left, in_y, farness)
    nb_right = side_rel(d_right, in_y, farness)
    any_side = nb_top | nb_bottom | nb_left | nb_right

    # ('left-of', b, a): b is a's left neighbor with gap < closeness
    # (data_utils.py:591-596); predicate indexed [b, a] -> transpose of the
    # [a, b] neighbor matrix.
    left_of = side_rel(d_left, in_y, closeness).T
    top_of = side_rel(d_top, in_x, closeness).T

    # close-to: any side relation with gap < touching (data_utils.py:597-599);
    # symmetric after unordered expansion.
    close_raw = (
        side_rel(d_top, in_x, touching)
        | side_rel(d_bottom, in_x, touching)
        | side_rel(d_left, in_y, touching)
        | side_rel(d_right, in_y, touching)
    )
    close_to = close_raw | close_raw.T

    # away-from: no side relation in either direction (data_utils.py:600-604)
    away_from = ~(any_side | any_side.T)

    h_aligned = jnp.abs(y[:, None] - y[None, :]) < alignment
    v_aligned = jnp.abs(x[:, None] - x[None, :]) < alignment

    return {
        "center_in": center_in,
        "left_in": left_in,
        "right_in": right_in,
        "top_in": top_in,
        "bottom_in": bottom_in,
        "left_of": left_of,
        "top_of": top_of,
        "close_to": close_to,
        "away_from": away_from,
        "h_aligned": h_aligned,
        "v_aligned": v_aligned,
    }


def check_qualitative_edges(
    scene: Scene2D,
    edges: jnp.ndarray,
    edge_type: jnp.ndarray,
    edge_mask: jnp.ndarray,
    scale: float = 1.0,
) -> jnp.ndarray:
    """Per-edge satisfaction bool[E] for qualitative-vocabulary edges.

    ``in`` and ``cfree`` edges are judged by containment / pairwise collision
    (the reference enforces them through the FCL wall/tile collision check,
    ``worlds.py:734-746``).
    """
    preds = qualitative_pair_predicates(scene, scale)
    no_wall_hit = ~walls_collide(scene)
    collide = boxes_collide(scene)

    a = edges[:, 0]
    b = edges[:, 1]

    per_type = jnp.stack(
        [
            no_wall_hit[a],  # in
            preds["center_in"][a],  # center-in
            preds["left_in"][a],  # left-in
            preds["right_in"][a],  # right-in
            preds["top_in"][a],  # top-in
            preds["bottom_in"][a],  # bottom-in
            ~collide[a, b],  # cfree
            preds["left_of"][a, b],  # left-of
            preds["top_of"][a, b],  # top-of
            preds["close_to"][a, b],  # close-to
            preds["away_from"][a, b],  # away-from
            preds["h_aligned"][a, b],  # h-aligned
            preds["v_aligned"][a, b],  # v-aligned
        ],
        axis=-1,
    )  # [E, 13]
    sat = jnp.take_along_axis(per_type, edge_type[:, None], axis=-1)[:, 0]
    return sat | ~edge_mask


def scene_from_qualitative_features(
    geom: jnp.ndarray,
    pose: jnp.ndarray,
    node_mask: jnp.ndarray,
    cond_mask: jnp.ndarray,
    world_dims: jnp.ndarray,
) -> Scene2D:
    """Denormalize qualitative-mode features into a Scene2D.

    Feature layout (reference ``data_transforms.py:101-109``):
    geom = (w/W, l/L); pose = (x/(W/2), y/(L/2), cs, sn).
    """
    w = world_dims[0]
    l = world_dims[1]
    extents = geom[:, :2] * jnp.stack([w, l])
    center = pose[:, :2] * jnp.stack([w / 2, l / 2])
    cs, sn = pose[:, 2], pose[:, 3]
    norm = jnp.sqrt(cs**2 + sn**2)
    yaw = jnp.arctan2(sn / jnp.maximum(norm, 1e-9), cs / jnp.maximum(norm, 1e-9))
    tiles = node_mask & ~cond_mask
    return Scene2D(
        center=center, extents=extents, yaw=yaw, node_mask=tiles,
        world_dims=world_dims,
    )


def qualitative_graph_satisfied(
    graph,
    pose_features: jnp.ndarray,
    scale: float = 1.0,
):
    """Full success check for one qualitative graph: collision-free, in-tray,
    and every given constraint edge satisfied. Returns (bool, per-edge bool[E]).

    Reference semantics: ``worlds.py:734-764`` — success iff zero collisions
    AND every given constraint re-derivable from the generated scene.
    """
    scene = scene_from_qualitative_features(
        graph.geom, pose_features, graph.node_mask, graph.cond_mask,
        graph.world_dims,
    )
    edge_sat = check_qualitative_edges(
        scene, graph.edges, graph.edge_type, graph.edge_mask, scale
    )
    collide_any = boxes_collide(scene).any()
    wall_any = walls_collide(scene).any()
    ok = edge_sat.all() & ~collide_any & ~wall_any
    return ok, edge_sat


batched_qualitative_satisfied = jax.vmap(
    qualitative_graph_satisfied, in_axes=(0, 0, None)
)


# --------------------------------------------------------------------------- #
# triangle (diffuse_pairwise) mode
# --------------------------------------------------------------------------- #


def triangle_vertices_from_features(
    geom: jnp.ndarray, pose: jnp.ndarray, world_dims: jnp.ndarray
) -> jnp.ndarray:
    """Reconstruct world-frame triangle vertices from normalized P1 features.

    P1 encoding (reference ``envs/worlds.py:952-1020`` get_rotation and
    ``worlds.py:1083-1142`` reconstruction): geom = (l, x3, y3) is the
    canonical triangle — v1 at the origin, v2 = (l, 0) along +x, v3 =
    (x3, y3); pose = (x1, y1, cs, sn) places v1 and rotates by
    R = [[cs, sn], [-sn, cs]] (the reference's sign convention,
    ``worlds.py:1090-1100``).

    Normalization (reference ``data_transforms.py:112-127``):
    l, x3 /= W; y3 /= L; x1 /= W/2; y1 /= L/2.

    geom [N, 3], pose [N, 4] -> [N, 3, 2].
    """
    w = world_dims[0]
    l_t = world_dims[1]
    el = geom[:, 0] * w
    x3 = geom[:, 1] * w
    y3 = geom[:, 2] * l_t
    x1 = pose[:, 0] * (w / 2)
    y1 = pose[:, 1] * (l_t / 2)
    cs, sn = pose[:, 2], pose[:, 3]
    norm = jnp.maximum(jnp.sqrt(cs**2 + sn**2), 1e-9)
    cs, sn = cs / norm, sn / norm

    p1 = jnp.stack([x1, y1], -1)
    v2 = jnp.stack([cs * el, -sn * el], -1)
    v3 = jnp.stack([cs * x3 + sn * y3, -sn * x3 + cs * y3], -1)
    return jnp.stack([p1, p1 + v2, p1 + v3], axis=1)


def diffuse_pairwise_graph_satisfied(graph, pose_features: jnp.ndarray):
    """Success check for one triangle-mode graph: all triangles mutually
    collision-free and inside the tray (reference semantics: FCL collisions
    incl. walls, ``worlds.py:377-388``). Returns (bool, per-edge sat bool[E])
    where 'in' edges report containment of the first argument and 'cfree'
    edges report pairwise separation."""
    tris = triangle_vertices_from_features(
        graph.geom, pose_features, graph.world_dims
    )
    tiles = graph.node_mask & ~graph.cond_mask
    collide = polygons_collide(tris, tiles)
    wall_hit = polygons_hit_walls(tris, tiles, graph.world_dims)
    ok = ~collide.any() & ~wall_hit.any()

    a = graph.edges[:, 0]
    b = graph.edges[:, 1]
    per_type = jnp.stack([~wall_hit[a], ~collide[a, b]], axis=-1)
    sat = jnp.take_along_axis(
        per_type, jnp.minimum(graph.edge_type, 1)[:, None], axis=-1
    )[:, 0]
    return ok, sat | ~graph.edge_mask


batched_diffuse_pairwise_satisfied = jax.vmap(
    diffuse_pairwise_graph_satisfied, in_axes=(0, 0)
)


# --------------------------------------------------------------------------- #
# stability (stacking) mode
# --------------------------------------------------------------------------- #

STABILITY_CONTACT_TOL = 0.02
# indices into STABILITY_CONSTRAINTS = (within, supportedby, cfree)
_STAB_WITHIN = 0
_STAB_SUPPORTEDBY = 1
_STAB_CFREE = 2


def stability_scene_from_features(graph, pose_features: jnp.ndarray) -> Scene2D:
    """Denormalize stability-mode features ((w/W, l/L), (x, y, cs, sn) with
    the shelf centered at the origin; reference ``data_transforms.py:272-303``)."""
    return scene_from_qualitative_features(
        graph.geom, pose_features, graph.node_mask, graph.cond_mask,
        graph.world_dims,
    )


def stability_edges_satisfied(
    graph, pose_features: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-edge satisfaction for the stability vocabulary, plus the pairwise
    collision and support-contact matrices.

    Geometric definitions (mirroring the reference's contact-based oracle,
    ``demo_utils.py:1032-1098``):
    - within(i, 0): the box AABB lies inside the shelf rectangle;
    - supportedby(i, j): i's bottom touches j's top within CONTACT_TOL and
      their x-ranges overlap; supportedby(i, 0) means resting on the floor;
    - cfree(i, j): the (rotated) boxes do not overlap.
    """
    scene = stability_scene_from_features(graph, pose_features)
    # exact bounds of the *rotated* box (round-1 weakness: the ±0.1-rad
    # swap AABB was wrong for intermediate yaws; corners are exact at any yaw)
    corners = rect_corners(scene.center, scene.extents, scene.yaw)  # [N,4,2]
    left = corners[..., 0].min(axis=-1)
    right = corners[..., 0].max(axis=-1)
    bottom = corners[..., 1].min(axis=-1)
    top = corners[..., 1].max(axis=-1)
    w = graph.world_dims[0]
    l = graph.world_dims[1]
    floor = -l / 2

    within = (
        (left >= -w / 2 - 1e-6)
        & (right <= w / 2 + 1e-6)
        & (bottom >= floor - 1e-6)
        & (top <= l / 2 + 1e-6)
    )

    x_overlap = jnp.minimum(right[:, None], right[None, :]) - jnp.maximum(
        left[:, None], left[None, :]
    )
    # contact[i, j]: i rests on j
    contact = (
        (jnp.abs(bottom[:, None] - top[None, :]) < STABILITY_CONTACT_TOL)
        & (x_overlap > 0.01)
        & scene.node_mask[:, None]
        & scene.node_mask[None, :]
    )
    on_floor = (jnp.abs(bottom - floor) < STABILITY_CONTACT_TOL) & scene.node_mask

    collide = boxes_collide(scene, eps=STABILITY_CONTACT_TOL / 2)

    a = graph.edges[:, 0]
    b = graph.edges[:, 1]
    sup_ab = jnp.where(b == 0, on_floor[a], contact[a, b])
    per_type = jnp.stack(
        [
            within[a],  # within
            sup_ab,  # supportedby
            ~collide[a, b],  # cfree
        ],
        axis=-1,
    )
    sat = jnp.take_along_axis(per_type, graph.edge_type[:, None], axis=-1)[:, 0]
    sat = sat | ~graph.edge_mask
    return sat, collide, contact


def stability_graph_satisfied_geometric(graph, pose_features: jnp.ndarray):
    """Device-side portion of the stability oracle: all given edges hold,
    no collisions, everything within the shelf. The static-equilibrium check
    runs on host (``envs/stability.check_stability_solution``) — mirroring the
    reference where physics is the host-side authority (PyBullet,
    ``demo_utils.py:837-842``), but deterministic and ~1000x cheaper."""
    sat, collide, contact = stability_edges_satisfied(graph, pose_features)
    ok = sat.all() & ~collide.any()
    return ok, sat
