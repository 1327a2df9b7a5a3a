"""Procedural scene samplers: recursive BSP tray splitting.

Capability parity: reference ``envs/builders.py:10-52`` (get_tray_splitting_gen)
and ``envs/mesh_utils.py:227-258`` (regions_to_meshes random padding). Written
as plain numpy functions returning arrays instead of trimesh objects.

Regions are (left, bottom, w, l) in tray-local coordinates with the origin at
the tray's lower-left corner; tiles are centered boxes in tray-centered
coordinates.
"""

from __future__ import annotations

import numpy as np


def _partition(
    rng: np.random.Generator,
    box: tuple[float, float, float, float],
    depth: int,
    out: list,
    stop_prob: float = 0.3,
):
    """Randomly split a region along a random axis at a random point."""
    if rng.random() < stop_prob or depth == 0:
        out.append(box)
        return
    axis = 0 if rng.random() < 0.5 else 1
    split = rng.random() * box[axis + 2]
    if axis == 0:
        _partition(rng, (box[0], box[1], split, box[3]), depth - 1, out, stop_prob)
        _partition(
            rng, (box[0] + split, box[1], box[2] - split, box[3]), depth - 1, out,
            stop_prob,
        )
    else:
        _partition(rng, (box[0], box[1], box[2], split), depth - 1, out, stop_prob)
        _partition(
            rng, (box[0], box[1] + split, box[2], box[3] - split), depth - 1, out,
            stop_prob,
        )


def sample_tray_splitting(
    rng: np.random.Generator,
    w: float,
    l: float,
    min_num_regions: int = 2,
    max_num_regions: int = 6,
    max_depth: int | None = None,
    default_min_size: float = 0.4,
    max_attempts: int = 10_000,
) -> np.ndarray:
    """Sample one acceptable BSP split of a w×l tray.

    Returns regions [K, 4] = (left, bottom, rw, rl); K in
    [min_num_regions, max_num_regions]. Regions smaller than
    ``min(w, l)/2 * default_min_size`` on either side are discarded
    (reference ``builders.py:32-36``).
    """
    if max_depth is None:
        # reference RandomSplitWorld.sample_scene: ceil(log2(max)) + 1
        max_depth = int(np.ceil(np.log2(max(max_num_regions, 2)))) + 1
    min_size = min(w, l) / 2 * default_min_size
    for _ in range(max_attempts):
        regions: list = []
        _partition(rng, (0.0, 0.0, w, l), max_depth, regions)
        regions = [r for r in regions if r[2] > min_size and r[3] > min_size]
        if min_num_regions <= len(regions) <= max_num_regions:
            return np.asarray(regions, np.float64)
    raise RuntimeError("BSP sampler failed to produce an acceptable split")


def shrink_regions(
    rng: np.random.Generator,
    regions: np.ndarray,
    w: float,
    l: float,
    max_offset: float = 0.2,
    min_offset_perc: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Randomly pad each region inward and convert to centered boxes.

    Returns (centers [K, 2], extents [K, 2]) in tray-centered coordinates.
    Mirrors reference ``mesh_utils.py:227-258`` (uniform per-side padding in
    [max_offset*min_offset_perc, max_offset]; degenerate regions dropped).
    """
    centers, extents = [], []
    for left, bottom, rw, rl in regions:
        pad = rng.uniform(max_offset * min_offset_perc, max_offset, 4)
        # pad order follows the reference: [top, left, bottom, right]
        nw = rw - (pad[1] + pad[3])
        nl = rl - (pad[0] + pad[2])
        if nw <= 0 or nl <= 0:
            continue
        x = left + pad[1]
        y = bottom + pad[0]
        centers.append((-w / 2 + x + nw / 2, -l / 2 + y + nl / 2))
        extents.append((nw, nl))
    return np.asarray(centers, np.float64), np.asarray(extents, np.float64)
