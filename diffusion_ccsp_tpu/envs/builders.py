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


# --------------------------------------------------------------------------- #
# 3-D box splitting (layered stacking scenes)
# --------------------------------------------------------------------------- #


def _point_in_boxes(p, boxes) -> bool:
    return any(
        b[0] <= p[0] <= b[0] + b[2] and b[1] <= p[1] <= b[1] + b[3]
        for b in boxes
    )


def _largest_common_support(boxes) -> tuple | None:
    """Largest rectangle whose 4 corners all lie inside the union of
    ``boxes`` (reference ``builders.py:146-165`` compute_support_region:
    corner candidates are the 2 extreme values of each side)."""
    lefts = sorted(b[0] for b in boxes)
    bots = sorted((b[1] for b in boxes), reverse=True)
    rights = sorted((b[0] + b[2] for b in boxes), reverse=True)
    tops = sorted(b[1] + b[3] for b in boxes)
    best, best_area = None, 0.0
    for li in range(min(2, len(lefts))):
        for bi in range(min(2, len(bots))):
            for ri in range(min(2, len(rights))):
                for ti in range(min(2, len(tops))):
                    x0, y0 = lefts[li], bots[bi]
                    x1, y1 = rights[ri], tops[ti]
                    if x1 <= x0 or y1 <= y0:
                        continue
                    corners = [(x0, y0), (x1, y0), (x0, y1), (x1, y1)]
                    if not all(_point_in_boxes(p, boxes) for p in corners):
                        continue
                    area = (x1 - x0) * (y1 - y0)
                    if area > best_area:
                        best, best_area = (x0, y0, x1 - x0, y1 - y0), area
    return best


def _largest_secondary_support(boxes, region) -> tuple | None:
    """Largest rectangle inside the selected box with most leftover area but
    outside the primary support region (reference ``builders.py:108-144``)."""
    areas = []
    for b in boxes:
        ow = max(
            0.0,
            min(region[0] + region[2], b[0] + b[2]) - max(region[0], b[0]),
        )
        ol = max(
            0.0,
            min(region[1] + region[3], b[1] + b[3]) - max(region[1], b[1]),
        )
        areas.append(b[2] * b[3] - ow * ol)
    box = boxes[int(np.argmax(areas))]
    xs = sorted({box[0], box[0] + box[2], region[0], region[0] + region[2]})
    ys = sorted({box[1], box[1] + box[3], region[1], region[1] + region[3]})
    best, best_area = None, 0.0
    for i, x0 in enumerate(xs):
        for x1 in xs[i + 1:]:
            for j, y0 in enumerate(ys):
                for y1 in ys[j + 1:]:
                    corners = [(x0, y0), (x1, y0), (x0, y1), (x1, y1)]
                    inside_box = all(_point_in_boxes(p, [box]) for p in corners)
                    outside_region = all(
                        not (
                            region[0] < p[0] < region[0] + region[2]
                            and region[1] < p[1] < region[1] + region[3]
                        )
                        for p in corners
                    )
                    if not (inside_box and outside_region):
                        continue
                    area = (x1 - x0) * (y1 - y0)
                    if area > best_area:
                        best, best_area = (x0, y0, x1 - x0, y1 - y0), area
    return best


def _mine_support_triple(rng, regions, w, l):
    """Pick 2-3 mutually close bottom regions to support a bridge box
    (reference ``builders.py:167-195`` sample_support_boxes mines `close-to`
    pairs from the qualitative constraints and looks for a connected triple).
    """
    from diffusion_ccsp_tpu.envs.qualitative import (
        extract_qualitative_constraints,
    )

    centers = np.asarray(
        [(-w / 2 + r[0] + r[2] / 2, -l / 2 + r[1] + r[3] / 2) for r in regions]
    )
    extents = np.asarray([(r[2], r[3]) for r in regions])
    cons = extract_qualitative_constraints(centers, extents, scale=min(w, l))
    pool = [(i - 1, j - 1) for n, i, j in cons if n == "close-to"]
    rng.shuffle(pool)
    pset = {frozenset(p) for p in pool}
    for a, b in pool:
        for c in range(len(regions)):
            if c in (a, b):
                continue
            if frozenset((a, c)) in pset and frozenset((b, c)) in pset:
                return [a, b, c]
    if pool:
        return list(pool[0])
    return None


def sample_3d_box_splitting(
    rng: np.random.Generator,
    w: float,
    l: float,
    h: float,
    min_num_regions: int = 6,
    max_num_regions: int = 10,
    max_attempts: int = 200,
) -> list[tuple] | None:
    """Layered 3-D packing: bottom BSP regions, a bridge box spanning 2-3
    mutually close bottom boxes, a secondary top box, and per-region top
    layers (reference ``envs/builders.py:79-279`` get_3d_box_splitting_gen).

    Returns regions as (x, y, z, rw, rl, rh) in tray-local coordinates
    (x, y = lower-left corner of the footprint, z = resting height), or None.
    """
    for _ in range(max_attempts):
        try:
            bottom = sample_tray_splitting(
                rng, w, l, min_num_regions=max(min_num_regions - 3, 1),
                max_num_regions=max(max_num_regions - 2, 2),
                max_attempts=200,
            )
        except RuntimeError:
            continue
        bottom = [tuple(r) for r in bottom]
        h1 = rng.uniform(0, h * 0.66)
        h2 = rng.uniform(h1, h * 0.8)
        h3 = rng.uniform(0.2 * (h - h1), h - h1)
        h4 = rng.uniform(0.2 * (h - h2), h - h2)
        h5 = rng.uniform(0.2 * (h - h1), h - h1)

        triple = _mine_support_triple(rng, bottom, w, l)
        if triple is None:
            continue
        selected = [bottom[k] for k in triple]
        region = _largest_common_support(selected)
        if region is None or region[2] < 0.05 * w or region[3] < 0.05 * l:
            continue
        secondary = _largest_secondary_support(selected, region)

        out = []
        ok = True
        for k, r in enumerate(bottom):
            if k in triple:
                out.append((r[0], r[1], 0.0, r[2], r[3], h1))
            else:
                out.append((r[0], r[1], 0.0, r[2], r[3], h2))
                # per-region top layer: split the footprint into 1-2 boxes
                try:
                    tops = sample_tray_splitting(
                        rng, r[2], r[3], min_num_regions=1,
                        max_num_regions=2, max_attempts=50,
                        default_min_size=0.3,
                    )
                except RuntimeError:
                    ok = False
                    break
                for tr in tops:
                    out.append(
                        (r[0] + tr[0], r[1] + tr[1], h2, tr[2], tr[3], h4)
                    )
        if not ok:
            continue
        out.append((region[0], region[1], h1, region[2], region[3], h3))
        if secondary is not None and secondary[2] > 0.03 * w and secondary[3] > 0.03 * l:
            out.append(
                (secondary[0], secondary[1], h1, secondary[2], secondary[3], h5)
            )
        # stability clearance: shave a random sliver off each height
        # (reference ``builders.py:254-255``)
        out = [
            (x, y, z, rw, rl, max(rh - rng.uniform(0, h * 0.1), h * 0.05))
            for (x, y, z, rw, rl, rh) in out
        ]
        if min_num_regions <= len(out) <= max_num_regions:
            return out
    return None
