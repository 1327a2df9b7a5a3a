"""Host-side qualitative constraint extraction (numpy).

Behavioral parity with reference ``envs/data_utils.py:427-621``
(compute_qualitative_constraints): given tile AABBs in tray-centered
coordinates, derive the set of qualitative relations that hold. Used for data
generation and as the golden reference for the on-device predicates in
``ops/geometry2d.py``.

Indexing: object 0 is the container ('bottom'), tiles are 1..n. Rotated tiles
swap w/l when |yaw| is within 0.1 rad of pi/2, otherwise they are treated as
axis-aligned (reference ``data_utils.py:457-460``).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from diffusion_ccsp_tpu.constraints import IGNORED_CONSTRAINTS, UNORDERED_CONSTRAINTS
from diffusion_ccsp_tpu.ops.geometry2d import (
    ALIGNMENT,
    CLOSENESS,
    FARNESS,
    OVERLAP_FRAC,
    SIDE_EPS,
    TOUCHING,
)

Constraint = tuple[str, int, int]


def _axis_overlap_enough(lo1, hi1, lo2, hi2):
    nested = (lo2 <= lo1 < hi1 <= hi2) or (lo1 <= lo2 < hi2 <= hi1)
    if nested:
        return True
    overlap = min(hi1, hi2) - max(lo1, lo2)
    min_w = min(hi1 - lo1, hi2 - lo2)
    return overlap > min_w * OVERLAP_FRAC


def extract_qualitative_constraints(
    centers: np.ndarray,
    extents: np.ndarray,
    yaws: np.ndarray | None = None,
    scale: float = 1.0,
) -> list[Constraint]:
    """Derive the qualitative constraint set of a scene.

    Args:
      centers: [n, 2] tile centers (tray-centered coords), tiles only
        (no container row) — tile k here is object index k+1 in the graph.
      extents: [n, 2] tile (w, l).
      yaws:    [n] tile yaw or None.

    Returns a sorted list of (name, i, j) with graph object indices
    (container = 0).
    """
    n = len(centers)
    alignment = ALIGNMENT * scale
    touching = TOUCHING * scale
    closeness = CLOSENESS * scale
    farness = FARNESS * scale

    eff = np.array(extents, np.float64).copy()
    if yaws is not None:
        for k in range(n):
            if abs(abs(yaws[k]) - np.pi / 2) < 0.1:
                eff[k] = eff[k][::-1]

    left = centers[:, 0] - eff[:, 0] / 2
    right = centers[:, 0] + eff[:, 0] / 2
    bottom = centers[:, 1] - eff[:, 1] / 2
    top = centers[:, 1] + eff[:, 1] / 2

    constraints: list[Constraint] = []
    # neighbors[i][side] = list of (j, gap) — graph indices
    neighbors: dict[int, dict[str, list]] = {
        i: defaultdict(list) for i in range(1, n + 1)
    }

    for k in range(n):
        i = k + 1  # graph index
        x1, y1 = centers[k]

        # unary in-tray relations (reference data_utils.py:467-476)
        if np.sqrt(x1**2 + y1**2) < closeness:
            constraints.append(("center-in", i, 0))
        if right[k] < 0:
            constraints.append(("left-in", i, 0))
        if left[k] > 0:
            constraints.append(("right-in", i, 0))
        if top[k] < 0:
            constraints.append(("bottom-in", i, 0))
        if bottom[k] > 0:
            constraints.append(("top-in", i, 0))

        for m in range(k + 1, n):
            j = m + 1
            x2, y2 = centers[m]

            if abs(x1 - x2) < alignment:
                constraints.append(("v-aligned", i, j))
            if abs(y1 - y2) < alignment:
                constraints.append(("h-aligned", i, j))

            # top/bottom side relations (require x-range overlap)
            if _axis_overlap_enough(left[k], right[k], left[m], right[m]):
                d = bottom[m] - top[k]  # j above i
                if -SIDE_EPS <= d < farness:
                    neighbors[i]["top"].append((j, d))
                    neighbors[j]["bottom"].append((i, d))
                d = bottom[k] - top[m]  # j below i
                if -SIDE_EPS <= d < farness:
                    neighbors[i]["bottom"].append((j, d))
                    neighbors[j]["top"].append((i, d))

            # left/right side relations (require y-range overlap)
            if _axis_overlap_enough(bottom[k], top[k], bottom[m], top[m]):
                d = left[k] - right[m]  # j left of i
                if -SIDE_EPS <= d < farness:
                    neighbors[i]["left"].append((j, d))
                    neighbors[j]["right"].append((i, d))
                d = left[m] - right[k]  # j right of i
                if -SIDE_EPS <= d < farness:
                    neighbors[i]["right"].append((j, d))
                    neighbors[j]["left"].append((i, d))

    # derived relations (reference data_utils.py:579-604)
    for i, relations in neighbors.items():
        neighbor_ids = {i, 0}
        for side, vv in relations.items():
            for j, d in vv:
                if i == j:
                    continue
                if d < closeness and side in ("left", "top"):
                    mirror = {"left": "right", "top": "bottom"}[side]
                    constraints.append((f"{side}-of", j, i))
                    constraints.append((f"{mirror}-of", i, j))
                if (
                    d < touching
                    and ("close-to", j, i) not in constraints
                    and ("close-to", i, j) not in constraints
                ):
                    constraints.append(("close-to", j, i))
            neighbor_ids |= {j for j, _ in vv}
        constraints += [
            ("away-from", m, i)
            for m in range(1, n + 1)
            if m not in neighbor_ids
            and ("away-from", i, m) not in constraints
        ]

    constraints.sort()

    # cancel contradictory in-tray pairs (reference data_utils.py:607-614)
    for name_a, name_b in (("right-in", "left-in"), ("bottom-in", "top-in")):
        xs_a = [c[1] for c in constraints if c[0] == name_a]
        xs_b = [c[1] for c in constraints if c[0] == name_b]
        for x in xs_a:
            if x in xs_b:
                constraints.remove((name_a, x, 0))
                constraints.remove((name_b, x, 0))

    return [c for c in constraints if c[0] not in IGNORED_CONSTRAINTS]


def randomize_unordered_constraints(
    rng: np.random.Generator, constraints: list[Constraint]
) -> list[Constraint]:
    """Randomly swap the argument order of symmetric relations
    (reference ``data_utils.py:408-415``; 'cfree' excluded there too)."""
    out = []
    for c in constraints:
        if c[0] in ("close-to", "away-from", "h-aligned", "v-aligned") and rng.random() < 0.5:
            out.append((c[0], c[2], c[1]))
        else:
            out.append(c)
    return out


def expand_unordered_constraints(constraints: list[Constraint]) -> list[Constraint]:
    """Add both argument orders for symmetric relations
    (reference ``data_utils.py:418-424``)."""
    out = []
    for c in constraints:
        if c[0] in UNORDERED_CONSTRAINTS:
            out.append((c[0], c[2], c[1]))
        out.append(c)
    return out
