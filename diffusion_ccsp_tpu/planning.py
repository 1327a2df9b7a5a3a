"""Sampling-based motion planning: RRT, bidirectional RRT-Connect, and
shortcut smoothing over generic configuration spaces.

Capability parity: reference ``pybullet_engine/algorithms/rrt.py:113-241``
(rrt / birrt + smooth_path) and ``algorithms/space.py`` (configuration
spaces with box ranges and cyclic joints). Host-side numpy; the collision
predicate is a pluggable callback (geometry oracle, robot self-collision,
etc.).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import numpy as np


@dataclasses.dataclass
class ConfigurationSpace:
    """Box configuration space with optionally cyclic dimensions."""

    lower: np.ndarray
    upper: np.ndarray
    cyclic: np.ndarray | None = None  # bool per dim

    def __post_init__(self):
        self.lower = np.asarray(self.lower, float)
        self.upper = np.asarray(self.upper, float)
        if self.cyclic is None:
            self.cyclic = np.zeros(self.lower.shape, bool)

    @property
    def dim(self) -> int:
        return self.lower.shape[0]

    def sample(self, rng: np.random.Generator) -> np.ndarray:
        return rng.uniform(self.lower, self.upper)

    def difference(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        d = b - a
        span = self.upper - self.lower
        wrap = self.cyclic
        d = np.where(wrap, (d + span / 2) % span - span / 2, d)
        return d

    def distance(self, a: np.ndarray, b: np.ndarray) -> float:
        return float(np.linalg.norm(self.difference(a, b)))

    def interpolate(self, a: np.ndarray, b: np.ndarray, alpha: float) -> np.ndarray:
        return a + alpha * self.difference(a, b)


def _extend(space, tree, parents, target, step, collision_fn):
    """Extend the tree one step toward target; returns new node index or None."""
    dists = [space.distance(n, target) for n in tree]
    nearest = int(np.argmin(dists))
    d = dists[nearest]
    if d < 1e-12:
        return None
    alpha = min(1.0, step / d)
    new = space.interpolate(tree[nearest], target, alpha)
    if collision_fn(new):
        return None
    tree.append(new)
    parents.append(nearest)
    return len(tree) - 1


def _trace(tree, parents, idx):
    path = []
    while idx is not None:
        path.append(tree[idx])
        idx = parents[idx]
    return path[::-1]


def rrt(
    space: ConfigurationSpace,
    start: np.ndarray,
    goal: np.ndarray,
    collision_fn: Callable[[np.ndarray], bool],
    rng: np.random.Generator | None = None,
    max_iterations: int = 2000,
    step: float = 0.1,
    goal_bias: float = 0.1,
    goal_tol: float = 1e-6,
) -> list | None:
    """Single-tree RRT (reference ``rrt.py:113-160``)."""
    rng = rng or np.random.default_rng(0)
    start = np.asarray(start, float)
    goal = np.asarray(goal, float)
    if collision_fn(start) or collision_fn(goal):
        return None
    tree = [start]
    parents: list = [None]
    for _ in range(max_iterations):
        target = goal if rng.random() < goal_bias else space.sample(rng)
        idx = _extend(space, tree, parents, target, step, collision_fn)
        if idx is None:
            continue
        if space.distance(tree[idx], goal) <= max(step, goal_tol):
            if not collision_fn(goal):
                tree.append(goal)
                parents.append(idx)
                return _trace(tree, parents, len(tree) - 1)
    return None


def birrt(
    space: ConfigurationSpace,
    start: np.ndarray,
    goal: np.ndarray,
    collision_fn: Callable[[np.ndarray], bool],
    rng: np.random.Generator | None = None,
    max_iterations: int = 2000,
    step: float = 0.1,
) -> list | None:
    """Bidirectional RRT-Connect (reference ``rrt.py:163-214``)."""
    rng = rng or np.random.default_rng(0)
    start = np.asarray(start, float)
    goal = np.asarray(goal, float)
    if collision_fn(start) or collision_fn(goal):
        return None
    ta, pa = [start], [None]
    tb, pb = [goal], [None]
    a_is_start = True
    for it in range(max_iterations):
        target = space.sample(rng)
        ia = _extend(space, ta, pa, target, step, collision_fn)
        if ia is not None:
            # try to connect tree b to the new node
            while True:
                ib = _extend(space, tb, pb, ta[ia], step, collision_fn)
                if ib is None:
                    break
                if space.distance(tb[ib], ta[ia]) < 1e-9:
                    path_a = _trace(ta, pa, ia)
                    path_b = _trace(tb, pb, ib)
                    path = path_a + path_b[::-1][1:]
                    return path if a_is_start else path[::-1]
        ta, pa, tb, pb = tb, pb, ta, pa  # swap roles
        a_is_start = not a_is_start
    return None


def smooth_path(
    space: ConfigurationSpace,
    path: Sequence[np.ndarray],
    collision_fn: Callable[[np.ndarray], bool],
    rng: np.random.Generator | None = None,
    iterations: int = 100,
    resolution: float = 0.05,
) -> list:
    """Shortcut smoothing (reference ``rrt.py:217-241``): repeatedly try to
    replace a random sub-path with a straight segment."""
    rng = rng or np.random.default_rng(0)
    path = [np.asarray(p, float) for p in path]
    for _ in range(iterations):
        if len(path) <= 2:
            break
        i, j = sorted(rng.choice(len(path), 2, replace=False))
        if j <= i + 1:
            continue
        a, b = path[i], path[j]
        d = space.distance(a, b)
        n = max(int(d / resolution), 1)
        if any(
            collision_fn(space.interpolate(a, b, k / n)) for k in range(1, n)
        ):
            continue
        path = path[: i + 1] + path[j:]
    return path
