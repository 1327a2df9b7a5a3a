"""Motion planning tests: RRT / birrt through a gap, smoothing shortens
paths, cyclic dimensions wrap."""

import numpy as np

from diffusion_ccsp_tpu.planning import (
    ConfigurationSpace,
    birrt,
    rrt,
    smooth_path,
)


def wall_with_gap(q):
    """2-D world: wall at x=0 except a gap at |y| < 0.2."""
    x, y = q
    return abs(x) < 0.05 and abs(y) > 0.2


def test_rrt_through_gap():
    space = ConfigurationSpace(lower=[-1, -1], upper=[1, 1])
    path = rrt(
        space, [-0.8, 0.8], [0.8, 0.8], wall_with_gap,
        rng=np.random.default_rng(0), max_iterations=5000, step=0.1,
    )
    assert path is not None
    assert not any(wall_with_gap(p) for p in path)
    np.testing.assert_allclose(path[0], [-0.8, 0.8])
    np.testing.assert_allclose(path[-1], [0.8, 0.8])


def test_birrt_through_gap():
    space = ConfigurationSpace(lower=[-1, -1], upper=[1, 1])
    path = birrt(
        space, [-0.8, 0.8], [0.8, 0.8], wall_with_gap,
        rng=np.random.default_rng(1), max_iterations=5000, step=0.1,
    )
    assert path is not None
    assert not any(wall_with_gap(p) for p in path)
    # endpoints preserved
    np.testing.assert_allclose(path[0], [-0.8, 0.8])
    np.testing.assert_allclose(path[-1], [0.8, 0.8])


def test_smoothing_shortens():
    space = ConfigurationSpace(lower=[-1, -1], upper=[1, 1])
    rng = np.random.default_rng(2)
    path = birrt(
        space, [-0.8, 0.8], [0.8, 0.8], wall_with_gap, rng=rng,
        max_iterations=5000, step=0.08,
    )
    assert path is not None

    def length(p):
        return sum(space.distance(a, b) for a, b in zip(p, p[1:]))

    smoothed = smooth_path(space, path, wall_with_gap, rng=rng, iterations=200)
    assert length(smoothed) <= length(path) + 1e-9
    assert not any(wall_with_gap(p) for p in smoothed)


def test_cyclic_distance():
    space = ConfigurationSpace(
        lower=[-np.pi], upper=[np.pi], cyclic=np.asarray([True])
    )
    d = space.distance(np.asarray([3.0]), np.asarray([-3.0]))
    assert d < 0.5  # wraps around, not 6.0


def test_blocked_start_returns_none():
    space = ConfigurationSpace(lower=[-1, -1], upper=[1, 1])
    path = rrt(space, [0.0, 0.9], [0.8, 0.8], wall_with_gap,
               rng=np.random.default_rng(3))
    assert path is None
