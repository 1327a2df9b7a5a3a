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


# --------------------------------------------------------------------------- #
# spline trajectory interpolation (reference interpolation_utils.py:19-95)
# --------------------------------------------------------------------------- #


def test_spline_path_endpoints_and_smoothness():
    import numpy as np

    from diffusion_ccsp_tpu.utils.interpolation import spline_path

    rng = np.random.default_rng(0)
    path = rng.normal(size=(5, 7))
    out = spline_path(path, num=200)
    assert out.shape == (200, 7)
    assert np.allclose(out[0], path[0], atol=1e-9)
    assert np.allclose(out[-1], path[-1], atol=1e-9)
    # smooth: second differences stay bounded relative to a linear resample
    acc = np.abs(np.diff(out, n=2, axis=0)).max()
    assert acc < 0.1


def test_spline_path_degenerate_inputs():
    import numpy as np

    from diffusion_ccsp_tpu.utils.interpolation import spline_path

    one = spline_path(np.asarray([[1.0, 2.0]]), num=10)
    assert one.shape == (10, 2) and np.allclose(one, [1.0, 2.0])
    two = spline_path(np.asarray([[0.0, 0.0], [1.0, 1.0]]), num=5)
    assert np.allclose(two[0], 0) and np.allclose(two[-1], 1)
    dup = spline_path(
        np.asarray([[0.0, 0.0], [0.0, 0.0], [1.0, 0.0], [2.0, 1.0]]), num=9
    )
    assert dup.shape == (9, 2)


def test_angle_helpers():
    import numpy as np

    from diffusion_ccsp_tpu.utils.interpolation import (
        angle_interpolate,
        wrap_angle,
    )

    assert abs(wrap_angle(3 * np.pi) - np.pi) < 1e-9
    mid = angle_interpolate(np.pi - 0.1, -np.pi + 0.1, np.asarray(0.5))
    # shortest arc crosses pi
    assert abs(abs(mid) - np.pi) < 0.2
