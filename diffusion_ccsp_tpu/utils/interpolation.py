"""Trajectory interpolation: natural cubic splines over joint paths.

Capability parity: reference ``pybullet_engine/interpolation_utils.py:19-95``
(spline fitting used by ``move_qpos_trajectory_v2`` for smooth trajectory
tracking) and angle-range helpers (``range_utils.py``). Plain numpy; the
execution layer (``simulation.py``) consumes the resampled waypoints.
"""

from __future__ import annotations

import numpy as np


def natural_cubic_coeffs(ts: np.ndarray, xs: np.ndarray):
    """Natural cubic spline coefficients through (ts, xs).

    ts [K] strictly increasing, xs [K, D]. Returns (a, b, c, d) each
    [K-1, D]: segment i evaluates a + b*dt + c*dt^2 + d*dt^3.
    """
    ts = np.asarray(ts, float)
    xs = np.atleast_2d(np.asarray(xs, float))
    if xs.shape[0] != len(ts):
        xs = xs.T
    k = len(ts)
    h = np.diff(ts)  # [K-1]
    # solve for second derivatives m via the tridiagonal natural system
    m = np.zeros_like(xs)
    if k > 2:
        a_diag = np.zeros((k - 2, k - 2))
        rhs = np.zeros((k - 2, xs.shape[1]))
        for i in range(k - 2):
            a_diag[i, i] = 2 * (h[i] + h[i + 1])
            if i > 0:
                a_diag[i, i - 1] = h[i]
            if i < k - 3:
                a_diag[i, i + 1] = h[i + 1]
            rhs[i] = 6 * (
                (xs[i + 2] - xs[i + 1]) / h[i + 1]
                - (xs[i + 1] - xs[i]) / h[i]
            )
        m[1:-1] = np.linalg.solve(a_diag, rhs)
    a = xs[:-1]
    b = np.diff(xs, axis=0) / h[:, None] - h[:, None] * (
        2 * m[:-1] + m[1:]
    ) / 6
    c = m[:-1] / 2
    d = np.diff(m, axis=0) / (6 * h[:, None])
    return a, b, c, d


def spline_path(path: np.ndarray, num: int = 100) -> np.ndarray:
    """Resample a joint-space path [K, D] to ``num`` smooth waypoints
    (uniform chord-length parameterization; K < 3 degrades to linear)."""
    path = np.asarray(path, float)
    if len(path) == 1:
        return np.repeat(path, num, axis=0)
    chord = np.concatenate(
        [[0.0], np.cumsum(np.linalg.norm(np.diff(path, axis=0), axis=1))]
    )
    if chord[-1] <= 0:
        return np.repeat(path[:1], num, axis=0)
    ts = chord / chord[-1]
    # collapse duplicate waypoints (zero-length segments break the solve)
    keep = np.concatenate([[True], np.diff(ts) > 1e-12])
    ts, path = ts[keep], path[keep]
    if len(path) == 2:
        u = np.linspace(0, 1, num)
        return path[0] + u[:, None] * (path[1] - path[0])
    a, b, c, d = natural_cubic_coeffs(ts, path)
    u = np.linspace(0.0, 1.0, num)
    seg = np.clip(np.searchsorted(ts, u, side="right") - 1, 0, len(ts) - 2)
    dt = (u - ts[seg])[:, None]
    return a[seg] + b[seg] * dt + c[seg] * dt**2 + d[seg] * dt**3


def wrap_angle(a: np.ndarray) -> np.ndarray:
    """Wrap to (-pi, pi] (reference ``range_utils`` normalization)."""
    return -((-np.asarray(a) + np.pi) % (2 * np.pi) - np.pi)


def angle_interpolate(a0: float, a1: float, u: np.ndarray) -> np.ndarray:
    """Shortest-arc interpolation between two angles."""
    d = wrap_angle(a1 - a0)
    return wrap_angle(a0 + np.asarray(u) * d)
