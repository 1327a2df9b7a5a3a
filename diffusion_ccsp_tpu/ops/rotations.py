"""Quaternion / SE(3) algebra as pure JAX functions.

Capability parity: reference ``pybullet_engine/rotation_utils.py`` /
``rotationlib.py`` (host numpy) and ``rotation_utils_torch.py:16-104``
(``th_quat_mul`` / ``th_compose_transformation`` — batched torch variants
used on the training path). Here one implementation serves both roles:
every function is jit/vmap-compatible and works on arbitrary leading batch
dimensions.

Convention: quaternions are (x, y, z, w) — the PyBullet order the reference
uses throughout (its trimesh boundary converts to wxyz, see
``envs/robot_worlds.py:140-142``); transforms are (pos[..., 3], quat[..., 4]).
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_identity() -> jnp.ndarray:
    return jnp.asarray([0.0, 0.0, 0.0, 1.0])


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, xyzw layout (reference ``th_quat_mul``)."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0])


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v[..., 3] by quaternions q[..., 4]."""
    qv = q[..., :3]
    w = q[..., 3:]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_from_yaw(yaw: jnp.ndarray) -> jnp.ndarray:
    h = yaw / 2
    z = jnp.zeros_like(yaw)
    return jnp.stack([z, z, jnp.sin(h), jnp.cos(h)], axis=-1)


def quat_from_euler(roll, pitch, yaw) -> jnp.ndarray:
    """Z-Y-X intrinsic (PyBullet getQuaternionFromEuler semantics)."""
    cr, sr = jnp.cos(roll / 2), jnp.sin(roll / 2)
    cp, sp = jnp.cos(pitch / 2), jnp.sin(pitch / 2)
    cy, sy = jnp.cos(yaw / 2), jnp.sin(yaw / 2)
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] -> [..., 3, 3]."""
    q = quat_normalize(q)
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        -1,
    )
    row1 = jnp.stack(
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        -1,
    )
    row2 = jnp.stack(
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        -1,
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 4] xyzw (branch-free Shepperd via max trace)."""
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick the numerically largest pivot
    qw = jnp.stack(
        [
            1.0 + tr,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        -1,
    )
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) / 2
    w_, x_, y_, z_ = qw[..., 0], qw[..., 1], qw[..., 2], qw[..., 3]
    cand = jnp.stack(
        [
            jnp.stack(
                [
                    (m[..., 2, 1] - m[..., 1, 2]) / (4 * w_),
                    (m[..., 0, 2] - m[..., 2, 0]) / (4 * w_),
                    (m[..., 1, 0] - m[..., 0, 1]) / (4 * w_),
                    w_,
                ],
                -1,
            ),
            jnp.stack(
                [
                    x_,
                    (m[..., 0, 1] + m[..., 1, 0]) / (4 * x_),
                    (m[..., 0, 2] + m[..., 2, 0]) / (4 * x_),
                    (m[..., 2, 1] - m[..., 1, 2]) / (4 * x_),
                ],
                -1,
            ),
            jnp.stack(
                [
                    (m[..., 0, 1] + m[..., 1, 0]) / (4 * y_),
                    y_,
                    (m[..., 1, 2] + m[..., 2, 1]) / (4 * y_),
                    (m[..., 0, 2] - m[..., 2, 0]) / (4 * y_),
                ],
                -1,
            ),
            jnp.stack(
                [
                    (m[..., 0, 2] + m[..., 2, 0]) / (4 * z_),
                    (m[..., 1, 2] + m[..., 2, 1]) / (4 * z_),
                    z_,
                    (m[..., 1, 0] - m[..., 0, 1]) / (4 * z_),
                ],
                -1,
            ),
        ],
        axis=-2,
    )  # [..., 4 candidates, 4]
    pick = jnp.argmax(
        jnp.stack([tr, m00, m11, m22], -1), axis=-1
    )  # [...]
    out = jnp.take_along_axis(
        cand, pick[..., None, None].repeat(4, -1), axis=-2
    )[..., 0, :]
    return quat_normalize(out)


def compose_transformation(
    pos1: jnp.ndarray, quat1: jnp.ndarray,
    pos2: jnp.ndarray, quat2: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """T1 * T2 (reference ``th_compose_transformation``)."""
    return pos1 + quat_rotate(quat1, pos2), quat_mul(quat1, quat2)


def invert_transformation(
    pos: jnp.ndarray, quat: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    qi = quat_conjugate(quat)
    return -quat_rotate(qi, pos), qi


def transform_points(
    pos: jnp.ndarray, quat: jnp.ndarray, pts: jnp.ndarray
) -> jnp.ndarray:
    return quat_rotate(quat[..., None, :], pts) + pos[..., None, :]
