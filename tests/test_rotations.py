"""Quaternion / SE(3) algebra (reference rotation_utils(+_torch))."""

import numpy as np
import jax
import jax.numpy as jnp

from diffusion_ccsp_tpu.ops.rotations import (
    compose_transformation,
    invert_transformation,
    matrix_to_quat,
    quat_conjugate,
    quat_from_euler,
    quat_from_yaw,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_matrix,
    transform_points,
)


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return np.asarray(quat_normalize(jnp.asarray(q)))


def test_quat_mul_identity_and_inverse():
    rng = np.random.default_rng(0)
    q = jnp.asarray(random_quats(rng, 16))
    ident = jnp.broadcast_to(jnp.asarray([0.0, 0, 0, 1.0]), q.shape)
    assert np.allclose(quat_mul(q, ident), q, atol=1e-6)
    prod = quat_mul(q, quat_conjugate(q))
    assert np.allclose(np.abs(prod[:, 3]), 1.0, atol=1e-5)
    assert np.allclose(prod[:, :3], 0.0, atol=1e-5)


def test_rotate_matches_matrix():
    rng = np.random.default_rng(1)
    q = jnp.asarray(random_quats(rng, 32))
    v = jnp.asarray(rng.normal(size=(32, 3)))
    r1 = quat_rotate(q, v)
    r2 = jnp.einsum("nij,nj->ni", quat_to_matrix(q), v)
    assert np.allclose(r1, r2, atol=1e-5)


def test_matrix_quat_roundtrip():
    rng = np.random.default_rng(2)
    q = jnp.asarray(random_quats(rng, 64))
    q2 = matrix_to_quat(quat_to_matrix(q))
    # q and -q are the same rotation
    dot = np.abs(np.sum(np.asarray(q) * np.asarray(q2), axis=-1))
    assert np.allclose(dot, 1.0, atol=1e-5)


def test_yaw_and_euler():
    yaw = jnp.asarray([0.3, -1.2])
    q = quat_from_yaw(yaw)
    v = jnp.asarray([[1.0, 0.0, 0.0]] * 2)
    out = quat_rotate(q, v)
    expect = np.stack([np.cos(np.asarray(yaw)), np.sin(np.asarray(yaw)),
                       np.zeros(2)], -1)
    assert np.allclose(out, expect, atol=1e-6)
    q2 = quat_from_euler(jnp.zeros(2), jnp.zeros(2), yaw)
    assert np.allclose(q, q2, atol=1e-6)


def test_compose_invert_transform():
    rng = np.random.default_rng(3)
    p1 = jnp.asarray(rng.normal(size=(8, 3)))
    q1 = jnp.asarray(random_quats(rng, 8))
    p2 = jnp.asarray(rng.normal(size=(8, 3)))
    q2 = jnp.asarray(random_quats(rng, 8))
    pc, qc = compose_transformation(p1, q1, p2, q2)
    pi, qi = invert_transformation(p1, q1)
    pr, qr = compose_transformation(pi, qi, pc, qc)
    assert np.allclose(pr, p2, atol=1e-5)
    dot = np.abs(np.sum(np.asarray(qr) * np.asarray(q2), axis=-1))
    assert np.allclose(dot, 1.0, atol=1e-5)


def test_transform_points_jit_vmap():
    rng = np.random.default_rng(4)
    p = jnp.asarray(rng.normal(size=(4, 3)))
    q = jnp.asarray(random_quats(rng, 4))
    pts = jnp.asarray(rng.normal(size=(4, 5, 3)))
    out = jax.jit(transform_points)(p, q, pts)
    ref = np.stack(
        [
            np.asarray(quat_rotate(q[i], pts[i])) + np.asarray(p[i])
            for i in range(4)
        ]
    )
    assert np.allclose(out, ref, atol=1e-5)
