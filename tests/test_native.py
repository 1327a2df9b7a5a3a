"""Native C++ layer tests: Panda FK sanity, IK round-trips against FK,
gen_ik free-joint sampling, and the C++ SAT oracle vs. the JAX checker."""

import numpy as np
import pytest

from diffusion_ccsp_tpu.native import PandaKinematics, convex_collisions


@pytest.fixture(scope="module")
def kin():
    return PandaKinematics()


def test_fk_home_pose(kin):
    """FK at a reference configuration: known Panda 'ready' pose has the
    flange roughly in front of the base at ~0.5m height range."""
    q = np.array([0, -0.785, 0, -2.356, 0, 1.571, 0.785])
    pose = kin.fk(q)
    pos = pose[:3, 3]
    # ready pose: x ~ 0.3, z ~ 0.5-0.7 (FCI documentation neighborhood)
    assert 0.2 < pos[0] < 0.5, pos
    assert abs(pos[1]) < 0.1, pos
    assert 0.3 < pos[2] < 0.9, pos
    # rotation is orthonormal
    r = pose[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)


def test_ik_roundtrip(kin):
    """IK(FK(q)) must reach the same pose."""
    rng = np.random.default_rng(0)
    hits = 0
    for _ in range(10):
        q = rng.uniform(kin.lower * 0.7, kin.upper * 0.7)
        target = kin.fk(q)
        sol = kin.ik(target, q7=q[6], seed=q + rng.normal(0, 0.2, 7))
        if sol is None:
            continue
        pose = kin.fk(sol)
        np.testing.assert_allclose(pose[:3, 3], target[:3, 3], atol=1e-4)
        np.testing.assert_allclose(pose[:3, :3], target[:3, :3], atol=1e-3)
        assert abs(sol[6] - q[6]) < 1e-9  # free joint pinned
        hits += 1
    assert hits >= 8, f"only {hits}/10 IK round-trips succeeded"


def test_gen_ik_finds_solutions(kin):
    rng = np.random.default_rng(1)
    q = rng.uniform(kin.lower * 0.5, kin.upper * 0.5)
    target = kin.fk(q)
    sols = kin.gen_ik(target, rng=rng)
    assert len(sols) >= 1
    for s in sols:
        pose = kin.fk(s)
        np.testing.assert_allclose(pose[:3, 3], target[:3, 3], atol=1e-4)
        assert np.all(s >= kin.lower - 1e-6) and np.all(s <= kin.upper + 1e-6)


def test_cpp_sat_matches_jax():
    import jax.numpy as jnp

    from diffusion_ccsp_tpu.ops.geometry2d import convex_overlap, rect_corners

    rng = np.random.default_rng(2)
    polys = []
    for _ in range(8):
        c = rng.uniform(-1, 1, 2)
        e = rng.uniform(0.3, 1.0, 2)
        y = rng.uniform(-np.pi, np.pi)
        polys.append(
            np.asarray(rect_corners(jnp.asarray(c), jnp.asarray(e), jnp.asarray(y)))
        )
    cpp = convex_collisions(polys)
    for i in range(8):
        for j in range(8):
            if i == j:
                continue
            jx = bool(
                convex_overlap(jnp.asarray(polys[i]), jnp.asarray(polys[j]))
            )
            assert cpp[i, j] == jx, (i, j)


def test_ik_coverage_random_reachable_poses():
    """IK completeness property (SURVEY parity with analytical ikfast):
    for random in-limit q, FK(q) -> gen_ik must recover at least one solution
    whose FK matches the target to < 1e-4, with a high success rate."""
    import numpy as np

    from diffusion_ccsp_tpu.native import PandaKinematics

    kin = PandaKinematics()
    rng = np.random.default_rng(42)
    n = 60
    hits = 0
    branch_counts = []
    for _ in range(n):
        q = rng.uniform(kin.lower * 0.9, kin.upper * 0.9)
        target = kin.fk(q)
        sols = kin.gen_ik(target, rng=rng)
        branch_counts.append(len(sols))
        ok = False
        for s in sols:
            err = np.abs(kin.fk(s) - target).max()
            if err < 1e-4:
                ok = True
            # every returned solution must respect the joint limits
            assert (s >= kin.lower - 1e-9).all()
            assert (s <= kin.upper + 1e-9).all()
        hits += ok
    rate = hits / n
    assert rate >= 0.98, f"IK recovery rate {rate:.2f} (branches {branch_counts})"
    # the Panda's self-motion manifold admits multiple branches for generic
    # poses; the solver must find more than one on average
    assert np.mean(branch_counts) > 1.5
