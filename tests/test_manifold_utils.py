"""Manifold/utility tests mirroring tests/testUtils.cpp and
tests/testManifold.cpp: generator determinism, projection invariants,
layout round-trips, tangent-space properties, frame alignment."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcora_tpu.core import lifted, manifold
from dcora_tpu.core.lifted import (
    RAState,
    from_flat,
    from_se_matrix,
    to_flat,
    to_se_matrix,
    pose_identity,
    pose_inverse,
    pose_multiply,
)
from dcora_tpu.types import ProblemDims


def test_fixed_lifting_matrix_deterministic():
    A = manifold.fixed_lifting_matrix(7, 3)
    B = manifold.fixed_lifting_matrix(7, 3)
    np.testing.assert_array_equal(np.asarray(A), np.asarray(B))
    assert float(manifold.stiefel_error(A[None])) < 1e-12


@pytest.mark.parametrize("r,d", [(3, 3), (5, 3), (4, 2)])
def test_stiefel_projection_invariants(r, d):
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (10, r, d), dtype=jnp.float64)
    Y = manifold.stiefel_project(A)
    assert float(manifold.stiefel_error(Y)) < 1e-10
    # projection of a Stiefel point is itself
    Y2 = manifold.stiefel_project(Y)
    np.testing.assert_allclose(np.asarray(Y), np.asarray(Y2), atol=1e-10)


def test_rotation_projection_det():
    key = jax.random.PRNGKey(1)
    A = jax.random.normal(key, (20, 3, 3), dtype=jnp.float64)
    R = manifold.rotation_project(A)
    dets = np.linalg.det(np.asarray(R))
    np.testing.assert_allclose(dets, 1.0, atol=1e-10)


def test_se_layout_round_trip():
    dims = ProblemDims(3, 6)
    X = manifold.random_state(jax.random.PRNGKey(2), dims, 5)
    M = to_se_matrix(X)
    X2 = from_se_matrix(M, 3)
    np.testing.assert_allclose(np.asarray(X.rot), np.asarray(X2.rot))
    np.testing.assert_allclose(np.asarray(X.trn), np.asarray(X2.trn))


def test_ra_flat_round_trip():
    dims = ProblemDims(3, 4, 5, 2)
    X = manifold.random_state(jax.random.PRNGKey(3), dims, 6)
    M = to_flat(X)
    assert M.shape == (6, dims.k)
    X2 = from_flat(M, dims)
    for a, b in zip(jax.tree.leaves(X), jax.tree.leaves(X2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("l,b", [(0, 0), (3, 0), (0, 2), (4, 3)])
def test_tangent_projection_properties(l, b):  # noqa: E741
    """P is idempotent and tangent vectors satisfy the manifold's linearized
    constraints (reference: testManifold.cpp:354-440 cross-checks)."""
    dims = ProblemDims(3, 5, l, b)
    key = jax.random.PRNGKey(4)
    X = manifold.random_state(key, dims, 6)
    V = manifold.random_state(jax.random.fold_in(key, 1), dims, 6)
    V = RAState(rot=V.rot, sph=V.sph, trn=V.trn)  # arbitrary ambient
    T1 = manifold.tangent_project(X, V)
    T2 = manifold.tangent_project(X, T1)
    for a, b2 in zip(jax.tree.leaves(T1), jax.tree.leaves(T2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   atol=1e-10)
    # Stiefel tangency: Y^T V + V^T Y = 0
    S = np.einsum("nri,nrj->nij", np.asarray(X.rot), np.asarray(T1.rot))
    np.testing.assert_allclose(S + np.swapaxes(S, 1, 2), 0, atol=1e-10)
    # oblique tangency: <s, v> = 0
    if l:
        ip = np.sum(np.asarray(X.sph) * np.asarray(T1.sph), axis=1)
        np.testing.assert_allclose(ip, 0, atol=1e-10)


def test_retraction_first_order():
    """retract(X, tV) = X + tV + O(t^2) along tangent directions."""
    dims = ProblemDims(3, 4, 3, 1)
    key = jax.random.PRNGKey(5)
    X = manifold.random_state(key, dims, 5)
    V = manifold.tangent_project(
        X, manifold.random_state(jax.random.fold_in(key, 1), dims, 5)
    )
    for t in (1e-4, 1e-5):
        Xt = manifold.retract(X, V.scale(t))
        lin = X + V.scale(t)
        err = float((Xt - lin).norm())
        assert err < 10 * t * t * float(V.norm()) ** 2, (t, err)


def test_pose_group_ops():
    """SE(d) inverse/multiply randomized trials
    (reference: testElements.cpp:221-246)."""
    rng = np.random.default_rng(0)
    for _ in range(50):
        A = np.zeros((3, 4))
        A[:, :3] = np.asarray(
            manifold.rotation_project(
                jnp.asarray(rng.standard_normal((3, 3)))
            )
        )
        A[:, 3] = rng.standard_normal(3)
        Ainv = pose_inverse(A)
        I = pose_multiply(A, Ainv)
        np.testing.assert_allclose(I, pose_identity(3), atol=1e-12)


def test_lift_preserves_cost_geometry():
    """Lifting with a Stiefel matrix preserves the Gram matrix X^T X
    (the cost depends on X only through it)."""
    dims = ProblemDims(2, 4, 2, 1)
    X = manifold.random_state(jax.random.PRNGKey(6), dims, 2)
    Y = manifold.fixed_lifting_matrix(6, 2)
    XL = lifted.lift(X, Y)
    G1 = np.asarray(to_flat(X)).T @ np.asarray(to_flat(X))
    G2 = np.asarray(to_flat(XL)).T @ np.asarray(to_flat(XL))
    np.testing.assert_allclose(G1, G2, atol=1e-10)
    assert float(manifold.manifold_error(XL)) < 1e-10


def test_pad_truncate_rank():
    dims = ProblemDims(3, 3, 2, 1)
    X = manifold.random_state(jax.random.PRNGKey(7), dims, 3)
    Xp = lifted.pad_rank(X, 7)
    assert Xp.r == 7
    np.testing.assert_allclose(np.asarray(Xp.rot[:, 3:, :]), 0)
    Xt = lifted.truncate_rank(Xp, 3)
    np.testing.assert_allclose(np.asarray(Xt.rot), np.asarray(X.rot))
