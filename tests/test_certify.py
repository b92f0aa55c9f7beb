"""Certification tests: Lanczos vs dense eig oracle, staircase e2e."""

import jax.numpy as jnp
import numpy as np
import pytest

from dcora_tpu.core import certify, lifted, manifold, problem as prob
from dcora_tpu.core.graph import LocalGraph
from dcora_tpu.io import read_g2o_file
from dcora_tpu.staircase import riemannian_staircase
from dcora_tpu.types import ProblemDims, ROptParameters


def _dense_S(P, X):
    """Dense S = Q - Lambda via the engine's own operator on a basis."""
    C = certify.dual_certificate_blocks(P, X)
    dims = X.dims
    k = dims.k
    E = lifted.from_flat(jnp.eye(k), dims)
    S = np.asarray(lifted.to_flat(certify.apply_S(P, C, E)))
    return S


def test_lanczos_matches_dense_min_eig(data_dir):
    ds = read_g2o_file(f"{data_dir}/tinyGrid3D.g2o")
    g = LocalGraph(0, 5, 3)
    g.set_measurements(ds.pose_pose_measurements)
    P = g.problem_data()
    import jax.random as jr

    X = manifold.random_state(jr.PRNGKey(2), ProblemDims(3, g.n), 5)
    C = certify.dual_certificate_blocks(P, X)
    S = _dense_S(P, X)
    np.testing.assert_allclose(S, S.T, atol=1e-9)
    evals = np.linalg.eigvalsh(0.5 * (S + S.T))
    lam_min, v, resid = certify.minimum_eigen_pair(
        P, C, X.dims, num_lanczos=min(100, X.dims.k)
    )
    np.testing.assert_allclose(lam_min, evals[0], rtol=1e-6, atol=1e-8)


def test_certified_at_global_optimum_noiseless(data_dir):
    """A noiseless dataset's ground truth is the global optimum; the dual
    certificate must be PSD there (reference test strategy, testAgent)."""
    ds = read_g2o_file(
        f"{data_dir}/pose_graph_optimization_test_3d.g2o"
    )
    g = LocalGraph(0, 3, 3)
    g.set_measurements(ds.pose_pose_measurements)
    P = g.problem_data()
    T = np.stack(
        [np.asarray(ds.ground_truth_poses[k])
         for k in sorted(ds.ground_truth_poses)]
    )
    X = lifted.from_pose_array(T)
    f = float(prob.cost(P, X))
    assert f < 1e-9, f"dataset not noiseless: f={f}"
    is_psd, theta, v = certify.fast_verification(P, X, eta=1e-4)
    assert is_psd


def test_staircase_certifies_small_grid(data_dir):
    ds = read_g2o_file(f"{data_dir}/smallGrid3D.g2o")
    g = LocalGraph(0, 5, 3)
    g.set_measurements(ds.pose_pose_measurements)

    from dcora_tpu.core.init import chordal_initialization

    T = chordal_initialization(ds.pose_pose_measurements)
    X0 = lifted.pad_rank(lifted.from_pose_array(T), 5)
    res = riemannian_staircase(
        g, X0, r_min=5, r_max=10,
        opt_params=ROptParameters(
            gradnorm_tol=1e-4, RTR_iterations=200, RTR_tCG_iterations=200
        ),
        min_eig_num_tol=1e-3,
    )
    assert res.certified, f"not certified, min eigs: {res.min_eig_history}"
    # rounded solution feasible and close in cost to the relaxation optimum
    assert float(manifold.manifold_error(res.rounded)) < 1e-9
    P = g.problem_data()
    f_rounded = float(prob.cost(P, res.rounded))
    assert f_rounded >= res.f_final - 1e-6
    assert f_rounded <= res.f_final * 1.01 + 1e-6


def test_round_solution_recovers_rank_d():
    import jax.random as jr

    dims = ProblemDims(3, 5, 4, 2)
    Xd = manifold.random_state(jr.PRNGKey(0), dims, 3)
    # rotation blocks must be proper rotations (det +1) for rounding to be
    # exact; mixed-determinant Stiefel blocks are legitimately altered
    Xd = Xd._replace(rot=manifold.rotation_project(Xd.rot))
    # lift with a Stiefel matrix: rounding must recover it up to rotation
    Y = manifold.fixed_lifting_matrix(7, 3)
    X = lifted.lift(Xd, Y)
    rounded = certify.round_solution(X)
    assert float(manifold.manifold_error(rounded)) < 1e-9
    # cost-relevant invariants: inner products between blocks preserved
    f1 = lifted.to_flat(Xd)
    f2 = lifted.to_flat(rounded)
    np.testing.assert_allclose(
        np.asarray(f1.T @ f1), np.asarray(f2.T @ f2), atol=1e-8
    )


def test_tiled_lanczos_matches_dense_min_eig(data_dir):
    """The flat tiled S operator (f64 tiles) reproduces the dense minimum
    eigenvalue, and the f32 path steers fast_verification correctly."""
    from dcora_tpu.core import tiled

    ds = read_g2o_file(f"{data_dir}/tinyGrid3D.g2o")
    g = LocalGraph(0, 5, 3)
    g.set_measurements(ds.pose_pose_measurements)
    P = g.problem_data()
    import jax.random as jr

    X = manifold.random_state(jr.PRNGKey(2), ProblemDims(3, g.n), 5)
    S = _dense_S(P, X)
    lam_ref = float(np.linalg.eigvalsh(0.5 * (S + S.T)).min())

    TP64 = tiled.build_tiled(P, g.dims, T=32, dtype=np.float64)
    lam, v = certify.minimum_eigen_pair_tiled(TP64, X, num_lanczos=60)
    np.testing.assert_allclose(lam, lam_ref, rtol=1e-6, atol=1e-8)
    # returned eigenvector is in the RA flat basis
    Sv = S @ v / np.linalg.norm(v)
    np.testing.assert_allclose(
        float(v / np.linalg.norm(v) @ Sv), lam_ref, rtol=1e-5, atol=1e-6
    )

    # f32 tiles: fast_verification must reach the same PSD verdict as the
    # exact path at a random (saddle) point and at the optimum
    TP32 = tiled.build_tiled(P, g.dims, T=32, dtype=np.float32)
    is_psd, theta, vv = certify.fast_verification(P, X, 1e-3, 60, TP=TP32)
    is_psd_ref, theta_ref, _ = certify.fast_verification(P, X, 1e-3, 60)
    assert is_psd == is_psd_ref
    if not is_psd:
        assert theta < 0
        np.testing.assert_allclose(theta, theta_ref, rtol=0.2)


def test_inertia_proof_is_final_and_bracketed():
    """An LDL^T inertia proof of indefiniteness must never be overridden
    by an eigen estimate (tiers.pyfg regression: a spectrum-shifted ARPACK
    run 'converged' in B-space to a clustered mix with Rayleigh +0.013
    while lambda_min = -7.7e-3, and falsely certified the rank)."""
    import scipy.sparse as sp

    from dcora_tpu.core.certify import (
        _inertia_bracket_min_eig,
        ldl_psd_proof,
    )

    rng = np.random.default_rng(3)
    k = 400
    # spectrum: one decisively negative eigenvalue below -eta, a cluster
    # of near-zeros, and a large positive bulk (the tiers shape)
    eigs = np.concatenate([
        [-3.2e-3], rng.uniform(-1e-8, 1e-8, 20),
        rng.uniform(1.0, 1e4, k - 21),
    ])
    Qr, _ = np.linalg.qr(rng.standard_normal((k, k)))
    S = sp.csr_matrix(Qr @ np.diag(eigs) @ Qr.T)
    eta = 1e-4

    assert ldl_psd_proof(S + eta * sp.identity(k, format="csc")) is False
    lo, hi = _inertia_bracket_min_eig(S, eta)
    assert lo <= 3.2e-3 <= hi * (1 + 1e-9)
    assert hi <= 3.2e-3 * 4  # bracket is tight, not a doubling overshoot


def test_escape_from_floor_converged_saddle_gives_theta_scale_decrease(
        data_dir):
    """Regression for the tiers.pyfg rank-2 escape failure: at an iterate
    converged only to its solver floor (gradnorm ~1e-3), the second-order
    alpha heuristic (100*gtol/|theta| ~ 1e-5) yields a curvature gain of
    0.5*|theta|*alpha^2 ~ 1e-9 — below the constant retraction-projection
    offset of the cost evaluation, so every line-search trial read as an
    increase and a decisively negative direction (theta=-4.7) was
    rejected.  The fix backtracks from alpha >= 1, where the decrease is
    O(|theta|).  This asserts the decrease MAGNITUDE, which the old
    heuristic could not deliver even when it nominally succeeded."""
    from dcora_tpu.io import read_pyfg_file
    from dcora_tpu.io.remap import get_global_measurements
    from dcora_tpu.types import GraphType

    ds = read_pyfg_file(f"{data_dir}/range_aided_slam_test_2d.pyfg")
    gm = get_global_measurements(ds)
    d = ds.dim
    g = LocalGraph(0, d, d, GraphType.RangeAidedSLAMGraph)
    g.set_measurements(gm.relative_measurements)
    P = g.problem_data()

    # force a rank-d critical point (r_max=d stops at the rank cap);
    # the rank-2 relaxation of this dataset is a saddle (the recorded
    # parity staircase certifies at rank 3)
    import jax.random as jr

    X0 = manifold.random_state(jr.PRNGKey(0), g.dims, d)
    res = riemannian_staircase(
        g, X0, r_min=d, r_max=d,
        opt_params=ROptParameters(
            gradnorm_tol=1e-3, RTR_iterations=200,
            RTR_tCG_iterations=200,
        ),
        min_eig_num_tol=1e-4,
    )
    assert not res.certified
    is_psd, theta, v = certify.fast_verification(P, res.X, 1e-4, 100)
    assert is_psd is False and theta < -1e-3

    ok, X_next = certify.escape_saddle(
        P, res.X, theta, v, d + 1, is_second_order=True)
    assert ok
    G = lifted.zeros(g.dims, d + 1)
    f_before = float(prob.cost(P, lifted.pad_rank(res.X, d + 1), G))
    f_after = float(prob.cost(P, X_next, G))
    # decrease must be of curvature scale, not noise scale: alpha >= 1
    # trials give ~0.5*|theta| (the old heuristic topped out ~1e-9)
    assert f_before - f_after >= 0.05 * abs(theta)
