"""Independent-verifier policy tests (dcora_tpu/verification.py).

The verifier certifies EXCLUSIVELY through the LDL^T inertia proof;
eigensolver output is diagnostic.  These tests pin the false-certification
class observed on tiers.pyfg: at a rank-r critical point S = Q - Lambda(X)
carries an r-dimensional near-zero cluster, and a shift-invert solve with
sigma just below zero converges to a cluster eigenpair with tiny residual
while the true lambda_min sits decisively below -eta.
"""

import numpy as np
import scipy.sparse as sp

from dcora_tpu import verification as V
from dcora_tpu.core import lifted, manifold
from dcora_tpu.io import read_g2o_file
from dcora_tpu.types import ProblemDims


def _cluster_saddle_S(k=400, lam_min=-7.7e-3, n_cluster=20, seed=3):
    """The tiers spectral shape: one negative eigenvalue below -eta, a
    near-zero cluster, and a large positive bulk."""
    rng = np.random.default_rng(seed)
    eigs = np.concatenate([
        [lam_min], rng.uniform(-1e-9, 1e-9, n_cluster),
        rng.uniform(1.0, 1e4, k - n_cluster - 1),
    ])
    Qr, _ = np.linalg.qr(rng.standard_normal((k, k)))
    return sp.csr_matrix(Qr @ np.diag(eigs) @ Qr.T)


def test_min_eig_quick_path_rejects_cluster_pair():
    """certificate_min_eig's shift-invert quick path must not report a
    cluster eigenvalue as the bottom when lambda_min lies below sigma:
    the inertia floor-proof of S - sigma*I fails, forcing the shifted
    Lanczos, which finds the true negative eigenvalue."""
    S = _cluster_saddle_S()
    theta, resid = V.certificate_min_eig(None, None, 0, 0, 3,
                                         tol=1e-4, S=S)
    # the unsound quick path returned theta ~ -1e-7 here; the true bottom
    # is -7.7e-3 and any sound diagnostic must land at or below -eta
    assert theta < -1e-3, theta


def test_min_eig_quick_path_accepts_proven_floor():
    """When nothing lies below sigma the quick path is sound (the inertia
    floor-proof passes) and returns the true bottom fast."""
    rng = np.random.default_rng(0)
    k = 300
    eigs = np.concatenate([
        rng.uniform(-5e-5, 5e-5, 10), rng.uniform(1.0, 1e3, k - 10),
    ])
    Qr, _ = np.linalg.qr(rng.standard_normal((k, k)))
    S = sp.csr_matrix(Qr @ np.diag(eigs) @ Qr.T)
    theta, resid = V.certificate_min_eig(None, None, 0, 0, 3,
                                         tol=1e-4, S=S)
    assert abs(theta - eigs.min()) < 1e-7
    assert resid < 1e-8


def test_verify_solution_certifies_only_via_ldl(data_dir):
    """At a noiseless dataset's ground truth the verdict must be
    certified WITH a True LDL^T witness (never a bare eigenpair)."""
    ds = read_g2o_file(
        f"{data_dir}/pose_graph_optimization_test_3d.g2o"
    )
    T = np.stack([np.asarray(ds.ground_truth_poses[key])
                  for key in sorted(ds.ground_truth_poses)])
    X = lifted.from_pose_array(T)
    rep = V.verify_solution(ds.pose_pose_measurements, X, 3, eta=1e-4)
    assert rep["certified_indep"] is True
    assert rep["psd_proof_indep"] is True  # the only certification basis
    assert rep["gradnorm_indep"] < 1e-6


def test_verify_solution_fails_closed_at_noncritical_point(data_dir):
    """A random state is nowhere near optimal: the LDL proof must come
    back False and the reported min-eig must prove lambda_min < -eta."""
    import jax.random as jr

    ds = read_g2o_file(
        f"{data_dir}/pose_graph_optimization_test_3d.g2o"
    )
    n = len(ds.ground_truth_poses)
    X = manifold.random_state(jr.PRNGKey(0), ProblemDims(3, n), 3)
    rep = V.verify_solution(ds.pose_pose_measurements, X, 3, eta=1e-4)
    assert rep["certified_indep"] is False
    assert rep["psd_proof_indep"] is False
    assert rep["min_eig_indep"] < -1e-4
