"""Robust-cost tests mirroring tests/testRobust.cpp: planted-outlier GNC."""

import numpy as np
import pytest

from dcora_tpu.core import manifold
from dcora_tpu.core.robust import RobustCost, chi2inv
from dcora_tpu.measurements import RelativePosePoseMeasurement
from dcora_tpu.solvers import (
    SolveRobustPGOParams,
    robust_single_rotation_averaging,
    single_rotation_averaging,
    solve_robust_pgo,
)
from dcora_tpu.types import ROptParameters, RobustCostParameters, RobustCostType
from dcora_tpu.utils.rotations import angular_to_chordal_so3


def random_rotation(rng, d=3, max_angle=np.pi):
    import jax.numpy as jnp

    A = rng.standard_normal((d, d))
    return np.asarray(manifold.rotation_project(jnp.asarray(A)))


def small_rotation(rng, base, max_angle_deg):
    # perturb base by a rotation of bounded angle
    axis = rng.standard_normal(3)
    axis /= np.linalg.norm(axis)
    angle = np.deg2rad(rng.uniform(0, max_angle_deg))
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
         [-axis[1], axis[0], 0]]
    )
    dR = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K
    return base @ dR


def test_gnc_rotation_averaging_identifies_inliers():
    """10 inliers near a base rotation + 40 far outliers -> exact inlier set
    (reference: testRobust.cpp:44-75)."""
    rng = np.random.default_rng(0)
    base = random_rotation(rng)
    RVec = [small_rotation(rng, base, 5.0) for _ in range(10)]
    # outliers at least ~60 degrees away
    outliers = []
    while len(outliers) < 40:
        R = random_rotation(rng)
        ang = np.degrees(
            np.arccos(np.clip((np.trace(base.T @ R) - 1) / 2, -1, 1))
        )
        if ang > 60:
            outliers.append(R)
    RVec += outliers
    thresh = angular_to_chordal_so3(np.deg2rad(30))
    ROpt, inliers = robust_single_rotation_averaging(
        RVec, np.ones(len(RVec)), thresh
    )
    assert sorted(inliers) == list(range(10)), inliers
    # estimate close to base
    ang = np.degrees(
        np.arccos(np.clip((np.trace(base.T @ ROpt) - 1) / 2, -1, 1))
    )
    assert ang < 10


def test_gnc_weight_function_limits():
    p = RobustCostParameters(costType=RobustCostType.GNC_TLS, GNCBarc=5.0,
                             GNCInitMu=0.5)
    cost = RobustCost(p)
    # r^2 <= mu/(mu+1) barc^2 -> 1 ; r^2 >= (mu+1)/mu barc^2 -> 0
    lo = np.sqrt(0.5 / 1.5) * 5.0 - 1e-9
    hi = np.sqrt(1.5 / 0.5) * 5.0 + 1e-9
    assert cost.weight(lo) == 1.0
    assert cost.weight(hi) == 0.0
    mid = cost.weight(5.0)
    assert 0.0 < mid < 1.0


def test_other_robust_weights():
    p = RobustCostParameters(costType=RobustCostType.Huber, HuberThreshold=3)
    assert RobustCost(p).weight(1.0) == 1.0
    assert np.isclose(RobustCost(p).weight(6.0), 0.5)
    p = RobustCostParameters(costType=RobustCostType.TLS, TLSThreshold=10)
    assert RobustCost(p).weight(9.9) == 1.0
    assert RobustCost(p).weight(10.1) == 0.0
    p = RobustCostParameters(costType=RobustCostType.GM)
    assert np.isclose(RobustCost(p).weight(1.0), 0.25)
    p = RobustCostParameters(costType=RobustCostType.L1)
    assert np.isclose(RobustCost(p).weight(4.0), 0.25)


def test_chi2inv_against_sampling():
    """chi2inv quantile consistent with sampled chi-squared
    (reference: testUtils.cpp:136-152)."""
    rng = np.random.default_rng(1)
    dof = 6
    samples = rng.chisquare(dof, 200000)
    for q in (0.5, 0.9, 0.99):
        thresh = chi2inv(q, dof)
        frac = np.mean(samples < thresh)
        assert abs(frac - q) < 0.01, (q, frac)


def _planted_outlier_problem(rng, n=12, num_inlier_lc=4, num_outlier_lc=4):
    """Circular trajectory with odometry + inlier/outlier loop closures
    (reference: testRobust.cpp:228-309 style)."""
    import jax.numpy as jnp

    d = 3
    # ground truth: random walk
    T = np.zeros((n, d, d + 1))
    T[0, :, :d] = np.eye(d)
    for i in range(1, n):
        T[i, :, :d] = small_rotation(rng, T[i - 1, :, :d], 20.0)
        T[i, :, d] = T[i - 1, :, d] + rng.standard_normal(d)

    def rel(i, j):
        Ri, ti = T[i, :, :d], T[i, :, d]
        Rj, tj = T[j, :, :d], T[j, :, d]
        return Ri.T @ Rj, Ri.T @ (tj - ti)

    ms = []
    for i in range(n - 1):
        R, t = rel(i, i + 1)
        ms.append(
            RelativePosePoseMeasurement(
                0, i, 0, i + 1, R, t, 100.0, 100.0, fixedWeight=True
            )
        )
    inlier_edges, outlier_edges = [], []
    pairs = set()
    while len(inlier_edges) < num_inlier_lc:
        i, j = sorted(rng.choice(n, 2, replace=False))
        if j - i < 2 or (i, j) in pairs:
            continue
        pairs.add((i, j))
        R, t = rel(i, j)
        m = RelativePosePoseMeasurement(0, int(i), 0, int(j), R, t,
                                        100.0, 100.0)
        ms.append(m)
        inlier_edges.append(m)
    while len(outlier_edges) < num_outlier_lc:
        i, j = sorted(rng.choice(n, 2, replace=False))
        if j - i < 2 or (i, j) in pairs:
            continue
        pairs.add((i, j))
        R = random_rotation(rng)
        t = rng.uniform(-20, 20, size=3)
        m = RelativePosePoseMeasurement(0, int(i), 0, int(j), R, t,
                                        100.0, 100.0)
        ms.append(m)
        outlier_edges.append(m)
    return ms, inlier_edges, outlier_edges


def test_solve_robust_pgo_classifies_planted_outliers():
    """End-to-end GNC: inlier weights -> 1, outlier weights -> 0
    (reference: testRobust.cpp:228-309)."""
    rng = np.random.default_rng(3)
    ms, inliers, outliers = _planted_outlier_problem(rng)
    params = SolveRobustPGOParams(
        opt_params=ROptParameters(gradnorm_tol=1e-3, RTR_iterations=50),
        robust_params=RobustCostParameters(costType=RobustCostType.GNC_TLS),
    )
    solve_robust_pgo(ms, params)
    for m in inliers:
        assert m.weight > 1 - 1e-6, m.weight
    for m in outliers:
        assert m.weight < 1e-6, m.weight


def test_corrupt_benchmark_gnc_classification(data_dir):
    """GNC on a real benchmark with planted gross outliers (BASELINE.json
    config 4 at reduced scale): corrupt smallGrid3D with 15% random-pair
    loop closures, run solve_robust_pgo, require exact classification of
    the planted set (testRobust.cpp:228-309 pattern at dataset scale)."""
    from dcora_tpu.datasets import corrupt_with_outliers, write_g2o
    from dcora_tpu.io import read_g2o_file

    ds = read_g2o_file(f"{data_dir}/smallGrid3D.g2o")
    corrupted, outlier_keys = corrupt_with_outliers(
        ds.pose_pose_measurements, frac=0.15, seed=7
    )
    assert len(outlier_keys) >= 10
    params = SolveRobustPGOParams(
        opt_params=ROptParameters(gradnorm_tol=1.0, RTR_iterations=20),
        robust_params=RobustCostParameters(
            costType=RobustCostType.GNC_TLS, GNCBarc=5.0
        ),
    )
    solve_robust_pgo(corrupted, params)
    tp = fp = fn = 0
    for m in corrupted:
        if m.fixedWeight:
            continue
        rejected = m.weight < 1e-6
        if (m.p1, m.p2) in outlier_keys:
            tp += rejected
            fn += not rejected
        else:
            fp += rejected
    # every planted outlier rejected; no genuine loop closure rejected
    assert fn == 0, f"missed {fn} planted outliers"
    assert fp == 0, f"rejected {fp} genuine loop closures"
    assert tp == len(outlier_keys)

    # the writer round-trips (kappa, tau, R, t) through the parser
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        p = f"{td}/corrupted.g2o"
        write_g2o(p, corrupted, ds.dim)
        ds2 = read_g2o_file(p)
        assert len(ds2.pose_pose_measurements) == len(corrupted)
        for a, b in zip(corrupted, ds2.pose_pose_measurements):
            assert abs(a.kappa - b.kappa) <= 1e-6 * abs(a.kappa)
            assert abs(a.tau - b.tau) <= 1e-6 * abs(a.tau)
            assert np.abs(np.asarray(a.R) - np.asarray(b.R)).max() < 1e-9
            assert np.abs(np.asarray(a.t) - np.asarray(b.t)).max() < 1e-9
