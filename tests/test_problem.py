"""Cost-engine correctness vs. independent dense oracles (SURVEY.md P3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcora_tpu.core import lifted, manifold
from dcora_tpu.core.graph import LocalGraph
from dcora_tpu.core import problem as prob
from dcora_tpu.io import read_g2o_file, read_pyfg_file
from dcora_tpu.measurements import (
    RangeMeasurement,
    RelativePoseLandmarkMeasurement,
    RelativePosePoseMeasurement,
)
from dcora_tpu.types import GraphType, ProblemDims, StateType

from oracles import dense_Q_pgo_se, dense_Q_ra, se_to_ra_permutation


def random_pgo_measurements(rng, n, d, extra_lcs=5):
    ms = []
    for i in range(n - 1):
        R = manifold.rotation_project(jnp.asarray(rng.standard_normal((d, d))))
        ms.append(
            RelativePosePoseMeasurement(
                0, i, 0, i + 1, np.asarray(R), rng.standard_normal(d),
                kappa=rng.uniform(1, 5), tau=rng.uniform(1, 5),
                weight=rng.uniform(0.3, 1.0),
            )
        )
    for _ in range(extra_lcs):
        i, j = rng.choice(n, 2, replace=False)
        R = manifold.rotation_project(jnp.asarray(rng.standard_normal((d, d))))
        ms.append(
            RelativePosePoseMeasurement(
                0, int(i), 0, int(j), np.asarray(R), rng.standard_normal(d),
                kappa=rng.uniform(1, 5), tau=rng.uniform(1, 5),
                weight=rng.uniform(0.3, 1.0),
            )
        )
    return ms


@pytest.mark.parametrize("d", [2, 3])
def test_apply_q_matches_dense_oracle_pgo(d):
    rng = np.random.default_rng(0)
    n, r = 7, 5
    ms = random_pgo_measurements(rng, n, d)
    g = LocalGraph(0, r, d)
    g.set_measurements(ms)
    P = g.problem_data()

    # the graph dedups repeated edges (reference: EdgeIDMap, Graph.cpp:127);
    # build the oracle from the deduped set
    Q_se = dense_Q_pgo_se(g.all_measurements(), n, d)
    perm = se_to_ra_permutation(n, d)
    Q_ra = Q_se[np.ix_(perm, perm)]

    X = manifold.random_state(jax.random.PRNGKey(1), ProblemDims(d, n), r)
    Xflat = np.asarray(lifted.to_flat(X))

    W = prob.apply_Q(P, X)
    Wflat = np.asarray(lifted.to_flat(W))
    np.testing.assert_allclose(Wflat, Xflat @ Q_ra, atol=1e-10)

    f = prob.cost(P, X)
    f_oracle = 0.5 * np.sum((Xflat @ Q_ra) * Xflat)
    np.testing.assert_allclose(float(f), f_oracle, atol=1e-10)


def make_ra_measurements(rng, d, n, l, b):  # noqa: E741
    ms = random_pgo_measurements(rng, n, d, extra_lcs=3)
    # pose-landmark
    for j in range(b):
        i = int(rng.integers(n))
        ms.append(
            RelativePoseLandmarkMeasurement(
                0, i, 0, j, rng.standard_normal(d),
                tau=rng.uniform(1, 5), weight=rng.uniform(0.3, 1.0),
            )
        )
    # ranges (sphere q)
    for q in range(l):
        if q % 2 == 0 and b > 0:
            st2, p2 = StateType.Landmark, int(rng.integers(b))
            p1 = int(rng.integers(n))
        else:
            st2 = StateType.Pose
            p1, p2 = (int(x) for x in rng.choice(n, 2, replace=False))
        ms.append(
            RangeMeasurement(
                0, p1, 0, p2, StateType.Pose, st2, l=q,
                range=float(rng.uniform(0.5, 3.0)),
                precision=float(rng.uniform(0.5, 2.0)),
                weight=rng.uniform(0.3, 1.0),
            )
        )
    return ms


@pytest.mark.parametrize("d,l,b", [(3, 6, 3), (2, 4, 0), (3, 0, 2), (2, 0, 0)])
def test_apply_q_matches_dense_oracle_ra(d, l, b):  # noqa: E741
    rng = np.random.default_rng(42)
    n, r = 6, 5
    ms = make_ra_measurements(rng, d, n, l, b)
    g = LocalGraph(0, r, d, GraphType.RangeAidedSLAMGraph)
    g.set_measurements(ms)
    assert (g.n, g.l, g.b) == (n, l, b)
    P = g.problem_data()

    mall = g.all_measurements()
    pp = [m for m in mall if isinstance(m, RelativePosePoseMeasurement)]
    pl = [m for m in mall if isinstance(m, RelativePoseLandmarkMeasurement)]
    rg = [m for m in mall if isinstance(m, RangeMeasurement)]
    Q_ra = dense_Q_ra(pp, pl, rg, n, l, b, d)

    dims = ProblemDims(d, n, l, b)
    X = manifold.random_state(jax.random.PRNGKey(3), dims, r)
    Xflat = np.asarray(lifted.to_flat(X))
    W = prob.apply_Q(P, X)
    np.testing.assert_allclose(
        np.asarray(lifted.to_flat(W)), Xflat @ Q_ra, atol=1e-10
    )


def test_distributed_linear_term_consistency():
    """Agent-local grad (apply_Q_bb + G) == restriction of the global grad.

    This validates the augmented-space formulation of G = Xc^T Qcb
    (reference: Graph.cpp:1200-1227) against the centralized problem.
    """
    rng = np.random.default_rng(7)
    d, r = 3, 5
    n0, n1 = 4, 3
    # robot 0 poses 0..3, robot 1 poses 0..2; some shared edges
    ms = []
    for rid, nn in ((0, n0), (1, n1)):
        for i in range(nn - 1):
            R = np.asarray(
                manifold.rotation_project(jnp.asarray(rng.standard_normal((d, d))))
            )
            ms.append(
                RelativePosePoseMeasurement(
                    rid, i, rid, i + 1, R, rng.standard_normal(d), 2.0, 3.0
                )
            )
    for (i, j) in [(0, 1), (2, 0), (3, 2)]:
        R = np.asarray(
            manifold.rotation_project(jnp.asarray(rng.standard_normal((d, d))))
        )
        ms.append(
            RelativePosePoseMeasurement(
                0, i, 1, j, R, rng.standard_normal(d), 1.5, 2.5
            )
        )

    # centralized graph: remap robot1 poses to global indices n0+j
    central = []
    for m in ms:
        mm = RelativePosePoseMeasurement(
            0, m.p1 + (n0 if m.r1 == 1 else 0),
            0, m.p2 + (n0 if m.r2 == 1 else 0),
            m.R, m.t, m.kappa, m.tau,
        )
        central.append(mm)
    gc = LocalGraph(0, r, d)
    gc.set_measurements(central)
    Pc = gc.problem_data()
    X = manifold.random_state(
        jax.random.PRNGKey(5), ProblemDims(d, n0 + n1), r
    )
    grad_central = prob.euclidean_gradient(Pc, X)

    # agent-0 local problem with robot-1 poses fixed from X
    g0 = LocalGraph(0, r, d)
    g0.set_measurements(ms)
    P0 = g0.problem_data()
    from dcora_tpu.types import PoseID

    pose_dict = {
        PoseID(1, j): np.asarray(X.pose(n0 + j)) for j in range(n1)
    }
    Xf, ok = g0.fixed_state(pose_dict, {}, {})
    assert ok
    X0 = lifted.RAState(rot=X.rot[:n0], sph=X.sph, trn=X.trn[:n0])
    G = prob.linear_term(P0, Xf, g0.n, g0.l, g0.n + g0.b)
    grad_local = prob.apply_Q(
        P0, prob.augment(X0, prob.zeros_like_fixed(Xf))
    )
    grad_local = prob.restrict(grad_local, g0.n, g0.l, g0.n + g0.b) + G

    np.testing.assert_allclose(
        np.asarray(grad_local.rot), np.asarray(grad_central.rot[:n0]),
        atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(grad_local.trn), np.asarray(grad_central.trn[:n0]),
        atol=1e-10,
    )


def test_cost_on_real_dataset(data_dir):
    ds = read_g2o_file(f"{data_dir}/tinyGrid3D.g2o")
    g = LocalGraph(0, 3, 3)
    g.set_measurements(ds.pose_pose_measurements)
    P = g.problem_data()
    # ground truth cost should be small (noiseless-ish dataset)
    T = np.stack(
        [np.asarray(ds.ground_truth_poses[k])
         for k in sorted(ds.ground_truth_poses)]
    )
    X = lifted.from_pose_array(T)
    f = float(prob.cost(P, X))
    assert f >= 0
    # random state should cost much more
    Xr = manifold.random_state(
        jax.random.PRNGKey(0), ProblemDims(3, g.n), 3
    )
    assert float(prob.cost(P, Xr)) > f


def test_prior_quadratic_diagonal_bounds_cost():
    """A pose prior must add its quadratic diagonal (kappa I on the rotation
    block, tau on the translation) to Q, not only the linear term G --
    otherwise the prior cost is unbounded below (reference: Graph.cpp:314-331).
    Regression test for the missing-diagonal bug."""
    d, r = 3, 3
    g = LocalGraph(0, r, d)
    m = RelativePosePoseMeasurement(
        0, 0, 0, 1, np.eye(3), np.array([1.0, 0, 0]), kappa=100.0, tau=10.0
    )
    g.set_measurements([m])
    P0 = np.zeros((r, d + 1))
    P0[:d, :d] = np.eye(d)
    P0[:, d] = [5.0, 0, 0]
    g.set_prior(0, P0)
    P = g.problem_data()
    G = prob.linear_term(P, None, g.n, g.l, g.dims.num_trans)

    from dcora_tpu.core.graph import PRIOR_KAPPA, PRIOR_TAU

    T = np.zeros((2, d, d + 1))
    T[0][:, :d] = np.eye(d)
    T[0][:, d] = [5.0, 0, 0]
    T[1][:, :d] = np.eye(d)
    T[1][:, d] = [6.0, 0, 0]
    X = lifted.from_pose_array(T)
    f_opt = float(prob.cost(P, X, G))
    # f drops the constant 0.5*(kappa*||P_rot||^2 + tau*||p||^2); at the
    # prior-satisfying, odometry-exact state the residual cost is exactly
    # minus that constant.
    const = 0.5 * (PRIOR_KAPPA * d + PRIOR_TAU * 25.0)
    np.testing.assert_allclose(f_opt, -const, rtol=1e-12)

    # moving away from the prior must increase the cost (boundedness)
    T[0][:, d] = [500.0, 0, 0]
    T[1][:, d] = [501.0, 0, 0]
    f_far = float(prob.cost(P, lifted.from_pose_array(T), G))
    assert f_far > f_opt + 1e3

    # gradient at the joint optimum vanishes
    from dcora_tpu.core.rtr import riemannian_gradient

    gn = float(riemannian_gradient(P, X, G).norm())
    assert gn < 1e-9

    # ELL-assembled Hessian path must include the prior diagonal too
    V = manifold.random_state(jax.random.PRNGKey(3), ProblemDims(d, 2), r)
    hv_edge = prob.apply_Q(P, V, prefer_ell=False)
    hv_ell = prob.apply_Q(P, V, prefer_ell=True)
    assert P.ell is not None
    np.testing.assert_allclose(
        np.asarray(hv_ell.rot), np.asarray(hv_edge.rot), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(hv_ell.trn), np.asarray(hv_edge.trn), atol=1e-9
    )
