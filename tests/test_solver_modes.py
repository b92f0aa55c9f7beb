"""Solver-surface tests: RSD line search, staircase r_max edge,
checkpoint/resume integration, RGD agent dispatch.

Reference anchors: QuadraticOptimizer.cpp:182-232,282-289 (RSD),
SingleRobotExample_RASLAM.cpp:196-282 (optimize at every entered rank).
"""

import os

import numpy as np

from dcora_tpu.core import lifted, manifold
from dcora_tpu.core.graph import LocalGraph
from dcora_tpu.core.init import chordal_initialization
from dcora_tpu.core.rtr import RTRConfig, rsd, rtr
from dcora_tpu.io import read_g2o_file
from dcora_tpu.staircase import riemannian_staircase
from dcora_tpu.types import ROptParameters


def _tiny_problem(data_dir, r=5):
    ds = read_g2o_file(f"{data_dir}/tinyGrid3D.g2o")
    g = LocalGraph(0, r, 3)
    g.set_measurements(ds.pose_pose_measurements)
    P = g.problem_data()
    T = chordal_initialization(ds.pose_pose_measurements)
    X0 = lifted.pad_rank(lifted.from_pose_array(T), r)
    return g, P, X0


def test_rsd_converges_to_rtr_optimum(data_dir):
    """RSD with line search reaches the same optimum as RTR on tinyGrid3D
    (reference pairs both solvers behind QuadraticOptimizer)."""
    from dcora_tpu.solvers import make_preconditioner

    g, P, X0 = _tiny_problem(data_dir)
    M = make_preconditioner(g, P)
    G = lifted.zeros(g.dims, 5)

    cfg_rtr = RTRConfig(gradnorm_tol=1e-6, max_outer=200, max_inner=200)
    res_rtr = rtr(P, G, M, X0, cfg_rtr)

    cfg_rsd = RTRConfig(gradnorm_tol=1e-6, max_outer=2000)
    res_rsd = rsd(P, G, M, X0, cfg_rsd)

    assert float(res_rsd.gradnorm_final) < 1e-4
    np.testing.assert_allclose(
        float(res_rsd.f_final), float(res_rtr.f_final), rtol=1e-6, atol=1e-9
    )


def test_rsd_respects_reference_budget(data_dir):
    """The reference's line-search config (tol 1e-2, 10 iterations,
    QuadraticOptimizer.cpp:282-289) must make progress, not diverge."""
    from dcora_tpu.solvers import make_preconditioner

    g, P, X0 = _tiny_problem(data_dir)
    M = make_preconditioner(g, P)
    G = lifted.zeros(g.dims, 5)
    from dcora_tpu.core import problem as prob

    f0 = float(prob.cost(P, X0, G))
    res = rsd(P, G, M, X0, RTRConfig(gradnorm_tol=1e-2, max_outer=10))
    assert float(res.f_final) <= f0 + 1e-12
    assert float(manifold.manifold_error(res.X)) < 1e-9


def test_staircase_optimizes_when_rmin_equals_rmax(data_dir):
    """r_min == r_max previously skipped the optimization loop entirely
    (`while r < r_max`); every entered rank must be optimized."""
    ds = read_g2o_file(f"{data_dir}/smallGrid3D.g2o")
    g = LocalGraph(0, 5, 3)
    g.set_measurements(ds.pose_pose_measurements)
    T = chordal_initialization(ds.pose_pose_measurements)
    X0 = lifted.pad_rank(lifted.from_pose_array(T), 5)
    res = riemannian_staircase(
        g, X0, r_min=5, r_max=5,
        opt_params=ROptParameters(
            gradnorm_tol=1e-4, RTR_iterations=200, RTR_tCG_iterations=200
        ),
    )
    # rank 5 is enough to certify smallGrid3D; the old loop shape returned
    # the raw X0 uncertified without a single RTR call
    assert res.certified
    assert res.final_rank == 5


def test_staircase_checkpoint_resume(data_dir, tmp_path):
    ckpt = str(tmp_path / "stair.npz")
    ds = read_g2o_file(f"{data_dir}/tinyGrid3D.g2o")
    g = LocalGraph(0, 5, 3)
    g.set_measurements(ds.pose_pose_measurements)
    T = chordal_initialization(ds.pose_pose_measurements)
    X0 = lifted.pad_rank(lifted.from_pose_array(T), 5)
    params = ROptParameters(
        gradnorm_tol=1e-4, RTR_iterations=200, RTR_tCG_iterations=200
    )
    res1 = riemannian_staircase(
        g, X0, r_min=5, r_max=8, opt_params=params, checkpoint_path=ckpt
    )
    assert res1.certified
    assert os.path.exists(ckpt)
    from dcora_tpu.utils.checkpoint import load_checkpoint

    X_saved, rank_saved, _, _ = load_checkpoint(ckpt)
    assert rank_saved == res1.final_rank
    # resume: starts from the checkpointed (already-critical) iterate and
    # re-certifies quickly at the saved rank
    res2 = riemannian_staircase(
        g, X0, r_min=5, r_max=8, opt_params=params, checkpoint_path=ckpt
    )
    assert res2.certified
    assert res2.final_rank == res1.final_rank
    np.testing.assert_allclose(res2.f_final, res1.f_final, rtol=1e-6,
                               atol=1e-9)


def test_agent_rgd_dispatch(data_dir):
    """ROptMethod.RGD routes Agent.iterate through the single
    preconditioned gradient step (reference: Agent + ROptMethod::RGD)."""
    from dcora_tpu.agent import Agent
    from dcora_tpu.types import (
        AgentParameters,
        InitializationMethod,
        ROptMethod,
    )

    ds = read_g2o_file(f"{data_dir}/tinyGrid3D.g2o")
    params = AgentParameters(
        d=3, r=5, robotIDs=frozenset([0]),
        localInitializationMethod=InitializationMethod.Odometry,
    )
    params.localOptimizationParams = ROptParameters(
        method=ROptMethod.RGD, RGD_stepsize=1e-3
    )
    a = Agent(0, params)
    a.set_measurements(ds.pose_pose_measurements)
    a.initialize()
    X_before = a.get_X()
    a.iterate(True)
    X_after = a.get_X()
    # a step was taken and the iterate stays on the manifold
    assert float(manifold.manifold_error(X_after)) < 1e-9
    assert not np.allclose(np.asarray(X_before.rot),
                           np.asarray(X_after.rot))


def test_chunked_radius_carry(data_dir):
    """rtr_chunked must thread the trust-region radius across device
    calls.  With an oversized initial radius and chunk=1, a per-call
    radius reset burns every call's single outer iteration rejecting the
    same too-large step (tiers.pyfg rank 3 regression); the carried
    radius lets the chunked solve match the monolithic one."""
    from dcora_tpu.core.rtr import rtr_chunked
    from dcora_tpu.solvers import make_preconditioner

    import jax.random as jr

    g, P, _ = _tiny_problem(data_dir)
    M = make_preconditioner(g, P)
    G = lifted.zeros(g.dims, 5)
    # random far-from-optimum init with a tight tCG budget: big steps
    # get rejected, so the adaptive rule must shrink the radius
    X0 = manifold.random_state(jr.PRNGKey(3), g.dims, 5)

    cfg = RTRConfig(gradnorm_tol=1e-6, max_outer=80, max_inner=3,
                    initial_radius=1e4)
    res_mono = rtr(P, G, M, X0, cfg)
    assert res_mono.radius_final is not None
    # the oversized radius must have been shrunk by the adaptive rule
    assert float(res_mono.radius_final) < 1e4

    res_chunk = rtr_chunked(P, G, M, X0, cfg, chunk=1)
    assert float(res_chunk.gradnorm_final) < 1e-4, (
        "chunk=1 solve stalled: radius not carried across calls"
    )
    np.testing.assert_allclose(
        float(res_chunk.f_final), float(res_mono.f_final),
        rtol=1e-6, atol=1e-9,
    )
