"""Agent tests mirroring the reference test strategy (tests/testAgent.cpp):
noiseless fixed-point invariance, state machine, multi-agent RBCD rounds."""

import numpy as np
import pytest

from dcora_tpu.agent import Agent
from dcora_tpu.core import lifted
from dcora_tpu.core.lifted import pose_inverse, pose_multiply
from dcora_tpu.io import read_g2o_file, read_pyfg_file
from dcora_tpu.io.remap import get_global_measurements, get_robot_measurements
from dcora_tpu.types import (
    AgentParameters,
    AgentState,
    CENTRALIZED_AGENT_ID,
    GraphType,
)

OPTIMIZATION_TOL = 1e-9  # reference: testAgent.cpp:20

G2O_DATASETS = [
    "pose_graph_optimization_test_2d.g2o",
    "pose_graph_optimization_test_3d.g2o",
]
PYFG_DATASETS = [
    "range_aided_slam_test_2d.pyfg",
    "range_aided_slam_test_3d.pyfg",
]


def aligned_gt_trajectory(gt_poses):
    T = np.stack([np.asarray(gt_poses[k]) for k in sorted(gt_poses)])
    inv = pose_inverse(T[0])
    return np.stack([pose_multiply(inv, Ti) for Ti in T])


@pytest.mark.parametrize("name", G2O_DATASETS)
def test_agent_initialize_iterate_se(data_dir, name):
    """Noiseless fixed point: chordal init == ground truth, and one iterate
    must stay there (reference: testAgentInitializeIterateOptimizeSE)."""
    ds = read_g2o_file(f"{data_dir}/{name}")
    d = ds.dim
    params = AgentParameters(d=d, r=d)
    agent = Agent(CENTRALIZED_AGENT_ID, params)
    agent.set_measurements(ds.pose_pose_measurements)
    agent.initialize()
    assert agent.state == AgentState.INITIALIZED
    assert agent.num_poses == ds.num_poses

    T_gt = aligned_gt_trajectory(ds.ground_truth_poses)
    T_est = agent.get_trajectory_in_local_frame()
    np.testing.assert_allclose(T_est, T_gt, atol=OPTIMIZATION_TOL)

    agent.iterate(True)
    T_est = agent.get_trajectory_in_local_frame()
    np.testing.assert_allclose(T_est, T_gt, atol=OPTIMIZATION_TOL)

    agent.reset()
    assert agent.state == AgentState.WAIT_FOR_DATA


@pytest.mark.parametrize("name", PYFG_DATASETS)
def test_agent_initialize_iterate_ra(data_dir, name):
    """RA fixed point with provided ground-truth initialization
    (reference: testAgentInitializeIterateOptimizeRA)."""
    ds = read_pyfg_file(f"{data_dir}/{name}")
    gm = get_global_measurements(ds)
    gt = gm.ground_truth_init
    d = ds.dim
    params = AgentParameters(
        d=d, r=d, robotIDs=frozenset({CENTRALIZED_AGENT_ID}),
        graphType=GraphType.RangeAidedSLAMGraph,
    )
    agent = Agent(CENTRALIZED_AGENT_ID, params)
    agent.set_measurements(gm.relative_measurements)
    T_gt = np.zeros((gt.n, d, d + 1))
    T_gt[:, :, :d] = np.asarray(gt.rot)
    T_gt[:, :, d] = np.asarray(gt.trn[: gt.n])
    S_gt = np.asarray(gt.sph)
    L_gt = np.asarray(gt.trn[gt.n:])
    agent.initialize(T_gt, S_gt, L_gt)
    assert agent.state == AgentState.INITIALIZED
    assert agent.num_poses == gt.n
    assert agent.num_unit_spheres == gt.l
    assert agent.num_landmarks == gt.b

    # aligned ground truth
    Tw0 = T_gt[0]
    inv = pose_inverse(Tw0)
    T_ref = np.stack([pose_multiply(inv, Ti) for Ti in T_gt])
    R0T = Tw0[:, :d].T
    S_ref = (R0T @ S_gt.T).T
    L_ref = (R0T @ (L_gt.T - Tw0[:, d:])).T

    for _ in range(2):
        T_est, S_est, L_est = agent.get_states_in_local_frame()
        np.testing.assert_allclose(T_est, T_ref, atol=OPTIMIZATION_TOL)
        np.testing.assert_allclose(S_est, S_ref, atol=OPTIMIZATION_TOL)
        np.testing.assert_allclose(L_est, L_ref, atol=OPTIMIZATION_TOL)
        agent.iterate(True)

    agent.reset()


@pytest.mark.parametrize("name", PYFG_DATASETS)
def test_multi_agent_rbcd_preserves_ground_truth(data_dir, name):
    """All agents forced to ground truth (setX) + full dict exchange + one
    RBCD++ round per agent must preserve ground truth within 1e-9
    (reference: testAgentMultiAgentRA, testAgent.cpp:290-456)."""
    ds = read_pyfg_file(f"{data_dir}/{name}")
    robot_meas = get_robot_measurements(ds)
    d = ds.dim
    robot_ids = frozenset(sorted(ds.robot_IDs))
    first = min(robot_ids)
    agents = {}
    gt_states = {}
    for rid in sorted(ds.robot_IDs):
        params = AgentParameters(
            d=d, r=d, robotIDs=robot_ids,
            graphType=GraphType.RangeAidedSLAMGraph,
            acceleration=True,
        )
        a = Agent(rid, params)
        if rid != first:
            a.set_lifting_matrix(agents[first].get_lifting_matrix())
        elif a.get_lifting_matrix() is None:
            import jax.numpy as jnp
            from dcora_tpu.core import manifold

            a.set_lifting_matrix(
                np.asarray(manifold.fixed_lifting_matrix(d, d))
            )
        rm = robot_meas[rid]
        a.set_measurements(rm.relative_measurements)
        a.initialize()
        # force current iterate to ground truth (reference: agent->setX)
        a.set_X(rm.ground_truth_init)
        gt_states[rid] = rm.ground_truth_init
        agents[rid] = a

    def check_at_gt(rid):
        X = agents[rid].get_X()
        gt = gt_states[rid]
        np.testing.assert_allclose(
            np.asarray(X.rot), np.asarray(gt.rot), atol=OPTIMIZATION_TOL
        )
        np.testing.assert_allclose(
            np.asarray(X.trn), np.asarray(gt.trn), atol=OPTIMIZATION_TOL
        )
        np.testing.assert_allclose(
            np.asarray(X.sph), np.asarray(gt.sph), atol=OPTIMIZATION_TOL
        )

    for rid in agents:
        check_at_gt(rid)

    for selected in sorted(agents):
        sel = agents[selected]
        for a in agents.values():
            if a.id != selected:
                a.iterate(False)
        for a in agents.values():
            if a.id == selected:
                continue
            dicts = a.get_shared_state_dicts()
            if dicts is None:
                continue
            sel.set_neighbor_status(a.get_status())
            sel.update_neighbor_states(a.id, dicts[0], False,
                                       dicts[1], dicts[2])
            aux = a.get_shared_state_dicts(aux=True)
            sel.update_neighbor_states(a.id, aux[0], True, aux[1], aux[2])
        ok = sel.iterate(True)
        assert ok
        check_at_gt(selected)


def test_agent_map_semantics():
    """Map agent owns nothing and iterates trivially
    (reference: testAgentMapRA)."""
    from dcora_tpu.types import MAP_ID

    params = AgentParameters(
        d=3, r=3, robotIDs=frozenset({0, MAP_ID}),
        graphType=GraphType.RangeAidedSLAMGraph,
    )
    agent = Agent(MAP_ID, params)
    assert agent.is_agent_map()
    assert not agent.is_robot_active(MAP_ID)
