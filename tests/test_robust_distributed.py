"""Distributed GNC: planted outliers corrected through the *agent* path
(Agent.update_measurement_weights / should_update_measurement_weights,
reference Agent.cpp:1280-1454) driven by the multi-robot DC2-PGO driver.

The reference tests GNC only through the centralized solveRobustPGO
(testRobust.cpp:228-309); its distributed weight-update machinery has no
in-repo caller (the ROS layer drives it).  This test plants outlier loop
closures in a noiseless two-robot problem and asserts the distributed
pipeline drives their weights to ~0 while keeping inliers at ~1.
"""

import numpy as np

from dcora_tpu.datasets import generate_grid_g2o
from dcora_tpu.drivers.multi_robot_pgo import run
from dcora_tpu.types import RobustCostParameters, RobustCostType


def _plant_outliers(path, num_private=1, num_shared=1, n_split=4):
    """Corrupt loop-closure edges in a g2o file: one private to robot 0
    (both endpoints < n_split) and one shared (crossing n_split).
    Returns the corrupted (p1, p2) pairs."""
    lines = open(path).read().splitlines()
    planted = []
    want_private, want_shared = num_private, num_shared
    for k, line in enumerate(lines):
        if not line.startswith("EDGE_SE3:QUAT"):
            continue
        parts = line.split()
        i, j = int(parts[1]), int(parts[2])
        if j == i + 1:
            continue  # odometry is fixed-weight
        is_shared = (i < n_split) != (j < n_split)
        if is_shared and want_shared > 0:
            want_shared -= 1
        elif not is_shared and want_private > 0:
            want_private -= 1
        else:
            continue
        # corrupt the translation by a gross offset
        parts[3] = f"{float(parts[3]) + 4.0:.9f}"
        parts[4] = f"{float(parts[4]) - 3.0:.9f}"
        lines[k] = " ".join(parts)
        planted.append((i, j))
        if want_shared == 0 and want_private == 0:
            break
    assert len(planted) == num_private + num_shared, planted
    open(path, "w").write("\n".join(lines) + "\n")
    return planted


def test_distributed_gnc_rejects_planted_outliers(tmp_path):
    path = str(tmp_path / "robust.g2o")
    generate_grid_g2o(path, shape=(4, 4, 1), rot_noise=0.0,
                      trans_noise=0.0, loop_radius=1.5, loop_prob=1.0,
                      seed=21, kappa=100.0, tau=100.0)
    planted = _plant_outliers(path, n_split=8)

    rcp = RobustCostParameters(costType=RobustCostType.GNC_TLS)
    res = run(
        2, path, acceleration=False, num_iters=400, r_min=5, r_max=6,
        rgrad_norm_tol=1e-2, rbcd_only=True,
        robust_cost_params=rcp, robust_weight_updates=6,
    )
    assert res.weights, "no non-fixed loop closures recorded"
    for (p1, p2), w in res.weights.items():
        if (p1, p2) in planted:
            assert w < 0.1, f"outlier ({p1},{p2}) kept weight {w}"
        else:
            assert w > 0.9, f"inlier ({p1},{p2}) downweighted to {w}"


def test_terminal_repair_recovers_false_rejection(tmp_path):
    """A clean edge wrongly driven to weight 0 (the mid-stream
    misclassification mode: residuals judged at an unconverged estimate)
    must recover through Agent.reclassify_measurement_weights once the
    estimate converges — while a gross outlier stays rejected."""
    import jax.numpy as jnp

    from dcora_tpu.agent import Agent
    from dcora_tpu.core import lifted
    from dcora_tpu.io import read_g2o_file
    from dcora_tpu.types import AgentParameters

    path = str(tmp_path / "repair.g2o")
    generate_grid_g2o(path, shape=(4, 4, 1), rot_noise=0.0,
                      trans_noise=0.0, loop_radius=1.5, loop_prob=1.0,
                      seed=3, kappa=100.0, tau=100.0)
    planted = _plant_outliers(path, num_private=1, num_shared=0,
                              n_split=16)
    ds = read_g2o_file(path)

    rcp = RobustCostParameters(costType=RobustCostType.GNC_TLS)
    params = AgentParameters(d=3, r=3, robotIDs=frozenset({0}),
                             robustCostParams=rcp)
    a = Agent(0, params)
    a.set_measurements(ds.pose_pose_measurements)
    a.initialize()
    # converged estimate = the noiseless ground truth
    T = np.stack([np.asarray(ds.ground_truth_poses[k])
                  for k in sorted(ds.ground_truth_poses)])
    a.set_X(lifted.from_pose_array(T))
    # drive mu high enough that the TLS band is decisive
    a.set_gnc_mu(100.0)

    # wrongly reject one clean loop closure
    victim = next(m for m in a.graph.active_loop_closures()
                  if not m.fixedWeight
                  and (m.p1, m.p2) not in planted)
    victim.weight = 0.0

    changed = a.reclassify_measurement_weights()
    assert changed >= 1
    assert victim.weight > 0.9, victim.weight
    for m in a.graph.active_loop_closures():
        if (m.p1, m.p2) in planted and not m.fixedWeight:
            assert m.weight < 0.1, (m.p1, m.p2, m.weight)
