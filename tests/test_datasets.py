"""Synthetic dataset generators: round-trip + ground-truth optimality."""

import numpy as np

from dcora_tpu import datasets
from dcora_tpu.core import lifted, problem as prob
from dcora_tpu.core.graph import LocalGraph
from dcora_tpu.io import read_g2o_file, read_pyfg_file
from dcora_tpu.io.remap import get_global_measurements
from dcora_tpu.types import GraphType


def test_grid_g2o_roundtrip(tmp_path):
    p = datasets.generate_grid_g2o(
        str(tmp_path / "grid.g2o"), shape=(3, 3, 2),
        rot_noise=0.05, trans_noise=0.02, seed=5,
    )
    ds = read_g2o_file(p)
    assert ds.dim == 3
    assert ds.num_poses == 18
    n_odo = sum(1 for m in ds.pose_pose_measurements if m.p1 + 1 == m.p2)
    assert n_odo == 17  # full odometry chain
    assert len(ds.pose_pose_measurements) > n_odo  # has loop closures
    for m in ds.pose_pose_measurements:
        np.testing.assert_allclose(m.R @ m.R.T, np.eye(3), atol=1e-9)
        # isotropic info: kappa = 1/rot_noise^2, tau = 1/trans_noise^2
        assert np.isclose(m.kappa, 1.0 / 0.05**2, rtol=1e-6)
        assert np.isclose(m.tau, 1.0 / 0.02**2, rtol=1e-6)


def test_noiseless_g2o_gt_is_optimum(tmp_path):
    """Zero-noise generation: the embedded vertices are the exact global
    optimum (cost 0), mirroring the reference's noiseless fixtures."""
    p = datasets.generate_noiseless_pgo_g2o(str(tmp_path / "nl.g2o"), n=6)
    ds = read_g2o_file(p)
    g = LocalGraph(0, 3, 3)
    g.set_measurements(ds.pose_pose_measurements)
    P = g.problem_data()
    T = np.stack([np.asarray(ds.ground_truth_poses[k])
                  for k in sorted(ds.ground_truth_poses)])
    X = lifted.from_pose_array(T)
    assert float(prob.cost(P, X)) < 1e-12


def test_ra_slam_pyfg_gt_is_optimum(tmp_path):
    p = datasets.generate_ra_slam_pyfg(str(tmp_path / "ra.pyfg"),
                                       num_robots=2, poses_per_robot=6,
                                       num_landmarks=2)
    ds = read_pyfg_file(p)
    assert ds.dim == 3
    assert len(ds.robot_IDs) >= 2
    total_sph = sum(ds.robot_id_to_num_unit_spheres.values())
    assert total_sph > 0
    gm = get_global_measurements(ds)
    gt = gm.ground_truth_init
    g = LocalGraph(0, 3, 3, GraphType.RangeAidedSLAMGraph)
    g.set_measurements(gm.relative_measurements)
    P = g.problem_data()
    assert float(prob.cost(P, gt)) < 1e-12


def test_ensure_test_datasets(tmp_path):
    d = datasets.ensure_test_datasets(str(tmp_path / "cache"))
    ds = read_g2o_file(f"{d}/tinyGrid3D.g2o")
    assert ds.num_poses == 8
    ds = read_g2o_file(f"{d}/smallGrid3D.g2o")
    assert ds.num_poses == 125
