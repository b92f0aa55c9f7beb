"""Parser parity tests vs. reference semantics (SURVEY.md P1)."""

import numpy as np
import pytest

from dcora_tpu.io import read_g2o_file, read_pyfg_file
from dcora_tpu.types import StateType


def _p(data_dir, name):
    """Path to a dataset, skipping when only the reference mount has it."""
    import os

    path = f"{data_dir}/{name}"
    if not os.path.exists(path):
        pytest.skip(f"dataset {name} unavailable")
    return path


def test_g2o_3d_counts(data_dir):
    ds = read_g2o_file(f"{data_dir}/tinyGrid3D.g2o")
    assert ds.dim == 3
    assert ds.num_poses > 0
    assert len(ds.pose_pose_measurements) > 0
    # odometry edges are fixed-weight
    for m in ds.pose_pose_measurements:
        assert m.fixedWeight == (m.p1 + 1 == m.p2)
        # rotations orthogonal
        np.testing.assert_allclose(m.R @ m.R.T, np.eye(3), atol=1e-8)
        assert m.kappa > 0 and m.tau > 0


def test_g2o_kappa_tau_identity_information(tmp_path):
    # identity information matrix: tau = 3/trace(I) = 1, kappa = 3/(2*3) = 0.5
    f = tmp_path / "two.g2o"
    info = "1 0 0 0 0 0 1 0 0 0 0 1 0 0 0 1 0 0 1 0 1"
    f.write_text(f"EDGE_SE3:QUAT 0 1 1 0 0 0 0 0 1 {info}\n")
    ds = read_g2o_file(str(f))
    m = ds.pose_pose_measurements[0]
    assert np.isclose(m.tau, 1.0)
    assert np.isclose(m.kappa, 1.5 / 3.0 * 1.0)  # 3/(2*3) = 0.5
    np.testing.assert_allclose(m.t, [1, 0, 0])
    assert ds.num_poses == 2


def test_g2o_2d(data_dir):
    ds = read_g2o_file(_p(data_dir, "input_INTEL_g2o.g2o"))
    assert ds.dim == 2
    assert ds.num_poses > 100


@pytest.mark.parametrize(
    "name", ["range_aided_slam_test_2d.pyfg", "range_aided_slam_test_3d.pyfg"]
)
def test_pyfg_small(data_dir, name):
    ds = read_pyfg_file(_p(data_dir, name))
    assert ds.dim == (2 if "2d" in name else 3)
    assert len(ds.robot_IDs) >= 1
    total_sph = sum(ds.robot_id_to_num_unit_spheres.values())
    ranges = [
        m
        for m in ds.measurements.relative_measurements
        if hasattr(m, "range")
    ]
    assert total_sph == len(ranges)
    # ground-truth unit spheres are unit norm
    for v in ds.ground_truth.unit_spheres.values():
        assert np.isclose(np.linalg.norm(v), 1.0)


def test_pyfg_tiers_counts(data_dir):
    ds = read_pyfg_file(_p(data_dir, "tiers.pyfg"))
    # file content: 9768 VERTEX_SE2, 1 VERTEX_XY, 9764 EDGE_SE2, 7789 EDGE_RANGE
    assert ds.dim == 2
    assert sum(ds.robot_id_to_num_poses.values()) == 9768
    assert sum(ds.robot_id_to_num_landmarks.values()) == 1
    pp = [
        m
        for m in ds.measurements.relative_measurements
        if m.stateType1 == StateType.Pose and m.stateType2 == StateType.Pose
        and not hasattr(m, "range")
    ]
    rng = [
        m for m in ds.measurements.relative_measurements if hasattr(m, "range")
    ]
    assert len(pp) == 9764
    assert len(rng) <= 7789  # duplicates skipped
    assert sum(ds.robot_id_to_num_unit_spheres.values()) == len(rng)
