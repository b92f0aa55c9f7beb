"""Checkpoint round-trip, async agent thread, logger output."""

import os

import numpy as np
import pytest

import jax

from dcora_tpu.agent import Agent
from dcora_tpu.core import manifold
from dcora_tpu.io import read_g2o_file
from dcora_tpu.types import AgentParameters, ProblemDims
from dcora_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from dcora_tpu.utils.logger import Logger


def test_checkpoint_round_trip(tmp_path):
    dims = ProblemDims(3, 4, 2, 1)
    X = manifold.random_state(jax.random.PRNGKey(0), dims, 5)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, X, rank=5,
                    weights={"pp": np.array([1.0, 0.5])},
                    extra={"iteration": 7})
    X2, rank, weights, extra = load_checkpoint(path)
    assert rank == 5
    np.testing.assert_array_equal(np.asarray(X.rot), np.asarray(X2.rot))
    np.testing.assert_array_equal(weights["pp"], [1.0, 0.5])
    assert int(extra["iteration"]) == 7


def test_async_optimization_loop(data_dir):
    """Thread start/stop preserves the noiseless fixed point
    (reference: testAgent.cpp:68-99, 142-150)."""
    import time

    ds = read_g2o_file(f"{data_dir}/pose_graph_optimization_test_3d.g2o")
    params = AgentParameters(d=3, r=3, asynchronous=False)
    agent = Agent(0, params)
    agent.set_measurements(ds.pose_pose_measurements)
    agent.initialize()
    T_before = agent.get_trajectory_in_local_frame()
    for _ in range(3):
        agent.start_optimization_loop()
        assert agent.is_optimization_running()
        time.sleep(0.5)
        agent.end_optimization_loop()
        assert not agent.is_optimization_running()
    T_after = agent.get_trajectory_in_local_frame()
    np.testing.assert_allclose(T_after, T_before, atol=1e-9)


def test_logger_tum_output(tmp_path, data_dir):
    ds = read_g2o_file(f"{data_dir}/tinyGrid3D.g2o")
    T = np.stack(
        [np.asarray(ds.ground_truth_poses[k])
         for k in sorted(ds.ground_truth_poses)]
    )
    log = Logger(str(tmp_path))
    log.log_trajectory(3, len(T), T, "traj.txt")
    lines = open(tmp_path / "traj.txt").read().strip().splitlines()
    assert lines[0].startswith("# pose_index")
    assert len(lines) == len(T) + 1
    vals = lines[1].split()
    assert len(vals) == 8
    # quaternion is unit
    q = np.array([float(v) for v in vals[4:8]])
    assert np.isclose(np.linalg.norm(q), 1.0)
    log.log_measurements(ds.pose_pose_measurements, "meas.txt")
    assert os.path.getsize(tmp_path / "meas.txt") > 0


def test_phase_timer_and_simple_timer():
    import time as _time

    from dcora_tpu.utils.timing import PhaseTimer, SimpleTimer

    t = SimpleTimer()
    t.tic()
    _time.sleep(0.01)
    ms = t.toc()
    assert ms >= 5.0

    pt = PhaseTimer()
    for _ in range(3):
        with pt.phase("work"):
            _time.sleep(0.002)
    assert pt.count["work"] == 3
    assert pt.ms["work"] >= 3.0
    assert "work:" in pt.report()


def test_umeyama_and_ate():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    from dcora_tpu.core.manifold import rotation_project
    from dcora_tpu.utils.evaluation import (
        ate_rmse,
        rotation_error_deg,
        umeyama_alignment,
    )

    pts = rng.standard_normal((40, 3)) * 5
    R_true = np.asarray(
        rotation_project(jnp.asarray(rng.standard_normal((3, 3))))
    )
    t_true = rng.standard_normal(3)
    dst = (R_true @ pts.T).T + t_true
    R, t, s = umeyama_alignment(pts, dst)
    np.testing.assert_allclose(R, R_true, atol=1e-10)
    np.testing.assert_allclose(t, t_true, atol=1e-10)
    assert s == 1.0

    # ATE of a rigidly transformed trajectory is ~0 after alignment
    assert ate_rmse(pts, dst) < 1e-10
    # and equals the noise RMS for a noisy one
    noisy = dst + 0.01 * rng.standard_normal(dst.shape)
    ate = ate_rmse(noisy, dst, align=False)
    assert 0.005 < ate < 0.03

    # rotation errors vanish for aligned rotations
    Rs = np.stack([
        np.asarray(rotation_project(jnp.asarray(rng.standard_normal((3, 3)))))
        for _ in range(10)
    ])
    errs = rotation_error_deg(np.einsum("ij,njk->nik", R_true, Rs), Rs,
                              R_align=R_true.T)
    assert errs.max() < 0.01  # arccos amplifies ~eps trace noise to ~1e-4 rad
