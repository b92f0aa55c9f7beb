"""Sharded certification: psum-distributed Lanczos SpMV vs the central
implementation and the dense oracle (8 virtual CPU devices)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from dcora_tpu.core import certify, lifted, manifold
from dcora_tpu.core.graph import LocalGraph
from dcora_tpu.io import read_g2o_file
from dcora_tpu.parallel.certify import (
    fast_verification_sharded,
    minimum_eigen_pair_sharded,
    shard_problem_edges,
)
from dcora_tpu.types import ProblemDims


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("agents",))


def _problem(data_dir, name="smallGrid3D.g2o", r=5):
    ds = read_g2o_file(f"{data_dir}/{name}")
    g = LocalGraph(0, r, 3)
    g.set_measurements(ds.pose_pose_measurements)
    return g, g.problem_data()


def test_sharded_matvec_matches_central(data_dir, mesh):
    import jax.numpy as jnp

    from dcora_tpu.parallel.certify import make_sharded_matvec

    g, P = _problem(data_dir)
    import jax.random as jr

    X = manifold.random_state(jr.PRNGKey(3), ProblemDims(3, g.n), 5)
    C = certify.dual_certificate_blocks(P, X)
    P_sh = shard_problem_edges(P, 8)
    mv = make_sharded_matvec(P_sh, C, X.dims, mesh)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(X.dims.k))
    got = np.asarray(mv(v, jnp.zeros(())))
    V = lifted.from_flat(v[None, :], X.dims)
    want = np.asarray(lifted.to_flat(certify.apply_S(P, C, V))[0])
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_sharded_min_eig_matches_central(data_dir, mesh):
    g, P = _problem(data_dir)
    import jax.random as jr

    X = manifold.random_state(jr.PRNGKey(5), ProblemDims(3, g.n), 5)
    C = certify.dual_certificate_blocks(P, X)
    lam_c, _, _ = certify.minimum_eigen_pair(P, C, X.dims, num_lanczos=64)
    lam_s, _, _ = minimum_eigen_pair_sharded(
        P, C, X.dims, mesh, num_lanczos=64
    )
    np.testing.assert_allclose(lam_s, lam_c, rtol=1e-6, atol=1e-8)


def test_sharded_verification_at_optimum(data_dir, mesh):
    """A certified optimum must also certify through the sharded path."""
    from dcora_tpu.core.init import chordal_initialization
    from dcora_tpu.core.rtr import RTRConfig, rtr
    from dcora_tpu.solvers import make_preconditioner

    ds = read_g2o_file(f"{data_dir}/smallGrid3D.g2o")
    g = LocalGraph(0, 5, 3)
    g.set_measurements(ds.pose_pose_measurements)
    P = g.problem_data()
    M = make_preconditioner(g, P)
    T = chordal_initialization(ds.pose_pose_measurements)
    X0 = lifted.pad_rank(lifted.from_pose_array(T), 5)
    res = rtr(P, lifted.zeros(g.dims, 5), M, X0,
              RTRConfig(gradnorm_tol=1e-6, max_outer=200, max_inner=200))
    is_psd, theta, v = fast_verification_sharded(P, res.X, 1e-3, mesh)
    assert is_psd
    # and a random state must NOT certify
    import jax.random as jr

    Xr = manifold.random_state(jr.PRNGKey(7), ProblemDims(3, g.n), 5)
    is_psd_r, theta_r, v_r = fast_verification_sharded(P, Xr, 1e-3, mesh)
    assert not is_psd_r
    assert theta_r < 0
