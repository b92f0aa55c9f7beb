"""Sharded synchronous-parallel RBCD tests on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from dcora_tpu.core import lifted, problem as prob
from dcora_tpu.core.graph import LocalGraph
from dcora_tpu.core.init import chordal_initialization
from dcora_tpu.core.lifted import RAState
from dcora_tpu.core.rtr import RTRConfig, riemannian_gradient
from dcora_tpu.drivers.multi_robot_pgo import (
    partition_measurements,
    robot_slice,
)
from dcora_tpu.io import read_g2o_file
from dcora_tpu.parallel.rbcd import (
    build_parallel_problem,
    make_parallel_round,
    pack_states,
    unpack_states,
)


NUM_AGENTS = 4


@pytest.fixture(scope="module")
def parallel_setup(data_dir):
    ds = read_g2o_file(f"{data_dir}/smallGrid3D.g2o")
    ms = ds.pose_pose_measurements
    d, n, r = ds.dim, ds.num_poses, 5
    odo, priv, shared, _ = partition_measurements(ms, n, NUM_AGENTS)
    graphs = []
    for a in range(NUM_AGENTS):
        g = LocalGraph(a, r, d)
        g.set_measurements(odo[a] + priv[a] + shared[a])
        graphs.append(g)
    T = chordal_initialization(ms)
    X = lifted.pad_rank(lifted.from_pose_array(T), r)
    states = []
    for a in range(NUM_AGENTS):
        s, e = robot_slice(n, NUM_AGENTS, a)
        states.append(
            RAState(rot=X.rot[s:e], sph=X.sph[:0], trn=X.trn[s:e])
        )
    central = LocalGraph(0, r, d)
    central.set_measurements(ms)
    return ds, graphs, states, central, X


def _global_state(pp, states, central, r):
    """Reassemble the global state from per-agent blocks."""
    rots = [s.rot for s in states]
    trns = [s.trn for s in states]
    return RAState(
        rot=jnp.concatenate(rots),
        sph=jnp.zeros((0, r)),
        trn=jnp.concatenate(trns),
    )


def test_parallel_rbcd_decreases_cost(parallel_setup):
    ds, graphs, states, central, X0 = parallel_setup
    r = 5
    pp = build_parallel_problem(graphs)
    devices = np.array(jax.devices()[:NUM_AGENTS])
    mesh = Mesh(devices, ("agents",))
    cfg = RTRConfig(
        gradnorm_tol=1e-2, max_inner=50, initial_radius=100.0,
        single_accepted_step=True,
    )
    round_fn = make_parallel_round(pp, cfg, mesh)

    P = central.problem_data()
    G0 = lifted.zeros(central.dims, r)
    Xb = pack_states(pp, states)

    costs = []
    for it in range(30):
        Xglob = _global_state(pp, unpack_states(pp, Xb), central, r)
        costs.append(float(prob.cost(P, Xglob)))
        Xb, gnorms = round_fn(Xb)
    Xglob = _global_state(pp, unpack_states(pp, Xb), central, r)
    costs.append(float(prob.cost(P, Xglob)))
    gradnorm = float(riemannian_gradient(P, Xglob, G0).norm())

    assert costs[-1] < costs[0] - 1e-6, costs[:3] + costs[-3:]
    # monotone-ish decrease overall and approaching a critical point
    assert costs[-1] <= min(costs[:5])
    assert gradnorm < 10.0, gradnorm


def test_parallel_matches_sequential_fixed_point(parallel_setup):
    """If the global state is a critical point, a parallel round must not
    move it (consistency between parallel and agent-based formulations)."""
    ds, graphs, states, central, X0 = parallel_setup
    r = 5
    # first drive the centralized problem to a critical point
    from dcora_tpu.core.rtr import rtr
    from dcora_tpu.solvers import make_preconditioner

    P = central.problem_data()
    M = make_preconditioner(central, P)
    cfg = RTRConfig(gradnorm_tol=1e-8, max_outer=100, max_inner=200)
    G0 = lifted.zeros(central.dims, r)
    Xopt = rtr(P, G0, M, X0, cfg).X
    gnorm0 = float(riemannian_gradient(P, Xopt, G0).norm())
    assert gnorm0 < 1e-6

    pp = build_parallel_problem(graphs)
    devices = np.array(jax.devices()[:NUM_AGENTS])
    mesh = Mesh(devices, ("agents",))
    cfg1 = RTRConfig(
        gradnorm_tol=1e-2, max_inner=50, single_accepted_step=True
    )
    round_fn = make_parallel_round(pp, cfg1, mesh)

    n = central.n
    blocks = []
    for a in range(NUM_AGENTS):
        s, e = robot_slice(n, NUM_AGENTS, a)
        blocks.append(
            RAState(rot=Xopt.rot[s:e], sph=Xopt.sph[:0],
                    trn=Xopt.trn[s:e])
        )
    Xb = pack_states(pp, blocks)
    Xb2, gnorms = round_fn(Xb)
    # block gradients are ~zero so the one-accepted-step solver should not
    # move (it skips when gradnorm < tol)
    Xglob2 = _global_state(pp, unpack_states(pp, Xb2), central, r)
    delta = float((Xglob2 - Xopt).norm())
    assert delta < 1e-6, delta


def test_parallel_pgo_driver_smoke(data_dir):
    """The user-facing scaling-mode driver converges on the CPU mesh."""
    from dcora_tpu.drivers.parallel_pgo import run

    Xg, cost, gradnorm = run(
        4, f"{data_dir}/smallGrid3D.g2o", max_rounds=80,
        rgrad_norm_tol=0.5, check_every=5,
    )
    assert gradnorm < 0.5
    assert np.isfinite(cost)


def test_parallel_rbcd_tiled_backend(parallel_setup):
    """backend="tiled" (MXU SpMM block updates): decreases cost like the
    edge path and does not move a critical point (f64 tiles => exact)."""
    ds, graphs, states, central, X0 = parallel_setup
    r = 5
    pp = build_parallel_problem(graphs, backend="tiled",
                                tile_dtype=np.float64)
    assert pp.tiled is not None
    devices = np.array(jax.devices()[:NUM_AGENTS])
    mesh = Mesh(devices, ("agents",))
    cfg = RTRConfig(
        gradnorm_tol=1e-2, max_inner=50, initial_radius=100.0,
        single_accepted_step=True,
    )
    round_fn = make_parallel_round(pp, cfg, mesh)

    P = central.problem_data()
    Xb = pack_states(pp, states)
    costs = []
    for it in range(15):
        Xglob = _global_state(pp, unpack_states(pp, Xb), central, r)
        costs.append(float(prob.cost(P, Xglob)))
        Xb, gnorms = round_fn(Xb)
    Xglob = _global_state(pp, unpack_states(pp, Xb), central, r)
    costs.append(float(prob.cost(P, Xglob)))
    assert costs[-1] < costs[0] - 1e-6, costs[:3] + costs[-3:]
    assert costs[-1] <= min(costs[:5])

    # fixed-point consistency: drive the central problem to a critical
    # point, scatter it into blocks, one tiled round must not move it
    from dcora_tpu.core.rtr import rtr
    from dcora_tpu.solvers import make_preconditioner

    M = make_preconditioner(central, P)
    cfg2 = RTRConfig(gradnorm_tol=1e-8, max_outer=100, max_inner=200)
    G0 = lifted.zeros(central.dims, r)
    Xopt = rtr(P, G0, M, X0, cfg2).X
    n = central.n
    blocks = []
    for a in range(NUM_AGENTS):
        s, e = robot_slice(n, NUM_AGENTS, a)
        blocks.append(RAState(rot=Xopt.rot[s:e], sph=Xopt.sph[:0],
                              trn=Xopt.trn[s:e]))
    Xb = pack_states(pp, blocks)
    Xb2, gnorms = round_fn(Xb)
    Xglob2 = _global_state(pp, unpack_states(pp, Xb2), central, r)
    delta = float((Xglob2 - Xopt).norm())
    assert delta < 1e-6, delta
