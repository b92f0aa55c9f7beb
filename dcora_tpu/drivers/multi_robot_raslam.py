"""DCORA: multi-robot distributed RA-SLAM with the Riemannian staircase.

Mirrors examples/MultiRobotExample_RASLAM.cpp: per-robot RA subproblems from
a PyFG dataset, RBCD(++) with Greedy or Uniform block selection and
three-dict (pose/unit-sphere/landmark) public state exchange, central RA
certification, saddle escape across ranks.

Usage: python -m dcora_tpu.drivers.multi_robot_raslam data.pyfg
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

import dcora_tpu  # noqa: F401
from dcora_tpu.agent import Agent
from dcora_tpu.core import lifted, manifold, problem as prob
from dcora_tpu.core.certify import escape_saddle, fast_verification
from dcora_tpu.core.graph import LocalGraph
from dcora_tpu.core.lifted import RAState
from dcora_tpu.core.rtr import riemannian_gradient
from dcora_tpu.drivers.single_robot_raslam import odometry_init_global
from dcora_tpu.io import read_pyfg_file
from dcora_tpu.io.remap import (
    get_global_measurements,
    get_robot_measurements,
    robot_global_indices,
)
from dcora_tpu.types import (
    AgentParameters,
    BlockSelectionRule,
    GraphType,
    InitializationMethod,
    MAP_ID,
)

logger = logging.getLogger(__name__)


@jax.jit
def _central_eval(P, G0, X):
    """cost, Riemannian gradnorm, and the gradient itself in one compiled
    call (reference loop: MultiRobotExample_RASLAM.cpp:370-400)."""
    RGrad = riemannian_gradient(P, X, G0)
    return prob.cost(P, X, G0), RGrad.norm(), RGrad


def _slice_agent_state(X: RAState, idx: Dict[str, np.ndarray]) -> RAState:
    """Extract one agent's local block from the global RAState."""
    n_glob = X.n
    pose_trn = X.trn[jnp.asarray(idx["poses"])] if len(idx["poses"]) else \
        X.trn[:0]
    lmk_trn = (X.trn[jnp.asarray(n_glob + idx["landmarks"])]
               if len(idx["landmarks"]) else X.trn[:0])
    return RAState(
        rot=X.rot[jnp.asarray(idx["poses"], dtype=jnp.int32)]
        if len(idx["poses"]) else X.rot[:0],
        sph=X.sph[jnp.asarray(idx["spheres"], dtype=jnp.int32)]
        if len(idx["spheres"]) else X.sph[:0],
        trn=jnp.concatenate([pose_trn, lmk_trn]),
    )


def _scatter_agent_state(X_glob_parts, X_a: RAState,
                         idx: Dict[str, np.ndarray], n_glob: int):
    rot, sph, trn = X_glob_parts
    if len(idx["poses"]):
        rot[idx["poses"]] = np.asarray(X_a.rot)
        trn[idx["poses"]] = np.asarray(X_a.trn[: len(idx["poses"])])
    if len(idx["spheres"]):
        sph[idx["spheres"]] = np.asarray(X_a.sph)
    if len(idx["landmarks"]):
        trn[n_glob + idx["landmarks"]] = np.asarray(
            X_a.trn[len(idx["poses"]):]
        )


@dataclasses.dataclass
class MultiRobotRAResult:
    X: RAState
    certified: bool
    final_rank: int
    total_iters: int
    cost_trace: List[float]
    gradnorm_trace: List[float]
    trajectories: Dict[int, np.ndarray]
    elapsed_s: float
    # certificate diagnostics (see multi_robot_pgo adaptive stop)
    final_theta: float = None
    cert_slack: float = None


def run(pyfg_path: str, acceleration: bool = True, num_iters: int = 1000,
        r_max: int = 100, rgrad_norm_tol: float = 0.1,
        min_eig_num_tol: float = 1e-3,
        block_selection_rule: BlockSelectionRule = BlockSelectionRule.Greedy,
        init_method: InitializationMethod = InitializationMethod.Odometry,
        rbcd_only: bool = False, verbose: bool = False,
        seed: int = 0, adaptive_stop: bool = True,
        cert_slack_c: float = 1.0) -> MultiRobotRAResult:
    """``adaptive_stop``: when certification fails with |theta| inside
    the O(gradnorm) certificate error (the dual Lambda(X) is exact only
    at a critical point), tighten the RBCD stop to gradnorm/10 and keep
    iterating at the same rank instead of escaping — see the derivation
    note on multi_robot_pgo.run."""
    t_start = time.time()
    ds = read_pyfg_file(pyfg_path)
    gm = get_global_measurements(ds)
    robot_meas = get_robot_measurements(ds)
    ridx = robot_global_indices(ds)
    d = ds.dim
    gt = gm.ground_truth_init
    n, l, b = gt.n, gt.l, gt.b
    robot_ids = frozenset(sorted(ds.robot_IDs))
    first = min(robot_ids)
    rng = np.random.default_rng(seed)
    r_min = d

    if init_method == InitializationMethod.Odometry:
        Xcurr = odometry_init_global(ds, gm)
    elif init_method == InitializationMethod.Random:
        import jax.random as jr

        Xcurr = manifold.random_state(jr.PRNGKey(seed), gt.dims, d)
    else:
        Xcurr = gt

    total_iter = 0
    cost_trace: List[float] = []
    grad_trace: List[float] = []
    certified = False
    trajectories: Dict[int, np.ndarray] = {}
    r = r_min
    tol_eff = rgrad_norm_tol
    tightenings = 0
    final_theta = None
    cert_slack = None

    while r < r_max:
        central = LocalGraph(0, r, d, GraphType.RangeAidedSLAMGraph)
        central.set_measurements(gm.relative_measurements)
        P = central.problem_data()
        G0 = lifted.zeros(central.dims, r)

        Xrank = lifted.pad_rank(Xcurr, r) if Xcurr.r < r else Xcurr

        agents: Dict[int, Agent] = {}
        for rid in sorted(robot_ids):
            options = AgentParameters(
                d=d, r=r, robotIDs=robot_ids,
                graphType=GraphType.RangeAidedSLAMGraph,
                acceleration=acceleration, verbose=verbose,
            )
            a = Agent(rid, options)
            if rid != first:
                a.set_lifting_matrix(agents[first].get_lifting_matrix())
            elif a.get_lifting_matrix() is None:
                a.set_lifting_matrix(
                    np.asarray(manifold.fixed_lifting_matrix(r, d))
                )
            if rid != MAP_ID:
                a.set_measurements(
                    robot_meas[rid].relative_measurements
                )
            a.initialize()
            if rid != MAP_ID:
                a.set_X(_slice_agent_state(Xrank, ridx[rid]))
            agents[rid] = a

        active_ids = [rid for rid in sorted(robot_ids) if rid != MAP_ID]
        selected = active_ids[0]
        gradnorm = float("inf")
        Xopt = lifted.pad_rank(Xcurr, r) if Xcurr.r < r else Xcurr
        for _ in range(num_iters):
            sel = agents[selected]
            for rid in sorted(robot_ids):
                if rid != selected:
                    agents[rid].iterate(False)
            for rid in sorted(robot_ids):
                if rid == selected:
                    continue
                dicts = agents[rid].get_shared_state_dicts()
                if dicts is None:
                    continue
                sel.set_neighbor_status(agents[rid].get_status())
                sel.update_neighbor_states(rid, dicts[0], False,
                                           dicts[1], dicts[2])
                if acceleration:
                    aux = agents[rid].get_shared_state_dicts(aux=True)
                    sel.update_neighbor_states(rid, aux[0], True,
                                               aux[1], aux[2])
            sel.iterate(True)

            # assemble central estimate
            rot = np.zeros((n, r, d))
            sph = np.zeros((l, r))
            trn = np.zeros((n + b, r))
            for rid in active_ids:
                _scatter_agent_state(
                    (rot, sph, trn), agents[rid].get_X(), ridx[rid], n
                )
            Xopt = RAState(rot=jnp.asarray(rot), sph=jnp.asarray(sph),
                           trn=jnp.asarray(trn))
            # one compiled call + one device->host pull per iteration (the
            # eager form dispatched hundreds of latency-bound ops)
            cost_j, gradnorm_j, RGrad = _central_eval(P, G0, Xopt)
            gradnorm = float(gradnorm_j)
            cost = float(cost_j)
            RGrad_np = RAState(
                rot=np.asarray(RGrad.rot), sph=np.asarray(RGrad.sph),
                trn=np.asarray(RGrad.trn),
            )
            cost_trace.append(cost)
            grad_trace.append(gradnorm)
            if verbose or total_iter % 50 == 0:
                print(f"{total_iter} {selected} {cost:.6f} "
                      f"{gradnorm:.6f}")
            if gradnorm < tol_eff:
                break

            if sel.get_neighbors():
                norms = {}
                for rid in active_ids:
                    Ga = _slice_agent_state(RGrad_np, ridx[rid])
                    norms[rid] = float(
                        np.sqrt(sum(float((np.asarray(a) ** 2).sum())
                                    for a in (Ga.rot, Ga.sph, Ga.trn)))
                    )
                if block_selection_rule == BlockSelectionRule.Greedy:
                    selected = max(norms, key=norms.get)
                else:
                    selected = active_ids[rng.integers(len(active_ids))]
            total_iter += 1

        def finish():
            anchor = np.asarray(agents[first].get_X().pose(0))
            for rid in active_ids:
                agents[rid].set_global_anchor(anchor)
                trajectories[rid] = (
                    agents[rid].get_trajectory_in_global_frame()
                )
                agents[rid].reset()

        if rbcd_only:
            finish()
            Xcurr = Xopt
            break

        is_psd, theta, v = fast_verification(
            P, Xopt, min_eig_num_tol,
            num_lanczos=min(64, central.dims.k - 1),
        )
        final_theta = float(theta)
        cert_slack = cert_slack_c * gradnorm
        if not is_psd and adaptive_stop and tightenings < 4 \
                and gradnorm < tol_eff and theta > -cert_slack:
            # inconclusive: |theta| within the O(gradnorm) certificate
            # error — tighten the RBCD stop, continue at this rank
            tol_eff = gradnorm / 10.0
            tightenings += 1
            logger.info(
                "rank %d certificate inconclusive (theta=%.3e, "
                "slack=%.3e): tightening RBCD tol to %.1e",
                r, theta, cert_slack, tol_eff,
            )
            Xcurr = Xopt
            continue
        if is_psd:
            certified = True
            finish()
            Xcurr = Xopt
            break
        logger.info("saddle at rank %d, theta=%.3e", r, theta)
        # second-order alpha + the reference's escape tolerances
        # (MultiRobotExample_RASLAM.cpp:503-505 drives escapeSaddle the
        # same way as the PGO driver: the solver's gradient tolerances and
        # the second-order alpha of QuadraticProblem.cpp:138-234)
        ok, Xnext = escape_saddle(
            P, Xopt, theta, v, r + 1,
            gradient_tolerance=1e-6,
            preconditioned_gradient_tolerance=1e-6,
            is_second_order=True,
        )
        if not ok:
            Xcurr = Xopt
            break
        Xcurr = Xnext
        r += 1

    return MultiRobotRAResult(
        X=Xcurr, certified=certified, final_rank=r,
        total_iters=total_iter, cost_trace=cost_trace,
        gradnorm_trace=grad_trace, trajectories=trajectories,
        elapsed_s=time.time() - t_start,
        final_theta=final_theta, cert_slack=cert_slack,
    )


def main():
    from dcora_tpu.config import DcoraConfig, resolve

    ap = argparse.ArgumentParser()
    ap.add_argument("pyfg")
    ap.add_argument("--no-accel", action="store_true")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--rmax", type=int, default=None)
    ap.add_argument("--rule", default=None,
                    choices=["Greedy", "Uniform"])
    ap.add_argument("--verbose", action="store_true")
    DcoraConfig.add_cli(ap)
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)
    cfg = DcoraConfig.from_cli(args)
    logger.info("config:\n%s", cfg.dump())
    res = run(
        args.pyfg,
        acceleration=(not args.no_accel) and cfg.rbcd.acceleration,
        num_iters=resolve(args.iters, cfg.rbcd.num_iters),
        r_max=resolve(args.rmax, cfg.staircase.r_max),
        rgrad_norm_tol=cfg.rbcd.rgrad_norm_tol,
        min_eig_num_tol=cfg.staircase.min_eig_num_tol,
        block_selection_rule=BlockSelectionRule[
            resolve(args.rule, cfg.rbcd.block_selection_rule)],
        verbose=args.verbose,
    )
    print(
        f"DCORA: certified={res.certified} rank={res.final_rank} "
        f"iters={res.total_iters} "
        f"final_cost={res.cost_trace[-1]:.6f} elapsed={res.elapsed_s:.1f}s"
    )


if __name__ == "__main__":
    main()
