"""Sharded synchronous-parallel RBCD over a device mesh.

The TPU scaling mode of the reference's block-coordinate descent
(SURVEY.md 2.3): instead of the inherently sequential greedy single-block
update (MultiRobotExample.cpp:219-307), every agent block updates
concurrently against its neighbors' previous-round public states (a Jacobi-
style multi-block RBCD). Both schemes converge to first-order critical
points of the same block-separable lifted cost; the parallel variant is the
one that maps to hardware:

  * agents = shards of the pose axis laid out over a jax Mesh axis "agents"
  * separator (public state) exchange = one all_gather over ICI per round
  * convergence metrics = psum reductions

All per-agent problems are padded to common static shapes so a single
shard_map-ed, jit-ed round function serves every round.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dcora_tpu.core import lifted, problem as prob
from dcora_tpu.core.graph import LocalGraph
from dcora_tpu.core.lifted import RAState
from dcora_tpu.core.manifold import project, retract, tangent_project
from dcora_tpu.core.problem import ProblemData
from dcora_tpu.core.rtr import PLANAR_BACKEND, RTRConfig, _rtr_impl
from dcora_tpu.types import GraphType, StateID, StateType


class BatchedProblem(NamedTuple):
    """Per-agent subproblems stacked along a leading agent axis [A, ...].

    Index contract per agent (see problem.apply_Q): local slots
    [0, n_max) / [0, t_max) / [0, l_max); fixed-neighbor slots
    [n_max, n_max + fp_max) etc.; the pad slot is the last index of
    whichever state is passed in.
    """

    P: ProblemData  # every leaf has leading axis A
    # local-block operator: fixed slots remapped onto the pad slot, so the
    # SoA acts as Q_bb on local-shaped states (precomputed; static per
    # weight epoch)
    P_loc: ProblemData
    # factored block-Jacobi preconditioner of Q_bb (precomputed once per
    # weight epoch; the reference factors once per epoch too,
    # Graph.cpp:1901-1917 -- round 1 rebuilt it every round inside jit)
    M: object  # problem.Preconditioner, leading axis A
    # gather maps for separator exchange: for each fixed slot, the owning
    # agent index and its slot in that agent's public buffer
    fix_pose_src: jax.Array  # i32[A, fp_max, 2] (agent, pub slot)
    fix_trans_src: jax.Array  # i32[A, ft_max, 3] (agent, pub slot, kind)
    fix_sph_src: jax.Array  # i32[A, fs_max, 2]
    # public buffers: which local states each agent publishes
    pub_pose_idx: jax.Array  # i32[A, pp_max] local pose index (or n_max pad)
    pub_lmk_idx: jax.Array  # i32[A, plm_max] local landmark trans index
    pub_sph_idx: jax.Array  # i32[A, ps_max]
    # masks / sizes
    n_sizes: jax.Array  # i32[A]
    l_sizes: jax.Array  # i32[A]
    t_sizes: jax.Array  # i32[A]


# trans-source kinds in fix_trans_src[..., 2]
_KIND_POSE = 0
_KIND_LMK = 1


@dataclasses.dataclass
class ParallelRBCDProblem:
    """Host-side compiled multi-agent problem."""

    batched: BatchedProblem
    n_max: int
    l_max: int
    b_max: int
    t_max: int
    fp_max: int
    ft_max: int
    fs_max: int
    pp_max: int
    plm_max: int
    ps_max: int
    d: int
    num_agents: int
    graphs: List[LocalGraph]
    regs: jax.Array  # f64[A] preconditioner regularization per agent
    # optional MXU fast path: per-agent TiledProblem of the local block
    # Q_bb, data leaves stacked along the agent axis, tile lists padded to
    # a common count (zero tiles are harmless under the segment-sum).
    # meta is shared: every agent is padded to (n_max, l_max, b_max).
    tiled: Optional[object] = None  # tiled.TiledProblem with [A, ...] leaves


def _pad_int(arr, size, pad_value):
    out = np.full((size,), pad_value, dtype=np.int32)
    out[: len(arr)] = arr
    return out


def _pad_float(arr, size, extra_dims=()):
    out = np.zeros((size,) + extra_dims, dtype=np.float64)
    if len(arr):
        out[: len(arr)] = arr
    return out


def build_parallel_problem(
    graphs: List[LocalGraph],
    agent_of_robot: Optional[Dict[int, int]] = None,
    backend: str = "edge",
    tile_dtype=np.float64,
    tile_T: int = 128,
) -> ParallelRBCDProblem:
    """Compile per-agent LocalGraphs into one padded batched problem.

    backend="tiled" additionally builds per-agent RCM block-tiled forms of
    the local Q (core.tiled) so the round runs each block update on the
    MXU SpMM path instead of the gather/scatter edge path (the reference's
    per-block work, QuadraticOptimizer.cpp:234-280, is a sparse SpMV; the
    tiled form is its TPU shape).  tile_dtype=f32 for TPU scaling runs,
    f64 for exact CPU verification.
    """
    A = len(graphs)
    d = graphs[0].d
    if agent_of_robot is None:
        agent_of_robot = {g.id: i for i, g in enumerate(graphs)}

    n_max = max(g.n for g in graphs)
    l_max = max(g.l for g in graphs)
    b_max = max(g.b for g in graphs)
    t_max = n_max + b_max

    compiled = [g._compile() for g in graphs]
    fp_max = max(c["n_fix_pose"] for c in compiled)
    ft_max = max(c["n_fix_trans"] for c in compiled)
    fs_max = max(c["n_fix_sphere"] for c in compiled)

    # public buffers: deterministic order by StateID
    pubs = [g.my_public_state_ids() for g in graphs]
    pub_poses = [sorted(p[0]) for p in pubs]
    pub_sphs = [sorted(p[1]) for p in pubs]
    pub_lmks = [sorted(p[2]) for p in pubs]
    pp_max = max(1, max(len(x) for x in pub_poses))
    ps_max = max(1, max(len(x) for x in pub_sphs))
    plm_max = max(1, max(len(x) for x in pub_lmks))

    pub_slot: Dict[StateID, Tuple[int, int]] = {}
    for a in range(A):
        for s, sid in enumerate(pub_poses[a]):
            pub_slot[sid] = (a, s)
        for s, sid in enumerate(pub_sphs[a]):
            pub_slot[sid] = (a, s)
        for s, sid in enumerate(pub_lmks[a]):
            pub_slot[sid] = (a, s)

    mpp_max = max(1, max(len(c["pp_meas"]) for c in compiled))
    mpl_max = max(1, max(len(c["pl_meas"]) for c in compiled))
    mrg_max = max(1, max(len(c["rg_meas"]) for c in compiled))

    P_list = []
    fps_list, fts_list, fss_list = [], [], []
    pubp_list, publ_list, pubs_list = [], [], []
    regs = []
    for a, (g, c) in enumerate(zip(graphs, compiled)):
        n, b, l = g.n, g.b, g.l  # noqa: E741
        nt = n + b

        def remap_rot(idx):
            # local [0,n) -> keep; fixed slot s -> n_max + s; pad otherwise
            return np.where(
                idx < n, idx, n_max + (idx - n)
            ).astype(np.int32)

        def remap_trn(idx):
            # local pose [0,n) keep; landmark [n, nt) -> n_max + (i-n);
            # fixed [nt,..) -> t_max + slot
            out = np.where(idx < n, idx, 0)
            out = np.where(
                (idx >= n) & (idx < nt), n_max + (idx - n), out
            )
            out = np.where(idx >= nt, t_max + (idx - nt), out)
            return out.astype(np.int32)

        def remap_sph(idx):
            return np.where(idx < l, idx, l_max + (idx - l)).astype(np.int32)

        pp_idx = c["pp_idx"]
        pl_idx = c["pl_idx"]
        rg_idx = c["rg_idx"]
        mpp, mpl, mrg = len(pp_idx), len(pl_idx), len(rg_idx)

        rot_pad = n_max + fp_max
        trn_pad = t_max + ft_max
        sph_pad = l_max + fs_max

        def w_act(meas, nbrs):
            w = np.array([m.weight for m in meas])
            act = np.array(
                [1.0 if (x is None or g.neighbor_active.get(x, True))
                 else 0.0 for x in nbrs]
            )
            return w, act

        pp_w, pp_a = w_act(c["pp_meas"], c["pp_nbr"])
        pl_w, pl_a = w_act(c["pl_meas"], c["pl_nbr"])
        rg_w, rg_a = w_act(c["rg_meas"], c["rg_nbr"])

        Pa = ProblemData(
            pp_ri=jnp.asarray(_pad_int(remap_rot(pp_idx[:, 0]), mpp_max,
                                       rot_pad)),
            pp_rj=jnp.asarray(_pad_int(remap_rot(pp_idx[:, 1]), mpp_max,
                                       rot_pad)),
            pp_ti=jnp.asarray(_pad_int(remap_trn(pp_idx[:, 2]), mpp_max,
                                       trn_pad)),
            pp_tj=jnp.asarray(_pad_int(remap_trn(pp_idx[:, 3]), mpp_max,
                                       trn_pad)),
            pp_R=jnp.asarray(_pad_float(
                np.array([m.R for m in c["pp_meas"]]).reshape(mpp, d, d)
                if mpp else np.zeros((0, d, d)), mpp_max, (d, d))),
            pp_t=jnp.asarray(_pad_float(
                np.array([m.t for m in c["pp_meas"]]).reshape(mpp, d)
                if mpp else np.zeros((0, d)), mpp_max, (d,))),
            pp_kappa=jnp.asarray(_pad_float(
                [m.kappa for m in c["pp_meas"]], mpp_max)),
            pp_tau=jnp.asarray(_pad_float(
                [m.tau for m in c["pp_meas"]], mpp_max)),
            pp_w=jnp.asarray(_pad_float(pp_w, mpp_max)),
            pp_active=jnp.asarray(_pad_float(pp_a, mpp_max)),
            pl_ri=jnp.asarray(_pad_int(remap_rot(pl_idx[:, 0]), mpl_max,
                                       rot_pad)),
            pl_ti=jnp.asarray(_pad_int(remap_trn(pl_idx[:, 1]), mpl_max,
                                       trn_pad)),
            pl_tj=jnp.asarray(_pad_int(remap_trn(pl_idx[:, 2]), mpl_max,
                                       trn_pad)),
            pl_t=jnp.asarray(_pad_float(
                np.array([m.t for m in c["pl_meas"]]).reshape(mpl, d)
                if mpl else np.zeros((0, d)), mpl_max, (d,))),
            pl_tau=jnp.asarray(_pad_float(
                [m.tau for m in c["pl_meas"]], mpl_max)),
            pl_w=jnp.asarray(_pad_float(pl_w, mpl_max)),
            pl_active=jnp.asarray(_pad_float(pl_a, mpl_max)),
            rg_ti=jnp.asarray(_pad_int(remap_trn(rg_idx[:, 0]), mrg_max,
                                       trn_pad)),
            rg_tj=jnp.asarray(_pad_int(remap_trn(rg_idx[:, 1]), mrg_max,
                                       trn_pad)),
            rg_q=jnp.asarray(_pad_int(remap_sph(rg_idx[:, 2]), mrg_max,
                                      sph_pad)),
            rg_rho=jnp.asarray(_pad_float(
                [m.range for m in c["rg_meas"]], mrg_max)),
            rg_prec=jnp.asarray(_pad_float(
                [m.precision for m in c["rg_meas"]], mrg_max)),
            rg_w=jnp.asarray(_pad_float(rg_w, mrg_max)),
            rg_active=jnp.asarray(_pad_float(rg_a, mrg_max)),
            prior_G=None,
        )
        P_list.append(Pa)

        # separator gather maps
        fps = np.zeros((fp_max, 2), dtype=np.int32)
        for sid, slot in c["fixed_pose"].items():
            fps[slot] = pub_slot[sid]
        fts = np.zeros((ft_max, 3), dtype=np.int32)
        for sid, slot in c["fixed_trans"].items():
            src_a, src_s = pub_slot[sid]
            kind = (_KIND_POSE if sid.state_type == StateType.Pose
                    else _KIND_LMK)
            fts[slot] = (src_a, src_s, kind)
        fss = np.zeros((fs_max, 2), dtype=np.int32)
        for sid, slot in c["fixed_sphere"].items():
            fss[slot] = pub_slot[sid]
        fps_list.append(fps)
        fts_list.append(fts)
        fss_list.append(fss)

        pubp_list.append(_pad_int(
            [sid.frame_id for sid in pub_poses[a]], pp_max, n_max))
        publ_list.append(_pad_int(
            [n_max + sid.frame_id for sid in pub_lmks[a]], plm_max,
            t_max))
        pubs_list.append(_pad_int(
            [sid.frame_id for sid in pub_sphs[a]], ps_max, l_max))

        # reference regularization rule (Graph.cpp:1901-1960): 1e-1 for
        # PGO, lambda_max/(1e6-1) of the agent's local Q for RA-SLAM.
        # Both branches were 1e-1 until round 4 — the parallel RA scaling
        # mode silently got the PGO constant.
        if g.is_pgo_compatible():
            regs.append(1e-1)
        else:
            from dcora_tpu.solvers import precond_reg

            regs.append(precond_reg(g, g.problem_data()))

    P_batched = jax.tree.map(lambda *xs: jnp.stack(xs), *P_list)

    # precompute the local-block operator and its factored block-Jacobi
    # preconditioner (hoisted out of the round function)
    n_loc, l_loc, t_loc = n_max, l_max, t_max

    def _remap_local(Pb):
        return Pb._replace(
            pp_ri=jnp.minimum(Pb.pp_ri, n_loc),
            pp_rj=jnp.minimum(Pb.pp_rj, n_loc),
            pp_ti=jnp.minimum(Pb.pp_ti, t_loc),
            pp_tj=jnp.minimum(Pb.pp_tj, t_loc),
            pl_ri=jnp.minimum(Pb.pl_ri, n_loc),
            pl_ti=jnp.minimum(Pb.pl_ti, t_loc),
            pl_tj=jnp.minimum(Pb.pl_tj, t_loc),
            rg_ti=jnp.minimum(Pb.rg_ti, t_loc),
            rg_tj=jnp.minimum(Pb.rg_tj, t_loc),
            rg_q=jnp.minimum(Pb.rg_q, l_max),
        )

    P_loc_batched = _remap_local(P_batched)
    # factor the per-agent block-Jacobi on the host (numpy): the vmapped
    # device build pays emulated-f64 scatter-adds and a remote compile per
    # shape on tunneled TPUs (~27 s/agent measured on city10000)
    P_loc_np = jax.tree.map(
        lambda x: np.asarray(x) if x is not None else None, P_loc_batched
    )  # one device->host pull per leaf (not per agent)
    M_list = [
        prob.build_preconditioner_host(
            jax.tree.map(lambda x: x[a_], P_loc_np),
            n_loc, l_max, t_loc - n_loc, d, regs[a_],
        )
        for a_ in range(A)
    ]
    M_batched = jax.tree.map(lambda *xs: jnp.stack(xs), *M_list)

    batched = BatchedProblem(
        P=P_batched,
        P_loc=P_loc_batched,
        M=M_batched,
        fix_pose_src=jnp.asarray(np.stack(fps_list)),
        fix_trans_src=jnp.asarray(np.stack(fts_list)),
        fix_sph_src=jnp.asarray(np.stack(fss_list)),
        pub_pose_idx=jnp.asarray(np.stack(pubp_list)),
        pub_lmk_idx=jnp.asarray(np.stack(publ_list)),
        pub_sph_idx=jnp.asarray(np.stack(pubs_list)),
        n_sizes=jnp.asarray([g.n for g in graphs], dtype=jnp.int32),
        l_sizes=jnp.asarray([g.l for g in graphs], dtype=jnp.int32),
        t_sizes=jnp.asarray([g.n + g.b for g in graphs], dtype=jnp.int32),
    )
    tiled_batched = None
    if backend == "tiled":
        # numpy leaves: build_tiled is a host-side construction; feeding
        # it device arrays costs one device->host pull per leaf per agent
        tiled_batched = _build_tiled_batched(
            P_loc_np, n_max, l_max, b_max, d, regs, tile_dtype, tile_T
        )
    return ParallelRBCDProblem(
        batched=batched, n_max=n_max, l_max=l_max, b_max=b_max,
        t_max=t_max, fp_max=fp_max, ft_max=ft_max, fs_max=fs_max,
        pp_max=pp_max, plm_max=plm_max, ps_max=ps_max, d=d,
        num_agents=A, graphs=graphs, regs=jnp.asarray(np.array(regs)),
        tiled=tiled_batched,
    )


def _build_tiled_batched(P_loc_batched: ProblemData, n_max: int, l_max: int,
                         b_max: int, d: int, regs, tile_dtype, tile_T: int):
    """Per-agent core.tiled problems of Q_bb, stacked along the agent axis.

    Every agent is padded to the same (n_max, l_max, b_max), so all agents
    share one TiledMeta (the static pytree leaf) and the same kpad; only
    the tile count differs, padded here to the per-fleet maximum with zero
    tiles (they accumulate zeros into tile (0, 0) -- harmless).
    """
    from dcora_tpu.core import tiled
    from dcora_tpu.types import ProblemDims

    A = P_loc_batched.pp_ri.shape[0]
    dims = ProblemDims(d=d, n=n_max, l=l_max, b=b_max)
    # host-side numpy builds (as_numpy): pad and stack on the host, then
    # ship ONE [A, ...] device transfer per leaf — A small per-agent
    # transfers dominated the fleet build before (VERDICT r3 weak #6)
    per_agent = []
    for a in range(A):
        P_a = jax.tree.map(lambda x: x[a], P_loc_batched)
        per_agent.append(tiled.build_tiled(
            P_a, dims, T=tile_T, dtype=tile_dtype, reg=float(regs[a]),
            with_pallas=False, tile_precond=l_max > 0, as_numpy=True,
        ))
    m_max = max(int(tp.Q.tiles.shape[0]) for tp in per_agent)

    def pad_tiles(tp):
        m = int(tp.Q.tiles.shape[0])
        if m == m_max:
            return tp
        pad = m_max - m
        Q = tp.Q._replace(
            tiles=np.concatenate(
                [tp.Q.tiles,
                 np.zeros((pad,) + tp.Q.tiles.shape[1:],
                          tp.Q.tiles.dtype)]),
            tile_rows=np.concatenate(
                [tp.Q.tile_rows, np.zeros(pad, np.int32)]),
            tile_cols=np.concatenate(
                [tp.Q.tile_cols, np.zeros(pad, np.int32)]),
        )
        return dataclasses.replace(tp, Q=Q)

    per_agent = [pad_tiles(tp) for tp in per_agent]
    return jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *per_agent)


def pack_states(pp: ParallelRBCDProblem, states: List[RAState]) -> RAState:
    """Stack per-agent local states into padded [A, ...] arrays."""
    r = states[0].r
    A = pp.num_agents
    rot = np.zeros((A, pp.n_max, r, pp.d))
    sph = np.zeros((A, pp.l_max, r))
    trn = np.zeros((A, pp.t_max, r))
    for a, X in enumerate(states):
        g = pp.graphs[a]
        rot[a, : g.n] = np.asarray(X.rot)
        sph[a, : g.l] = np.asarray(X.sph)
        # local trans layout: poses at [0, n_max), landmarks at
        # [n_max, n_max + b)
        trn[a, : g.n] = np.asarray(X.trn[: g.n])
        trn[a, pp.n_max : pp.n_max + g.b] = np.asarray(X.trn[g.n:])
    return RAState(rot=jnp.asarray(rot), sph=jnp.asarray(sph),
                   trn=jnp.asarray(trn))


def unpack_states(pp: ParallelRBCDProblem, X: RAState) -> List[RAState]:
    out = []
    for a in range(pp.num_agents):
        g = pp.graphs[a]
        out.append(
            RAState(
                rot=X.rot[a, : g.n],
                sph=X.sph[a, : g.l],
                trn=jnp.concatenate(
                    [X.trn[a, : g.n],
                     X.trn[a, pp.n_max : pp.n_max + g.b]]
                ),
            )
        )
    return out


def globalize(pp: ParallelRBCDProblem, mesh: Mesh, axis: str = "agents"):
    """Convert the batched problem's host-local arrays into global jax
    Arrays sharded over the mesh axis — required when the mesh spans
    multiple processes (multi-host DCN), where each process holds the full
    host copy but devices are only partially addressable.

    Every process builds the identical BatchedProblem from the same
    dataset, so the per-device shard is just a slice of the local copy
    (jax.make_array_from_callback reads it without any cross-host
    transfer). No-op on a single process.
    """
    if jax.process_count() == 1:
        return pp

    spec = P(axis)

    def to_global(x):
        arr = np.asarray(x)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx]
        )

    batched = jax.tree.map(to_global, pp.batched)
    return dataclasses.replace(pp, batched=batched)


def pack_states_global(pp: ParallelRBCDProblem, states: List[RAState],
                       mesh: Mesh, axis: str = "agents") -> RAState:
    """pack_states + globalize for multi-process meshes."""
    Xb = pack_states(pp, states)
    if jax.process_count() == 1:
        return Xb
    spec = P(axis)

    def to_global(x):
        arr = np.asarray(x)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx]
        )

    return jax.tree.map(to_global, Xb)


def _linear_term(P_a: ProblemData, X_a: RAState, fixed_a: RAState):
    """G from fixed neighbor states (augmented apply)."""
    n_loc = X_a.rot.shape[0]
    l_loc = X_a.sph.shape[0]
    t_loc = X_a.trn.shape[0]
    zeros_local = jax.tree.map(jnp.zeros_like, X_a)
    X_aug = prob.augment(zeros_local, fixed_a)
    return prob.restrict(prob.apply_Q(P_a, X_aug), n_loc, l_loc, t_loc)


def _one_agent_update(P_a: ProblemData, P_loc: ProblemData, M, X_a: RAState,
                      fixed_a: RAState, cfg: RTRConfig, d: int):
    """One single-accepted-step RTR update for one (padded) agent.

    P_loc (fixed slots remapped onto the pad slot) and the factored
    preconditioner M are precomputed in build_parallel_problem."""
    G = _linear_term(P_a, X_a, fixed_a)
    res = _rtr_impl(P_loc, G, M, X_a, cfg)
    return res.X, res.gradnorm_final


def _one_agent_update_tiled(TP_a, P_a: ProblemData, X_a: RAState,
                            fixed_a: RAState, cfg: RTRConfig):
    """Tiled-backend block update: the edge path computes G once per round,
    then the whole RTR solve (cost/grad/Hessian/precond/retract) runs on
    the planar MXU path at the tile dtype."""
    from dcora_tpu.core import tiled

    G = _linear_term(P_a, X_a, fixed_a)
    dt = TP_a.Q.tiles.dtype
    r = X_a.rot.shape[1]
    r_pad = max(8, -(-r // 8) * 8)
    Xf = tiled.to_flat(TP_a, X_a, r_pad=r_pad).astype(dt)
    Gf = tiled.to_flat(TP_a, G, r_pad=r_pad).astype(dt)
    Xp0 = tiled.to_planar(TP_a.meta, Xf)
    Gp = tiled.to_planar(TP_a.meta, Gf)
    res = _rtr_impl(TP_a, Gp, None, Xp0, cfg, be=PLANAR_BACKEND)
    Xf_new = tiled.from_planar(TP_a.meta, res.X)
    X_new = tiled.from_flat(TP_a, Xf_new.astype(X_a.rot.dtype), r=r)
    return X_new, res.gradnorm_final.astype(X_a.rot.dtype)


def make_parallel_round(pp: ParallelRBCDProblem, cfg: RTRConfig,
                        mesh: Mesh, axis: str = "agents"):
    """Build the jitted shard_map round function X -> (X', gradnorms).

    Per round: publish public blocks, all_gather over the mesh axis (the
    ICI separator exchange), gather fixed states, run all block updates in
    parallel (vmap within each shard).
    """
    from jax import shard_map

    B = pp.batched
    TPb = pp.tiled  # None => edge-path block updates
    d = pp.d

    def publish(X: RAState):
        # [A_local, pub_max, ...] public buffers from local blocks
        rot_pad = jnp.concatenate(
            [X.rot, jnp.zeros_like(X.rot[:, :1])], axis=1
        )
        trn_pad = jnp.concatenate(
            [X.trn, jnp.zeros_like(X.trn[:, :1])], axis=1
        )
        sph_pad = jnp.concatenate(
            [X.sph, jnp.zeros_like(X.sph[:, :1])], axis=1
        )
        pub_rot = jnp.take_along_axis(
            rot_pad, B_loc["pub_pose_idx"][:, :, None, None], axis=1
        )
        pub_ptr = jnp.take_along_axis(
            trn_pad, B_loc["pub_pose_idx"][:, :, None], axis=1
        )
        pub_lmk = jnp.take_along_axis(
            trn_pad, B_loc["pub_lmk_idx"][:, :, None], axis=1
        )
        pub_sph = jnp.take_along_axis(
            sph_pad, B_loc["pub_sph_idx"][:, :, None], axis=1
        )
        return pub_rot, pub_ptr, pub_lmk, pub_sph

    B_loc = {}

    def round_fn_shard(P_shard, P_loc_shard, M_shard, TP_shard,
                       fix_pose_src, fix_trans_src, fix_sph_src,
                       pub_pose_idx, pub_lmk_idx, pub_sph_idx,
                       X_rot, X_sph, X_trn):
        X = RAState(rot=X_rot, sph=X_sph, trn=X_trn)
        B_loc["pub_pose_idx"] = pub_pose_idx
        B_loc["pub_lmk_idx"] = pub_lmk_idx
        B_loc["pub_sph_idx"] = pub_sph_idx
        pub_rot, pub_ptr, pub_lmk, pub_sph = publish(X)
        # separator exchange over the mesh axis
        g_rot = jax.lax.all_gather(pub_rot, axis, tiled=True)
        g_ptr = jax.lax.all_gather(pub_ptr, axis, tiled=True)
        g_lmk = jax.lax.all_gather(pub_lmk, axis, tiled=True)
        g_sph = jax.lax.all_gather(pub_sph, axis, tiled=True)

        def fixed_for_agent(fps, fts, fss):
            f_rot = g_rot[fps[:, 0], fps[:, 1]]  # [fp_max, r, d]
            # fixed translations: poses read from the pose pub buffer,
            # landmarks from the landmark pub buffer (kind flag)
            is_pose = (fts[:, 2] == _KIND_POSE)[:, None]
            f_trn = jnp.where(
                is_pose,
                g_ptr[fts[:, 0], fts[:, 1]],
                g_lmk[fts[:, 0], fts[:, 1]],
            )
            f_sph = g_sph[fss[:, 0], fss[:, 1]]
            return RAState(rot=f_rot, sph=f_sph, trn=f_trn)

        fixed = jax.vmap(fixed_for_agent)(
            fix_pose_src, fix_trans_src, fix_sph_src
        )

        if TP_shard is not None:
            def upd_t(TP_a, P_a, X_a, fixed_a):
                return _one_agent_update_tiled(TP_a, P_a, X_a, fixed_a,
                                               cfg)

            X_new, gnorms = jax.vmap(upd_t)(TP_shard, P_shard, X, fixed)
        else:
            def upd(P_a, P_loc_a, M_a, X_a, fixed_a):
                return _one_agent_update(P_a, P_loc_a, M_a, X_a, fixed_a,
                                         cfg, d)

            X_new, gnorms = jax.vmap(upd)(
                P_shard, P_loc_shard, M_shard, X, fixed
            )
        return X_new.rot, X_new.sph, X_new.trn, gnorms

    spec_A = P(axis)

    def specs_like(tree):
        return jax.tree.map(lambda _: spec_A, tree)

    round_sharded = shard_map(
        round_fn_shard,
        mesh=mesh,
        in_specs=(
            specs_like(B.P), specs_like(B.P_loc), specs_like(B.M),
            specs_like(TPb),
            spec_A, spec_A, spec_A,
            spec_A, spec_A, spec_A,
            spec_A, spec_A, spec_A,
        ),
        out_specs=(spec_A, spec_A, spec_A, spec_A),
    )

    # B is passed as an argument (not a closure constant): under
    # multi-host the batched problem is a non-addressable global array,
    # which jit cannot embed as a constant.
    @jax.jit
    def _round(Bp: BatchedProblem, TP, X: RAState):
        rot, sph, trn, gnorms = round_sharded(
            Bp.P, Bp.P_loc, Bp.M, TP,
            Bp.fix_pose_src, Bp.fix_trans_src, Bp.fix_sph_src,
            Bp.pub_pose_idx, Bp.pub_lmk_idx, Bp.pub_sph_idx,
            X.rot, X.sph, X.trn,
        )
        return RAState(rot=rot, sph=sph, trn=trn), gnorms

    def round_fn(X: RAState):
        return _round(B, TPb, X)

    return round_fn
