"""Independent dense oracles for cross-implementation testing.

These construct the data matrix Q explicitly from incidence matrices with
scipy, following the *documented formulas* of the reference
(Graph.cpp:594-683 for PGO: Q = AᵀΩA in the SE-interleaved basis;
Graph.cpp:847-1188 for RA-SLAM: block Q from ARho/ATau/T/C/D/P), providing a
construction path fully independent of the framework's matrix-free engine.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def dense_Q_pgo_se(measurements, n: int, d: int) -> np.ndarray:
    """Q = AᵀΩA in the SE interleaved ordering [Y1 p1 ... Yn pn]."""
    dh = d + 1
    m = len(measurements)
    AT = sp.lil_matrix((dh * n, dh * m))
    omega = np.zeros(dh * m)
    for k, meas in enumerate(measurements):
        i, j = meas.p1, meas.p2
        w = meas.weight
        omega[k * dh : k * dh + d] = w * meas.kappa
        omega[k * dh + d] = w * meas.tau
        # tail: -T block
        AT[i * dh : i * dh + d, k * dh : k * dh + d] = -meas.R
        AT[i * dh : i * dh + d, k * dh + d] = -meas.t.reshape(-1, 1)
        AT[i * dh + d, k * dh + d] = -1.0
        # head: +I
        for r in range(dh):
            AT[j * dh + r, k * dh + r] = 1.0
    AT = AT.tocsr()
    Q = AT @ sp.diags(omega) @ AT.T
    return np.asarray(Q.todense())


def dense_Q_ra(pose_pose, pose_landmark, ranges, n: int, l: int,  # noqa: E741
               b: int, d: int) -> np.ndarray:
    """RA-ordered Q = [rot dn | sph l | trn n | lmk b] from incidence mats."""
    mpp = len(pose_pose)
    mpl = len(pose_landmark)
    mrg = len(ranges)
    mpose = mpp + mpl

    ARhoT = sp.lil_matrix((d * n, d * mpp))
    ATauT = sp.lil_matrix((n + b, mpose))
    TT = sp.lil_matrix((d * n, mpose))
    omega_rho = np.zeros(d * mpp)
    omega_tau = np.zeros(mpose)

    for k, meas in enumerate(pose_pose):
        i, j = meas.p1, meas.p2
        w = meas.weight
        omega_rho[k * d : (k + 1) * d] = w * meas.kappa
        omega_tau[k] = w * meas.tau
        ARhoT[i * d : (i + 1) * d, k * d : (k + 1) * d] = -meas.R
        for r in range(d):
            ARhoT[j * d + r, k * d + r] = 1.0
        TT[i * d : (i + 1) * d, k] = -meas.t.reshape(-1, 1)
        ATauT[i, k] = -1.0
        ATauT[j, k] = 1.0

    for kk, meas in enumerate(pose_landmark):
        k = mpp + kk
        i, j = meas.p1, meas.p2
        omega_tau[k] = meas.weight * meas.tau
        TT[i * d : (i + 1) * d, k] = -meas.t.reshape(-1, 1)
        ATauT[i, k] = -1.0
        ATauT[n + j, k] = 1.0

    CT = sp.lil_matrix((n + b, mrg))
    PT = sp.lil_matrix((l, mrg))
    DT = sp.lil_matrix((mrg, mrg))
    omega_rng = np.zeros(mrg)

    def trans_idx(p, st):
        from dcora_tpu.types import StateType

        return p if st == StateType.Pose else n + p

    for k, meas in enumerate(ranges):
        omega_rng[k] = meas.weight * meas.precision
        DT[k, k] = meas.range
        PT[meas.l, k] = 1.0
        CT[trans_idx(meas.p1, meas.stateType1), k] = -1.0
        CT[trans_idx(meas.p2, meas.stateType2), k] = 1.0

    ARhoT, ATauT, TT, CT, PT, DT = (
        x.tocsr() for x in (ARhoT, ATauT, TT, CT, PT, DT)
    )
    ORho = sp.diags(omega_rho)
    OTau = sp.diags(omega_tau)
    ORng = sp.diags(omega_rng)

    Q11 = ARhoT @ ORho @ ARhoT.T + TT @ OTau @ TT.T
    Q13 = TT @ OTau @ ATauT.T
    Q22 = PT @ ORng @ DT @ DT @ PT.T
    Q23 = PT @ DT @ ORng @ CT.T
    Q33 = ATauT @ OTau @ ATauT.T + CT @ ORng @ CT.T

    k_dim = d * n + l + n + b
    Q = np.zeros((k_dim, k_dim))
    rs = d * n  # rot size
    rrs = rs + l
    Q[:rs, :rs] = Q11.todense()
    Q[:rs, rrs:] = Q13.todense()
    Q[rrs:, :rs] = Q13.todense().T
    Q[rs:rrs, rs:rrs] = Q22.todense()
    Q[rs:rrs, rrs:] = Q23.todense()
    Q[rrs:, rs:rrs] = Q23.todense().T
    Q[rrs:, rrs:] = Q33.todense()
    return Q


def se_to_ra_permutation(n: int, d: int) -> np.ndarray:
    """Permutation matrix Pm with  x_ra = x_se @ Pm  column reordering.

    SE ordering: [Y1 p1 Y2 p2 ...]; RA (l=b=0): [Y1..Yn | p1..pn].
    Returns index array perm with ra_cols = se_cols[perm].
    """
    dh = d + 1
    perm = np.zeros((dh) * n, dtype=np.int64)
    for i in range(n):
        for c in range(d):
            perm[i * d + c] = i * dh + c  # rotation cols
        perm[d * n + i] = i * dh + d  # translation col
    return perm
