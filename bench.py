"""Benchmark: lifted PGO RTR throughput on city10000.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

metric: poses*iterations/s of the full Riemannian trust-region step (each
outer iteration runs up to 50 preconditioned tCG inner iterations -- the
reference's hot loop, QuadraticOptimizer.cpp:234-280) on the city10000
benchmark at rank 5.

vs_baseline: ratio against a CPU scipy implementation of the same per-
iteration work (sparse Q SpMV x tCG iters + factorized preconditioner
solves), which stands in for the reference's Eigen/CHOLMOD path since the
reference C++ cannot be built in this sandbox (its deps are FetchContent).
The baseline time is measured once and cached in .bench_baseline.json.
"""

import json
import os
import sys
import time

DATASET = os.environ.get(
    "DCORA_BENCH_DATASET", "/root/reference/data/city10000.g2o"
)
RANK = 5
OUTER_ITERS = 20
TCG_ITERS = 50
BASELINE_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_baseline.json"
)


def measure_cpu_baseline(ds, n, d):
    """Reference-equivalent CPU cost of one RTR outer iteration:
    TCG_ITERS x (sparse SpMV + preconditioner solve) at rank RANK."""
    import numpy as np
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    dh = d + 1
    ms = ds.pose_pose_measurements
    rows, cols, vals = [], [], []

    def add_block(bi, bj, B):
        for r_ in range(B.shape[0]):
            for c_ in range(B.shape[1]):
                v = B[r_, c_]
                if v != 0:
                    rows.append(bi + r_)
                    cols.append(bj + c_)
                    vals.append(v)

    for m in ms:
        i, j = m.p1, m.p2
        kap, tau = m.kappa, m.tau
        T = np.zeros((dh, dh))
        T[:d, :d] = m.R
        T[:d, d] = m.t
        T[d, d] = 1.0
        Om = np.diag([kap] * d + [tau])
        add_block(i * dh, i * dh, T @ Om @ T.T)
        add_block(j * dh, j * dh, Om)
        add_block(i * dh, j * dh, -T @ Om)
        add_block(j * dh, i * dh, -(T @ Om).T)
    Q = sp.csr_matrix(
        (vals, (rows, cols)), shape=(dh * n, dh * n)
    )
    # block-diagonal preconditioner factorization (one-time, excluded)
    D = sp.block_diag(
        [np.asarray(Q[i * dh:(i + 1) * dh, i * dh:(i + 1) * dh].todense())
         + 0.1 * np.eye(dh) for i in range(n)]
    ).tocsc()
    solve = spla.factorized(D)

    rng = np.random.default_rng(0)
    V = rng.standard_normal((dh * n, RANK))
    # warm up
    _ = Q @ V
    _ = solve(V)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        W = V
        for _ in range(TCG_ITERS):
            W = Q @ W
            W = solve(W)
        float(W[0, 0])
    per_outer = (time.time() - t0) / reps
    return per_outer


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import dcora_tpu  # noqa: F401
    from dcora_tpu.core import lifted, tiled
    from dcora_tpu.core.graph import LocalGraph
    from dcora_tpu.core.init import odometry_initialization
    from dcora_tpu.core.rtr import RTRConfig, rtr_flat
    from dcora_tpu.io import read_g2o_file

    ds = read_g2o_file(DATASET)
    n, d = ds.num_poses, ds.dim
    g = LocalGraph(0, RANK, d)
    g.set_measurements(ds.pose_pose_measurements)
    P = g.problem_data()
    # TPU production path: RCM-tiled block-sparse Q (f32 tiles on the MXU)
    # with flat-layout manifold ops; the same per-outer-iteration work as
    # the CPU baseline (up to TCG_ITERS preconditioned tCG steps + the
    # trust-region accept/reject evaluations).  f64-refinement parity of
    # this path is covered by tests/test_tiled.py.
    TP = tiled.build_tiled(P, g.dims, T=128, dtype=np.float32)
    cfg = RTRConfig(gradnorm_tol=1e-300, max_outer=OUTER_ITERS,
                    max_inner=TCG_ITERS)

    T = odometry_initialization(
        [m for m in ds.pose_pose_measurements if m.p1 + 1 == m.p2]
    )
    X0 = lifted.pad_rank(lifted.from_pose_array(T), RANK)
    Xf0 = tiled.to_flat(TP, X0, r_pad=8).astype(jnp.float32)

    res = rtr_flat(TP, None, Xf0, cfg)  # compile + warmup
    jax.block_until_ready(res.X)

    t0 = time.time()
    res = rtr_flat(TP, None, Xf0, cfg)
    jax.block_until_ready(res.X)
    elapsed = time.time() - t0
    iters = int(res.outer_iters)
    iters_per_s = iters / elapsed
    poses_iters_per_s = n * iters_per_s

    # CPU baseline (cached)
    key = f"{os.path.basename(DATASET)}:r{RANK}:tcg{TCG_ITERS}"
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        try:
            cache = json.load(open(BASELINE_CACHE))
        except Exception:
            cache = {}
    if key not in cache:
        cache[key] = measure_cpu_baseline(ds, n, d)
        try:
            json.dump(cache, open(BASELINE_CACHE, "w"))
        except Exception:
            pass
    cpu_per_outer = cache[key]
    tpu_per_outer = elapsed / max(iters, 1)
    vs_baseline = cpu_per_outer / tpu_per_outer

    print(json.dumps({
        "metric": (
            f"lifted-PGO RTR poses*iters/s on "
            f"{os.path.basename(DATASET)} (rank {RANK}, "
            f"{TCG_ITERS} tCG/iter)"
        ),
        "value": round(poses_iters_per_s, 1),
        "unit": "poses*iters/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
