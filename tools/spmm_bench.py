"""Microbenchmark for the Hessian SpMM backends on the real TPU.

Measures the per-call wall time of
  * the XLA tiled path (gather -> batched dot -> segment_sum),
  * the per-tile symmetric Pallas kernel (spmm_symmetric),
  * the row-grouped wide-N symmetric Pallas kernel (spmm_grouped) at
    several group widths G,
and reports them against the HBM roofline of each representation
(tile bytes / ~800 GB/s).  Single TPU process -- do not run while
another TPU job is active.

Usage: python tools/spmm_bench.py [dataset.g2o] [rank]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np  # noqa: E402


def timeit(fn, *args, reps=50):
    """Time fn inside ONE jitted fori_loop: per-call dispatch through the
    axon tunnel costs ~1-2 ms, so eager rep loops measure dispatch, not
    the kernel.  A 0.999 rescale between calls enforces the data
    dependency without changing the memory/compute profile."""
    import functools

    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(X, n):
        # dynamic trip count -> one compilation serves every rep count
        return jax.lax.fori_loop(0, n, lambda i, Y: fn(Y) * 0.999, X,
                                 unroll=False)

    out = loop(*args, n=2)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(*args, n=2)
    jax.block_until_ready(out)
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = loop(*args, n=reps + 2)
    jax.block_until_ready(out)
    tot = time.perf_counter() - t0
    return (tot - base) / reps, fn(*args)


def main():
    import jax
    import jax.numpy as jnp

    import dcora_tpu  # noqa: F401
    from dcora_tpu.core import pallas_spmm, tiled
    from dcora_tpu.core.graph import LocalGraph
    from dcora_tpu.io import read_g2o_file

    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/data/city10000.g2o"
    rank = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    r_pad = -(-rank // 8) * 8

    ds = read_g2o_file(path)
    g = LocalGraph(0, rank, ds.dim)
    g.set_measurements(ds.pose_pose_measurements)
    P = g.problem_data()
    TP = tiled.build_tiled(P, g.dims, T=128, dtype=np.float32,
                           with_pallas=False)
    m = int(TP.Q.tiles.shape[0])
    T = TP.meta.T
    full_mb = m * T * T * 4 / 1e6
    print(f"{os.path.basename(path)}: n={g.dims.n} k={TP.meta.k} "
          f"nt={TP.meta.nt} tiles={m} ({full_mb:.1f} MB) r_pad={r_pad}")
    print(f"HBM roofline (819 GB/s): full {full_mb / 819:.3f} ms, "
          f"sym {0.585 * full_mb / 819:.3f} ms")

    rng = np.random.default_rng(0)
    Xf = jnp.asarray(
        rng.standard_normal((r_pad, TP.meta.kpad)).astype(np.float32))

    apply_xla = jax.jit(lambda X: tiled.apply_tiled(TP, X))
    t_xla, ref = timeit(apply_xla, Xf)
    print(f"XLA tiled path:            {t_xla * 1e3:8.3f} ms")

    def check(out, label):
        err = float(jnp.max(jnp.abs(out - ref))
                    / (jnp.max(jnp.abs(ref)) + 1e-30))
        flag = "" if err < 1e-4 else "   <-- MISMATCH"
        print(f"   {label} rel err {err:.2e}{flag}")

    # per-tile symmetric kernel
    trow = np.asarray(TP.Q.tile_rows)
    tcol = np.asarray(TP.Q.tile_cols)
    dense = np.asarray(TP.Q.tiles)
    up = trow <= tcol
    sr = jnp.asarray(trow[up])
    sc = jnp.asarray(tcol[up])
    st = jnp.asarray(dense[up])
    try:
        t_sym, out = timeit(
            lambda X: pallas_spmm.spmm_symmetric(sr, sc, st, X, T=T), Xf)
        print(f"Pallas per-tile symmetric: {t_sym * 1e3:8.3f} ms")
        check(out, "per-tile")
    except Exception as e:  # noqa: BLE001
        print(f"Pallas per-tile symmetric: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}")

    for G in (2, 4, 8, 16):
        gr, gc, gw = pallas_spmm.build_row_groups(
            trow[up], tcol[up], dense[up], T=T, G=G)
        grj, gcj, gwj = jnp.asarray(gr), jnp.asarray(gc), jnp.asarray(gw)
        mb = gw.size * 4 / 1e6
        try:
            t_grp, out = timeit(
                lambda X: pallas_spmm.spmm_grouped(grj, gcj, gwj, X,
                                                   T=T, G=G), Xf)
            print(f"Pallas grouped G={G:<2d} ({len(gr):5d} grp, "
                  f"{mb:6.1f} MB): {t_grp * 1e3:8.3f} ms")
            check(out, f"G={G}")
        except Exception as e:  # noqa: BLE001
            print(f"Pallas grouped G={G}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")

    # bucketed multi-width grouping (exact streamed bytes)
    buckets = pallas_spmm.build_row_groups_bucketed(
        trow[up], tcol[up], dense[up], T=T)
    bj = [(jnp.asarray(gr), jnp.asarray(gc), jnp.asarray(gw))
          for gr, gc, gw in buckets]
    mb = sum(gw.size for _, _, gw in buckets) * 4 / 1e6
    widths = [gc.shape[1] for _, gc, _ in buckets]
    try:
        t_bkt, out = timeit(
            lambda X: pallas_spmm.spmm_bucketed(bj, X, T=T), Xf)
        print(f"Pallas bucketed W={widths} "
              f"({sum(len(b[0]) for b in buckets):5d} grp, "
              f"{mb:6.1f} MB): {t_bkt * 1e3:8.3f} ms")
        check(out, "bucketed")
    except Exception as e:  # noqa: BLE001
        print(f"Pallas bucketed: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}")

    # two-row K-fused pairing (halves MXU issues; the r_pad=8 fix)
    pbuckets = pallas_spmm.build_row_pairs_bucketed(
        trow[up], tcol[up], dense[up], T=T)
    pj = [(jnp.asarray(gr), jnp.asarray(gc), jnp.asarray(gw))
          for gr, gc, gw in pbuckets]
    mb = sum(gw.size for _, _, gw in pbuckets) * 4 / 1e6
    widths = [gc.shape[1] for _, gc, _ in pbuckets]
    npair = sum(len(b[0]) for b in pbuckets
                if b[2].shape[1] == 2 * T)
    try:
        t_pair, out = timeit(
            lambda X: pallas_spmm.spmm_bucketed(pj, X, T=T), Xf)
        print(f"Pallas paired W={widths} "
              f"({npair:5d} fused grp, {mb:6.1f} MB): "
              f"{t_pair * 1e3:8.3f} ms")
        check(out, "paired")
    except Exception as e:  # noqa: BLE001
        print(f"Pallas paired: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
