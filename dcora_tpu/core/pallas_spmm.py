"""Pallas TPU kernel for the block-sparse symmetric SpMM  W = X Q.

This is the single hottest op of the framework (the tCG Hessian product,
reference QuadraticProblem.cpp:61-68).  The XLA tile path in tiled.py
(gather -> batched dot_general -> segment_sum) reads every stored tile once
and runs at ~2x the HBM-bandwidth bound because the three HLOs cannot fuse
and each materializes its [m, r_pad, T] intermediate.

This kernel exploits symmetry of Q: only the upper-triangular tiles
(tile_row <= tile_col) are stored; each streamed tile A contributes

    W[:, col]  +=  X[:, row] @ A
    W[:, row]  +=  X[:, col] @ A^T        (skipped on diagonal tiles)

with X and W resident in VMEM (r_pad x kpad f32 each; <= ~2.5 MB for every
bundled dataset) and tiles double-buffer DMA'd from HBM inside one kernel
invocation (the tunneled AOT TPU compiler in this environment rejects
gridded Pallas kernels, so the tile loop is an in-kernel fori_loop).
Memory traffic is ~0.6x the full tile bytes, read exactly once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


CHUNK = 8  # tiles per DMA: 512 KB transfers amortize DMA + loop overhead

GROUP = 8  # tiles per row-group in the grouped kernel (wide-N matmul width)


def _spmm_kernel(rows_ref, cols_ref, x_ref, tiles_hbm, out_ref, *,
                 T: int, m: int):
    nchunks = m // CHUNK  # m is padded to a CHUNK multiple by the caller

    def body(scratch, sem):
        one = jnp.int32(1)
        two = jnp.int32(2)

        def get_dma(slot, chunk_idx):
            return pltpu.make_async_copy(
                tiles_hbm.at[pl.ds(chunk_idx * CHUNK, CHUNK)],
                scratch.at[slot],
                sem.at[slot],
            )

        out_ref[:, :] = jnp.zeros_like(out_ref)
        get_dma(jnp.int32(0), jnp.int32(0)).start()

        # i32 loop counter: tpu.memref_slice rejects i64 (jax x64 default)
        def loop(ci, carry):
            slot = jax.lax.rem(ci, two)

            @pl.when(ci + one < nchunks)
            def _prefetch():
                get_dma(jax.lax.rem(ci + one, two), ci + one).start()

            get_dma(slot, ci).wait()
            base = ci * jnp.int32(CHUNK)
            for j in range(CHUNK):
                A = scratch[slot, j]
                r = rows_ref[base + j]
                c = cols_ref[base + j]
                ro = pl.multiple_of(r * T, T)
                co = pl.multiple_of(c * T, T)
                Xr = x_ref[:, pl.ds(ro, T)]
                out_ref[:, pl.ds(co, T)] += jnp.dot(
                    Xr, A, preferred_element_type=jnp.float32
                )

                @pl.when(r != c)
                def _sym(A=A, r=r, c=c, ro=ro, co=co):
                    Xc = x_ref[:, pl.ds(co, T)]
                    out_ref[:, pl.ds(ro, T)] += jax.lax.dot_general(
                        Xc, A, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

            return carry

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(nchunks), loop,
                          jnp.int32(0))

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((2, CHUNK, T, T), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("T",))
def spmm_symmetric(rows: jax.Array, cols: jax.Array, tiles: jax.Array,
                   Xf: jax.Array, T: int = 128) -> jax.Array:
    """W = Xf Q from the upper-triangular tile list (f32, TPU).

    rows/cols: i32[m] with rows <= cols; tiles: f32[m, T, T]; Xf: f32
    [r_pad, kpad].  The caller should pad m to a CHUNK multiple with zero
    tiles (rows == cols == 0) -- padding is also done here as a fallback.
    """
    m = tiles.shape[0]
    if m % CHUNK:
        pad = CHUNK - m % CHUNK
        tiles = jnp.concatenate(
            [tiles, jnp.zeros((pad,) + tiles.shape[1:], tiles.dtype)])
        rows = jnp.concatenate([rows, jnp.zeros(pad, rows.dtype)])
        cols = jnp.concatenate([cols, jnp.zeros(pad, cols.dtype)])
        m = m + pad
    return pl.pallas_call(
        functools.partial(_spmm_kernel, T=T, m=m),
        out_shape=jax.ShapeDtypeStruct(Xf.shape, Xf.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # tile rows
            pl.BlockSpec(memory_space=pltpu.SMEM),   # tile cols
            pl.BlockSpec(memory_space=pltpu.VMEM),   # X (resident)
            pl.BlockSpec(memory_space=pl.ANY),    # tiles (stay in HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * T * T * Xf.shape[0],
            bytes_accessed=tiles.size * 4 + 2 * Xf.size * 4,
            transcendentals=0,
        ),
    )(rows, cols, Xf, tiles)


def build_row_groups(rows, cols, tiles, T: int = 128, G: int = GROUP):
    """Host-side: pack the upper-triangular tile list into row-groups.

    Tiles sharing a tile-row are concatenated side-by-side into wide
    [T, G*T] buffers (padded per row with zero tiles whose col == row, so
    both kernel passes add exactly zero for padding slots).  One wide
    buffer turns G tiny [r,T]@[T,T] matmuls into a single [r,T]@[T,G*T]
    wide-N matmul -- amortizing the MXU issue/fill cost that makes the
    per-tile kernel issue-bound at small relaxation ranks (NOTES.md lead
    1a), and giving XLA/Mosaic an N large enough to split across MXUs.

    Returns (grows i32[ngroups], gcols i32[ngroups, G],
    wide f32[ngroups, T, G*T]) as numpy arrays.
    """
    import numpy as np

    rows = np.asarray(rows)
    cols = np.asarray(cols)
    tiles = np.asarray(tiles)
    order = np.argsort(rows, kind="stable")
    rows, cols, tiles = rows[order], cols[order], tiles[order]

    grows, gcols, gtiles = [], [], []
    i = 0
    m = len(rows)
    while i < m:
        r = rows[i]
        j = i
        while j < m and rows[j] == r:
            j += 1
        for s in range(i, j, G):
            chunk = slice(s, min(s + G, j))
            cs = cols[chunk]
            ts = tiles[chunk]
            pad = G - len(cs)
            if pad:
                cs = np.concatenate([cs, np.full(pad, r, cs.dtype)])
                ts = np.concatenate(
                    [ts, np.zeros((pad, T, T), ts.dtype)])
            grows.append(r)
            gcols.append(cs)
            gtiles.append(np.concatenate(list(ts), axis=1))  # [T, G*T]
        i = j
    if not grows:
        grows = [0]
        gcols = [np.zeros(G, np.int32)]
        gtiles = [np.zeros((T, G * T), np.float32)]
    return (np.asarray(grows, np.int32),
            np.asarray(gcols, np.int32).reshape(len(grows), G),
            np.stack(gtiles).astype(np.float32))


def _row_partition_widths(counts, widths, pen: float):
    """DP: cheapest way to cover a row of t tiles with groups whose widths
    come from `widths`, costing (streamed tiles + pen per group).  Returns
    {t: (cost, first_width)} for every t in counts."""
    tmax = max(counts)
    INF = float("inf")
    cost = [0.0] + [INF] * tmax
    first = [0] * (tmax + 1)
    for t in range(1, tmax + 1):
        for w in widths:
            c = w + pen + cost[max(0, t - w)]
            if c < cost[t]:
                cost[t] = c
                first[t] = w
    return cost, first


def choose_bucket_widths(tile_counts, max_widths: int = 3,
                         pen: float = 0.75):
    """Pick <= max_widths group widths minimizing streamed tiles + a
    per-group issue penalty (`pen`, in tile-bandwidth units) over the
    per-row tile-count histogram.  Brute force: candidate widths are
    1..min(max count, 16), histograms are tiny."""
    import itertools

    import numpy as np

    counts = np.asarray(tile_counts)
    hist = {}
    for t in counts:
        hist[int(t)] = hist.get(int(t), 0) + 1
    cand = range(1, min(max(hist) if hist else 1, 16) + 1)
    best, best_w = float("inf"), (8,)
    for k in range(1, max_widths + 1):
        for W in itertools.combinations(cand, k):
            cost, _ = _row_partition_widths(hist, W, pen)
            tot = sum(nrows * cost[t] for t, nrows in hist.items())
            if tot < best:
                best, best_w = tot, W
    return tuple(sorted(best_w))


def build_row_groups_bucketed(rows, cols, tiles, T: int = 128,
                              max_widths: int = 3, pen: float = 0.75):
    """Host-side: pack the upper-triangular tile list into row-groups of
    SEVERAL widths so streamed bytes stay ~1.0x the stored tiles.

    The fixed-G layout (build_row_groups) zero-pads every row to a G
    multiple; with the RCM band's ~4-5 tiles/row that streams ~2x the
    tile bytes at G=8 (measured on city10000: 1880/921 tiles) — the
    whole gap between the kernel's ~0.19 ms and the ~0.13 ms HBM
    roofline.  Here each row is partitioned into groups whose widths are
    chosen per-dataset by a small DP over the tile-count histogram
    (choose_bucket_widths), and one kernel instance per width streams
    exact bytes.  Returns [(grows, gcols, wide), ...] — one triple per
    width, shapes as in build_row_groups; G = gcols.shape[1].
    """
    import numpy as np

    rows = np.asarray(rows)
    cols = np.asarray(cols)
    tiles = np.asarray(tiles)
    order = np.argsort(rows, kind="stable")
    rows, cols, tiles = rows[order], cols[order], tiles[order]

    # per-row tile counts (rows are sorted)
    uniq, starts, counts = np.unique(rows, return_index=True,
                                     return_counts=True)
    if not len(uniq):
        return [(np.zeros(1, np.int32), np.zeros((1, 1), np.int32),
                 np.zeros((1, T, T), np.float32))]
    widths = choose_bucket_widths(counts, max_widths=max_widths, pen=pen)
    _, first = _row_partition_widths(
        {int(t): 1 for t in counts}, widths, pen)

    per_w = {w: ([], [], []) for w in widths}
    for r, s, t in zip(uniq, starts, counts):
        i = int(s)
        left = int(t)
        while left > 0:
            w = first[left]
            take = min(w, left)
            cs = cols[i:i + take]
            ts = tiles[i:i + take]
            if take < w:
                cs = np.concatenate([cs, np.full(w - take, r, cs.dtype)])
                ts = np.concatenate(
                    [ts, np.zeros((w - take, T, T), ts.dtype)])
            g = per_w[w]
            g[0].append(r)
            g[1].append(cs)
            g[2].append(np.concatenate(list(ts), axis=1))
            i += take
            left -= take
    out = []
    for w in widths:
        gr, gc, gt = per_w[w]
        if not gr:
            continue
        out.append((np.asarray(gr, np.int32),
                    np.asarray(gc, np.int32).reshape(len(gr), w),
                    np.stack(gt).astype(np.float32)))
    return out


def spmm_bucketed(buckets, Xf: jax.Array, T: int = 128,
                  interpret: bool = False) -> jax.Array:
    """W = Xf Q summed over per-width grouped kernels (see
    build_row_groups_bucketed).  `buckets` is a sequence of
    (grows, gcols, wide) jax arrays; G is derived from gcols.shape[1]."""
    W = None
    for grows, gcols, wide in buckets:
        Y = spmm_grouped(grows, gcols, wide, Xf, T=T,
                         G=int(gcols.shape[1]), interpret=interpret)
        W = Y if W is None else W + Y
    return W


def _grouped_kernel(grows_ref, gcols_ref, x_ref, wide_hbm, out_ref, *,
                    T: int, G: int, ngroups: int, interpret: bool = False):
    W = G * T

    def body(scratch, xcat, sem):
        one = jnp.int32(1)
        two = jnp.int32(2)

        def get_dma(slot, gi):
            return pltpu.make_async_copy(
                wide_hbm.at[gi], scratch.at[slot], sem.at[slot])

        out_ref[:, :] = jnp.zeros_like(out_ref)
        get_dma(jnp.int32(0), jnp.int32(0)).start()

        def loop(gi, carry):
            slot = jax.lax.rem(gi, two)

            @pl.when(gi + one < ngroups)
            def _prefetch():
                get_dma(jax.lax.rem(gi + one, two), gi + one).start()

            get_dma(slot, gi).wait()
            r = grows_ref[gi]
            # gcols is FLATTENED i32[ngroups*G]: a 2-D SMEM array pads
            # every G-int row to a full 512-byte lane, which overflows
            # the 1 MB scalar window at g2o100k scale (2103 groups
            # -> 1.05 MB for 25 KB of indices)
            ro = pl.multiple_of(r * T, T)
            Xr = x_ref[:, pl.ds(ro, T)]
            # forward: one wide-N matmul covers all G tiles of the group
            Y = jnp.dot(Xr, scratch[slot],
                        preferred_element_type=jnp.float32)  # [r_pad, G*T]
            for j in range(G):
                c = gcols_ref[gi * G + j]
                co = pl.multiple_of(c * T, T)
                out_ref[:, pl.ds(co, T)] += Y[:, j * T:(j + 1) * T]
                # gather the symmetric operand; zero the slot when the
                # tile sits on the diagonal (it must be applied once only)
                Xc = x_ref[:, pl.ds(co, T)]
                xcat[:, j * T:(j + 1) * T] = jnp.where(c == r,
                                                       jnp.zeros_like(Xc),
                                                       Xc)
            # symmetric: [r_pad, G*T] x [T, G*T]^T -- a single NT matmul
            Y2 = jax.lax.dot_general(
                xcat[:, :], scratch[slot], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [r_pad, T]
            out_ref[:, pl.ds(ro, T)] += Y2
            return carry

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(ngroups), loop,
                          jnp.int32(0))

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((2, T, W), jnp.float32),
        xcat=pltpu.VMEM((out_ref.shape[0], W), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("T", "G", "interpret"))
def spmm_grouped(grows: jax.Array, gcols: jax.Array, wide: jax.Array,
                 Xf: jax.Array, T: int = 128, G: int = GROUP,
                 interpret: bool = False) -> jax.Array:
    """W = Xf Q from the row-grouped upper-triangular wide-tile layout.

    grows: i32[ngroups]; gcols: i32[ngroups, G]; wide: f32[ngroups, T, G*T]
    (from build_row_groups); Xf: f32[r_pad, kpad].
    """
    ngroups = wide.shape[0]
    gcols = gcols.reshape(-1)  # flat SMEM layout (see kernel comment)
    return pl.pallas_call(
        functools.partial(_grouped_kernel, T=T, G=G, ngroups=ngroups,
                          interpret=interpret),
        out_shape=jax.ShapeDtypeStruct(Xf.shape, Xf.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # group rows
            pl.BlockSpec(memory_space=pltpu.SMEM),   # group cols
            pl.BlockSpec(memory_space=pltpu.VMEM),   # X (resident)
            pl.BlockSpec(memory_space=pl.ANY),    # wide tiles (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=8 * ngroups * Xf.shape[0] * T * G * T,
            bytes_accessed=wide.size * 4 + 2 * Xf.size * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(grows, gcols, Xf, wide)


def pallas_available() -> bool:
    """The kernel needs a real TPU backend (not CPU interpret mode)."""
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
