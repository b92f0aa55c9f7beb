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
    build_row_groups_bucketed / build_row_pairs_bucketed).  `buckets` is a
    sequence of (grows, gcols, wide) jax arrays; G comes from
    gcols.shape[1].  A bucket whose wide buffer has 2T contraction rows is
    a two-row K-fused bucket and dispatches to the paired kernel."""
    W = None
    for grows, gcols, wide in buckets:
        if wide.shape[1] == 2 * T:
            Y = spmm_paired(grows, gcols, wide, Xf, T=T,
                            G=int(gcols.shape[1]), interpret=interpret)
        else:
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


def build_row_pairs_bucketed(rows, cols, tiles, T: int = 128,
                             max_widths: int = 3, pen: float = 0.75):
    """Host-side: pack the tile list into TWO-tile-row K-fused groups.

    At r_pad=8 the single-row grouped kernel is ISSUE-bound, not
    bytes-bound (NOTES r_pad sweep: 0.126 ms vs the 0.075 ms symmetric
    roofline on city10000; the same kernel at r_pad=16 runs AT roofline
    because each matmul issue covers twice the arithmetic).  This layout
    reaches the same effect at r_pad=8 by fusing two tile-rows into every
    matmul along the CONTRACTION axis: for a row pair (r1 < r2) with
    union column set {c_j}, the wide buffer stacks the two rows' subtiles

        A = [[A_{r1,c_1} .. A_{r1,c_w}],      # rows 0..T
             [A_{r2,c_1} .. A_{r2,c_w}]]      # rows T..2T  ([2T, w*T])

    so the forward pass is ONE [r,2T]@[2T,wT] matmul computing
    X_{r1} A_1 + X_{r2} A_2 — correct because both rows contribute
    additively to the same output columns — and the symmetric pass is ONE
    NT matmul whose [r, 2T] result splits into the r1 / r2 output tiles.
    Issue count halves; streamed bytes grow only by the non-overlap of
    adjacent RCM rows' column sets (band structure makes this small).

    Correctness constraints baked into the packing:
      * consecutive RCM tile-rows are paired (max column overlap);
      * a diagonal tile (r2, r2) cannot ride the fused NT pass (the
        kernel's xcat zeroing for c == r1 is safe only because
        A_{r2, r1} is strictly lower-triangular, hence absent) — such
        tiles are routed to a single-row leftover bucket;
      * pad slots use column r1 with all-zero subtiles.

    Returns a list of (grows i32[ng, 2], gcols i32[ng, w],
    wide f32[ng, 2T, w*T]) plus single-row buckets for the leftovers,
    consumable by spmm_bucketed.
    """
    import numpy as np

    rows = np.asarray(rows)
    cols = np.asarray(cols)
    tiles = np.asarray(tiles)
    by_row: dict = {}
    for r, c, t in zip(rows, cols, tiles):
        by_row.setdefault(int(r), {})[int(c)] = t

    all_rows = sorted(by_row)
    pairs = []
    lo_r, lo_c, lo_t = [], [], []  # leftover single-row tiles

    def spill(r, cmap):
        for c, t in sorted(cmap.items()):
            lo_r.append(r)
            lo_c.append(c)
            lo_t.append(t)

    i = 0
    while i < len(all_rows):
        if i + 1 >= len(all_rows):
            spill(all_rows[i], by_row[all_rows[i]])
            i += 1
            continue
        r1, r2 = all_rows[i], all_rows[i + 1]
        m1 = by_row[r1]
        m2 = dict(by_row[r2])
        if r2 in m2:  # (r2, r2) diagonal: see docstring
            lo_r.append(r2)
            lo_c.append(r2)
            lo_t.append(m2.pop(r2))
        ucols = sorted(set(m1) | set(m2))
        if ucols:
            pairs.append((r1, r2, ucols, m1, m2))
        i += 2

    out = []
    if pairs:
        union_counts = [len(p[2]) for p in pairs]
        widths = choose_bucket_widths(union_counts, max_widths=max_widths,
                                      pen=pen)
        _, first = _row_partition_widths(
            {int(t): 1 for t in union_counts}, widths, pen)
        per_w = {w: ([], [], []) for w in widths}
        for r1, r2, ucols, m1, m2 in pairs:
            left = len(ucols)
            i0 = 0
            while left > 0:
                w = first[left]
                take = min(w, left)
                cs = np.full(w, r1, np.int32)
                sub = np.zeros((2 * T, w * T), np.float32)
                for j, c in enumerate(ucols[i0:i0 + take]):
                    cs[j] = c
                    if c in m1:
                        sub[:T, j * T:(j + 1) * T] = m1[c]
                    if c in m2:
                        sub[T:, j * T:(j + 1) * T] = m2[c]
                g = per_w[w]
                g[0].append((r1, r2))
                g[1].append(cs)
                g[2].append(sub)
                i0 += take
                left -= take
        for w in widths:
            gr, gc, gt = per_w[w]
            if not gr:
                continue
            out.append((np.asarray(gr, np.int32).reshape(len(gr), 2),
                        np.asarray(gc, np.int32).reshape(len(gr), w),
                        np.stack(gt)))
    if lo_r:
        out.extend(build_row_groups_bucketed(
            np.asarray(lo_r, np.int32), np.asarray(lo_c, np.int32),
            np.stack(lo_t), T=T, max_widths=max_widths, pen=pen))
    if not out:
        out = [(np.zeros(1, np.int32), np.zeros((1, 1), np.int32),
                np.zeros((1, T, T), np.float32))]
    return out


def _paired_kernel(grows_ref, gcols_ref, x_ref, wide_hbm, out_ref, *,
                   T: int, G: int, ngroups: int):
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
            r1 = grows_ref[gi * 2]
            r2 = grows_ref[gi * 2 + 1]
            ro1 = pl.multiple_of(r1 * T, T)
            ro2 = pl.multiple_of(r2 * T, T)
            # K-fused forward: one [r, 2T] @ [2T, W] covers both rows
            X2 = jnp.concatenate(
                [x_ref[:, pl.ds(ro1, T)], x_ref[:, pl.ds(ro2, T)]], axis=1
            )
            Y = jnp.dot(X2, scratch[slot],
                        preferred_element_type=jnp.float32)  # [r, W]
            for j in range(G):
                c = gcols_ref[gi * G + j]
                co = pl.multiple_of(c * T, T)
                out_ref[:, pl.ds(co, T)] += Y[:, j * T:(j + 1) * T]
                Xc = x_ref[:, pl.ds(co, T)]
                # c == r1 slots are either the r1 diagonal tile (apply
                # once: zero the symmetric operand; the r2 half is
                # strictly-lower, hence absent) or zero pad slots
                xcat[:, j * T:(j + 1) * T] = jnp.where(
                    c == r1, jnp.zeros_like(Xc), Xc)
            # fused NT symmetric pass: [r, W] x [2T, W]^T -> [r, 2T],
            # halves split into the two row outputs
            Y2 = jax.lax.dot_general(
                xcat[:, :], scratch[slot], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[:, pl.ds(ro1, T)] += Y2[:, :T]
            out_ref[:, pl.ds(ro2, T)] += Y2[:, T:]
            return carry

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(ngroups), loop,
                          jnp.int32(0))

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((2, 2 * T, W), jnp.float32),
        xcat=pltpu.VMEM((out_ref.shape[0], W), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("T", "G", "interpret"))
def spmm_paired(grows: jax.Array, gcols: jax.Array, wide: jax.Array,
                Xf: jax.Array, T: int = 128, G: int = GROUP,
                interpret: bool = False) -> jax.Array:
    """W = Xf Q from the two-row K-fused layout (build_row_pairs_bucketed).

    grows: i32[ng, 2]; gcols: i32[ng, G]; wide: f32[ng, 2T, G*T]."""
    ngroups = wide.shape[0]
    grows = grows.reshape(-1)  # flat SMEM (see _grouped_kernel comment)
    gcols = gcols.reshape(-1)
    return pl.pallas_call(
        functools.partial(_paired_kernel, T=T, G=G, ngroups=ngroups),
        out_shape=jax.ShapeDtypeStruct(Xf.shape, Xf.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # pair rows (flat)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # group cols (flat)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # X (resident)
            pl.BlockSpec(memory_space=pl.ANY),    # wide tiles (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=8 * ngroups * Xf.shape[0] * 2 * T * G * T,
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
