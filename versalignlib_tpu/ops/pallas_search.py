"""Pallas one-vs-many search kernel: broadcast query, lane-resident pool.

The database-search paths (``search.py``, ``refmap.py``) score a B x R
cross product. Routing that through the pairwise kernel
(ops/pallas_score.py) requires materializing both sides per pair —
``jnp.repeat``/``jnp.tile`` writes B*R*(m+n) int32 of HBM that is pure
duplication (every block of 1024 consecutive pairs shares one read; every
R-th pair shares one ref).

This kernel removes the duplication with a TPU-native asymmetry: the
**query** sequence of each grid step lives in SMEM and is read as scalars
(broadcast against the whole register tile for free), while the **pool**
side keeps the pairwise kernel's lane layout — 1024 candidates per (8, 128)
int32 tile. HBM traffic drops from O(B*R*(m+n)) to O((B+R)*len + B*R)
and the search paths can stream arbitrarily large chunks without a
cross-product intermediate.

Which side is the query is chosen per call (``query_is_read``): panel
search has many reads vs few panel entries (lanes = reads, query = panel
entry); whole-reference mapping has few reads vs thousands of windows
(lanes = windows, query = read). The DP itself is the exact pairwise
recurrence of ops/pallas_score.py — same wavefront, same NW overlap
bookkeeping, same substitution builders (``make_sub_fn`` accepts scalar or
vector codes) — and is gated bit-exact against the oracle cross product.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from versalignlib_tpu.ops.pallas_score import (BLOCK_LANES, BLOCK_PAIRS,
                                               BLOCK_SUBLANES, NEG_INF_I32,
                                               WAVE_ROWS,
                                               make_sub_fn)
from versalignlib_tpu.params import AlignmentParameters
from versalignlib_tpu.types import Algorithm


def _search_kernel(query_ref, lanes_ref, *refs, m, n, unroll,
                   params: AlignmentParameters, local: bool,
                   query_is_read: bool, pssm_meta=None,
                   with_coords: bool = False):
    """Score 1024 lane sequences against one SMEM query sequence.

    query_ref: (1, 1, m) int32 SMEM when ``query_is_read`` else (1, 1, n).
    lanes_ref: (1, n, 8, 128) int32 VMEM (refs in lanes) when
        ``query_is_read`` else (1, m, 8, 128) (reads in lanes).
    out_ref: (1, 1, 8, 128) int32 best scores.
    h_ref: (n+1, 8, 128) scratch; f_ref: Gotoh F row (affine) else (1,...).

    DP rows are ALWAYS the read (m), columns the ref (n) — only the code
    source switches between SMEM scalars and VMEM lane vectors, so the
    recurrence (and the NW score bookkeeping) is identical to
    ops/pallas_score.py:_score_kernel.

    ``pssm_meta`` (ops/pssm.py PssmMeta): the query is a POSITION-SPECIFIC
    scoring profile instead of a sequence — query_ref holds the profile's
    rows bit-packed W words per row ((1, 1, m*W) SMEM), and the per-cell
    substitution becomes "select this row's word by lane ref code, extract
    the biased field" (same field scheme as the bit-packed matrix path in
    make_sub_fn, but the tables are RUNTIME data riding SMEM, not
    trace-time constants). Requires ``query_is_read``.

    ``with_coords`` (SW only): also emit each pair's DP argmax cell —
    aux_ref (1, 1, 2, 8, 128) [end_row, end_col] — with the reference's
    row-major strict-first-win rule (DefaultKernel.cpp:252-256): per-row
    (max, argcol) registers accumulate through the column sweep, then rows
    merge in ascending order at group end, exactly the dense align kernel's
    device fold. Costs ~3 VPU ops/cell; compiled as a separate variant so
    the plain scoring path pays nothing.
    """
    if with_coords:
        (query_ref, lanes_ref, out_ref, aux_ref, h_ref, f_ref, c0_ref,
         c1_ref) = (query_ref, lanes_ref) + refs
        assert local, "coords fold is SW-only (NW end cells decode on host)"
    else:
        out_ref, h_ref, f_ref, c0_ref, c1_ref = refs
        aux_ref = None
    gap_read = jnp.int32(params.score_gap_read)
    gap_ref = jnp.int32(params.score_gap_ref)
    affine = params.affine
    open_read = jnp.int32(params.gap_open_read)
    open_ref = jnp.int32(params.gap_open_ref)
    zero = jnp.zeros((BLOCK_SUBLANES, BLOCK_LANES), jnp.int32)
    neg_inf = jnp.full((BLOCK_SUBLANES, BLOCK_LANES), NEG_INF_I32, jnp.int32)
    n_chunks = n // unroll   # full chunks; n % unroll handled statically

    h_ref[...] = jnp.zeros((n + 1, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32)
    if affine:
        f_ref[...] = jnp.full((n, BLOCK_SUBLANES, BLOCK_LANES), NEG_INF_I32,
                              jnp.int32)

    if pssm_meta is None:
        row_prep, col_prep, sub_of = make_sub_fn(params)
    else:
        from versalignlib_tpu.ops.pssm import make_pssm_sub_fn

        assert query_is_read, "a profile is always the read side"
        col_prep, sub_of = make_pssm_sub_fn(pssm_meta)
        W = pssm_meta.words

        def row_prep(i):
            # W packed SMEM words: this profile row's scores for every code.
            return tuple(query_ref[0, 0, i * W + w] for w in range(W))

    def read_code(i):
        """Row i's read code: SMEM scalar or per-lane vector."""
        if query_is_read:
            return query_ref[0, 0, i]
        return lanes_ref[0, i]

    # Default scoring with the ref side in lanes: stream the column context
    # through scratch once per grid step (same scheme as the score kernel);
    # SMEM-scalar and pssm/matrix columns keep per-group col_prep.
    use_cstream = query_is_read and params.matrix is None and pssm_meta is None
    if use_cstream:
        def fill_cctx(j0, size):
            fc2, fb = col_prep(lanes_ref[0, pl.ds(j0, size)])
            c0_ref[pl.ds(j0, size)] = fc2
            c1_ref[pl.ds(j0, size)] = fb

        jax.lax.fori_loop(
            0, n_chunks, lambda c, z: (fill_cctx(c * unroll, unroll), z)[1], 0)
        if n % unroll:
            fill_cctx(n_chunks * unroll, n % unroll)

    def make_group_body(R, base=None):
        def group_body(idx, gcarry):
            best = gcarry[0] if with_coords else gcarry
            i0 = idx * R if base is None else base
            rctxs = [row_prep(i0 + r) if pssm_meta is not None
                     else row_prep(read_code(i0 + r)) for r in range(R)]
            h0 = h_ref[0]

            def run_chunk(j0, carry, size):
                lefts, diags, evals, rbests, rcols = carry
                old = h_ref[pl.ds(j0 + 1, size)]
                if use_cstream:
                    c0_chunk = c0_ref[pl.ds(j0, size)]
                    c1_chunk = c1_ref[pl.ds(j0, size)]
                    ref_chunk = None
                elif not query_is_read:
                    ref_chunk = None  # per-column SMEM scalars below
                else:
                    ref_chunk = lanes_ref[0, pl.ds(j0, size)]
                if affine:
                    f_old = f_ref[pl.ds(j0, size)]
                    f_store = []
                store_vals = []
                for u in range(size):
                    if use_cstream:
                        cctx = (c0_chunk[u], c1_chunk[u])
                    else:
                        cctx = col_prep(ref_chunk[u] if query_is_read
                                        else query_ref[0, 0, j0 + u])
                    up = old[u]
                    f_up = f_old[u] if affine else None
                    new_lefts, new_diags, new_evals = [], [], []
                    for r in range(R):
                        s = sub_of(rctxs[r], cctx)
                        if affine:
                            f_val = jnp.maximum(up + open_ref, f_up) + gap_ref
                            e_val = jnp.maximum(lefts[r] + open_read,
                                                evals[r]) + gap_read
                            e_in = jnp.maximum(e_val, 0) if local else e_val
                            cur = jnp.maximum(
                                jnp.maximum(diags[r] + s, f_val), e_in)
                            new_evals.append(e_val)
                            f_up = f_val
                        else:
                            l_in = lefts[r] + gap_read
                            if local:
                                l_in = jnp.maximum(l_in, 0)
                            cur = jnp.maximum(jnp.maximum(diags[r] + s,
                                                          up + gap_ref),
                                              l_in)
                        if local:
                            if with_coords:
                                # Per-ROW leftmost strict argmax; rows merge
                                # in ascending order at group end (row-major
                                # first-win, as the dense align journal).
                                gt = cur > rbests[r]
                                rbests[r] = jnp.where(gt, cur, rbests[r])
                                rcols[r] = jnp.where(gt, j0 + u, rcols[r])
                            else:
                                rbests[0] = jnp.maximum(rbests[0], cur)
                        new_diags.append(up)
                        new_lefts.append(cur)
                        up = cur
                    lefts, diags = new_lefts, new_diags
                    if affine:
                        evals = new_evals
                        f_store.append(f_up)
                    store_vals.append(up)
                h_ref[pl.ds(j0 + 1, size)] = jnp.stack(store_vals)
                if affine:
                    f_ref[pl.ds(j0, size)] = jnp.stack(f_store)
                return lefts, diags, evals, rbests, rcols

            if with_coords:
                journal0 = ([zero] * R, [zero] * R)
            else:
                journal0 = ([best], [zero])
            init = ([h0] * R, [h0] * R, [neg_inf] * R) + journal0
            carry = jax.lax.fori_loop(
                0, n_chunks, lambda c, cr: run_chunk(c * unroll, cr, unroll),
                init)
            if n % unroll:
                # Statically-shaped remainder columns (odd ref lengths keep
                # the full unroll for the bulk of the sweep).
                carry = run_chunk(n_chunks * unroll, carry, n % unroll)
            lefts, _, _, rbests, rcols = carry
            if with_coords:
                best, grow, gcol = gcarry
                for r in range(R):
                    gt = rbests[r] > best
                    best = jnp.where(gt, rbests[r], best)
                    grow = jnp.where(gt, i0 + r, grow)
                    gcol = jnp.where(gt, rcols[r], gcol)
                return best, grow, gcol
            best = rbests[0]
            if not local:
                # NW overlap: best over the last column of every row
                # (same bookkeeping as the pairwise kernel).
                for r in range(R):
                    best = jnp.maximum(best, lefts[r])
            return best

        return group_body

    R = WAVE_ROWS
    init = (zero, zero, zero) if with_coords else zero
    best = jax.lax.fori_loop(0, m // R, make_group_body(R), init)
    for tail_row in range((m // R) * R, m):
        best = make_group_body(1, base=tail_row)(0, best)
    if with_coords:
        best, grow, gcol = best
        aux_ref[0, 0, 0] = grow
        aux_ref[0, 0, 1] = gcol
    if not local:
        def final_fold(j, b):
            return jnp.maximum(b, h_ref[j])
        best = jax.lax.fori_loop(0, n + 1, final_fold, best)
        best = jnp.maximum(best, 0)
    out_ref[0, 0] = best


def search_vmem_plan(m: int, n: int, affine: bool = False) -> int:
    """VMEM bytes for one lane block: H (+F) scratch rows, column-context
    streams, per-chunk stack temporaries, double-buffered lane block, out,
    headroom (the SMEM query costs no VMEM)."""
    # Lanes hold the ref side when query_is_read, else the read side;
    # plan for the larger so the budget is safe either way.
    lane_len = max(m, n)
    return 4 * BLOCK_PAIRS * (
        (n + 1)
        + (n if affine else 1)
        + 2 * n                    # column-context streams (default path)
        + 6 * min(128, n)          # per-chunk load/store stack temporaries
        + 2 * lane_len
        + 2
    ) + 1024 * 1024


@functools.partial(
    jax.jit,
    static_argnames=("params", "algorithm", "query_is_read", "interpret",
                     "pssm_meta", "with_coords"),
)
def _search_blocks(query_b, lanes_b, params: AlignmentParameters,
                   algorithm: Algorithm, query_is_read: bool,
                   interpret: bool = False, pssm_meta=None,
                   with_coords: bool = False):
    """query_b: (K, 1, Lq) int32 (the middle axis satisfies the TPU
    block-shape rule for SMEM blocks); lanes_b: (G, Lv, 8, 128) int32 ->
    (G, K, 8, 128) int32 scores, or (scores, (G, K, 2, 8, 128) argmax
    [end_row, end_col]) when ``with_coords`` (SW only).

    ``pssm_meta``: Lq = m * meta.words packed profile words per query
    (see _search_kernel)."""
    k, _, lq = query_b.shape
    g, lv = lanes_b.shape[0], lanes_b.shape[1]
    if pssm_meta is not None:
        m, n = lq // pssm_meta.words, lv
    else:
        m, n = (lq, lv) if query_is_read else (lv, lq)
    local = algorithm == Algorithm.SMITH_WATERMAN
    kernel = functools.partial(
        # Deep unroll only for compiled TPU runs (see _score_blocks).
        _search_kernel, m=m, n=n, unroll=min(8 if interpret else 128, n),
        params=params,
        local=local, query_is_read=query_is_read, pssm_meta=pssm_meta,
        with_coords=with_coords,
    )
    cstream = query_is_read and params.matrix is None and pssm_meta is None
    out_specs = pl.BlockSpec((1, 1, BLOCK_SUBLANES, BLOCK_LANES),
                             lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((g, k, BLOCK_SUBLANES, BLOCK_LANES),
                                     jnp.int32)
    if with_coords:
        out_specs = (out_specs,
                     pl.BlockSpec((1, 1, 2, BLOCK_SUBLANES, BLOCK_LANES),
                                  lambda i, j: (i, j, 0, 0, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct(
                         (g, k, 2, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32))
    return pl.pallas_call(
        kernel,
        grid=(g, k),   # inner k varies fastest: the big lane block stays
        in_specs=[     # resident while queries stream through SMEM
            pl.BlockSpec((1, 1, lq), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, lv, BLOCK_SUBLANES, BLOCK_LANES),
                         lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n + 1, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
            pltpu.VMEM((n if params.affine else 1, BLOCK_SUBLANES,
                        BLOCK_LANES), jnp.int32),
            pltpu.VMEM((n if cstream else 1, BLOCK_SUBLANES, BLOCK_LANES),
                       jnp.int32),
            pltpu.VMEM((n if cstream else 1, BLOCK_SUBLANES, BLOCK_LANES),
                       jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=search_vmem_plan(m, n, params.affine)),
        cost_estimate=pl.CostEstimate(
            flops=12 * g * k * m * n * BLOCK_PAIRS,
            bytes_accessed=4 * (g * lv * BLOCK_PAIRS + k * lq
                                + g * k * BLOCK_PAIRS),
            transcendentals=0,
        ),
        interpret=interpret,
    )(query_b, lanes_b)


def _pack_lanes(x, length):
    """(P, L) int32 -> (G, L, 8, 128), zero-padding P up to full blocks."""
    p = x.shape[0]
    g = max(1, -(-p // BLOCK_PAIRS))
    x = jnp.pad(x.astype(jnp.int32), ((0, g * BLOCK_PAIRS - p), (0, 0)))
    x = x.reshape(g, BLOCK_SUBLANES, BLOCK_LANES, length)
    return jnp.transpose(x, (0, 3, 1, 2))


@functools.partial(
    jax.jit, static_argnames=("params", "algorithm", "interpret")
)
def cross_scores_device(reads, refs, params: AlignmentParameters,
                        algorithm: Algorithm, interpret: bool = False):
    """(B, m) x (R, n) uint8/int32 codes -> (B, R) int32 scores.

    The larger side rides the lanes (fills the 1024-pair register tile);
    the smaller side streams through SMEM as per-step queries. Exact same
    scores as the pairwise kernel on the materialized cross product.
    """
    b, m = reads.shape
    r, n = refs.shape
    query_is_read = r >= b   # lanes hold the larger pool
    if query_is_read:
        query_b = reads.astype(jnp.int32)[:, None, :]
        lanes_b = _pack_lanes(refs, n)
    else:
        query_b = refs.astype(jnp.int32)[:, None, :]
        lanes_b = _pack_lanes(reads, m)
    out = _search_blocks(query_b, lanes_b, params, algorithm,
                         query_is_read, interpret)
    g, k = out.shape[0], out.shape[1]
    # (G, K, 8, 128) -> (G*1024, K): lane p of block i is pool sequence
    # i*1024 + sublane*128 + lane.
    pool = jnp.transpose(out, (0, 2, 3, 1)).reshape(g * BLOCK_PAIRS, k)
    if query_is_read:
        return jnp.transpose(pool[:r])       # (K=B, R)
    return pool[:b]                          # (B, K=R)
