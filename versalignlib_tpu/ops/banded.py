"""Banded DP for long pairs (10-100kbp), tiled through VMEM.

The reference has no banding and no intra-pair capacity strategy beyond
spilling the pointer matrix to global memory (SURVEY.md §5 "long-context";
alignment_kernels.cl:10-12) — sequence length is bounded by O(m*n) memory
and int16 scores. This module is the greenfield long-pair path:

- a diagonal band of static width W follows the main diagonal with per-row
  offset ``o(i) = clamp(i*n//m - W/2, 0, n-W)``; cells outside the band are
  -inf (standard banded alignment — an approximation by construction);
- the read streams through VMEM in row tiles: a ``lax.scan`` over tiles
  re-invokes a single-block Pallas kernel, carrying the (W+D, 8, 128) band
  state and running best through HBM between tiles (~2MB per boundary vs
  TILE*W*1024 cells of compute — negligible);
- the ref window for a tile is a dynamic slice of size WIN = W + TILE*D
  (D = max per-row band advance, ceil(n/m)), so neither sequence is ever
  fully VMEM-resident: 100kbp pairs run in ~6MB of VMEM;
- inter-pair packing is the same (8, 128)x1024 layout as the dense kernels.

Scores use int32 (the reference's int16 would overflow beyond ~16kbp gaps);
linear gaps (reference parity). Exactness vs the numpy banded oracle is
gated by tests/test_banded.py, including band == full-matrix equivalence
when W covers the whole ref.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from versalignlib_tpu.alphabet import substitution_scores
from versalignlib_tpu.ops.pallas_score import (
    BLOCK_LANES,
    BLOCK_PAIRS,
    BLOCK_SUBLANES,
    NEG_INF_I32,
    _is_tpu,
)
from versalignlib_tpu.params import AlignmentParameters
from versalignlib_tpu.types import Algorithm


def band_offsets(m_pad: int, m_real: int, n: int, band: int) -> np.ndarray:
    """Per-row band start columns (0-based ref position of band cell 0).

    Single source of truth shared by the oracle and the kernel wrapper.
    """
    i = np.arange(m_pad, dtype=np.int64)
    o = (i * n) // max(m_real, 1) - band // 2
    return np.clip(o, 0, max(n - band, 0)).astype(np.int32)


def max_band_step(m_real: int, n: int) -> int:
    """Max per-row band advance D = ceil(n/m) (offsets are monotone)."""
    return max(1, -(-n // max(m_real, 1)))


# ---------------------------------------------------------------------------
# NumPy banded oracle (semantics definition)
# ---------------------------------------------------------------------------

def banded_score_oracle(read, ref, p: AlignmentParameters, band: int,
                        algorithm: Algorithm,
                        offsets: np.ndarray | None = None) -> int:
    """Reference banded score: full-matrix DP with -inf outside the band.

    Row 0 and (for band windows touching it) column 0 are 0 — the same free
    boundaries as the dense kernels, restricted to the band.
    """
    read = np.asarray(read, dtype=np.int32)
    ref = np.asarray(ref, dtype=np.int32)
    m, n = read.size, ref.size
    local = Algorithm(algorithm) == Algorithm.SMITH_WATERMAN
    if offsets is None:
        offsets = band_offsets(m, m, n, band)
    band = min(band, n)
    NEG = np.int64(NEG_INF_I32)
    h = np.zeros((m + 1, n + 1), dtype=np.int64)
    f = np.full((m + 1, n + 1), NEG, dtype=np.int64)
    best = np.int64(0)
    last_col = np.int64(NEG)
    for i in range(1, m + 1):
        o = int(offsets[i - 1])
        prev = h[i - 1]
        f_prev = f[i - 1]
        row = np.full(n + 1, NEG, dtype=np.int64)
        f_row = np.full(n + 1, NEG, dtype=np.int64)
        row[0] = 0
        lo, hi = o + 1, min(o + band, n)  # H columns in band
        sub = substitution_scores(
            read[i - 1], ref[lo - 1 : hi], p.score_match, p.score_mismatch
        ).astype(np.int64)
        e = NEG
        for j in range(lo, hi + 1):
            diag = prev[j - 1] + sub[j - lo]
            if p.affine:
                f_row[j] = max(prev[j] + p.gap_open_ref + p.score_gap_ref,
                               f_prev[j] + p.score_gap_ref, NEG)
                e = max(row[j - 1] + p.gap_open_read + p.score_gap_read,
                        e + p.score_gap_read, NEG)
                cur = max(diag, f_row[j], e)
            else:
                up = prev[j] + p.score_gap_ref
                left = row[j - 1] + p.score_gap_read
                cur = max(diag, up, left)
            cur = max(cur, NEG)
            if local:
                cur = max(cur, 0)
                best = max(best, cur)
            row[j] = cur
        h[i] = row
        f[i] = f_row
        if not local and hi == n:
            last_col = max(last_col, row[n])
    if local:
        return int(best)
    final = max(int(h[m].max()), int(last_col), 0)
    return final


# ---------------------------------------------------------------------------
# Pallas banded tile kernel
# ---------------------------------------------------------------------------

def _banded_tile_kernel(offs_ref, win_start_ref, prev_ws_ref, reads_ref,
                        ref_win_ref, state_in_ref, best_in_ref, fstate_in_ref,
                        state_out_ref, best_out_ref, fstate_out_ref,
                        bounce_ref, *,
                        tile, band, win, shift_cap, n,
                        params: AlignmentParameters, local: bool):
    """One row tile for one 1024-pair block — window-relative formulation.

    The DP state lives at WINDOW-relative positions (window = the union of
    this tile's per-row bands, size ``win`` = band + tile*d_max): cell w of
    the state maps to DP column ``win_start + w + 1``. Rows iterate the FULL
    window with cells outside the row's band forced to -inf by a
    scalar-predicated mask, so every inner-loop address is affine in the
    loop index — data-dependent addressing (which stalls Mosaic's pipeline,
    ~30us/row measured on the shifted-band design) happens only ONCE per
    tile, in the state re-base copy. State buffers carry ``shift_cap`` extra
    -inf-filled rows so the re-base slice stays in bounds.

    Scalar-prefetch: offs (tile,) per-row band starts; win_start (1,);
    prev_ws (1,) previous tile's win_start (== win_start on the first tile).
    best_in/out: (2, 8, 128) [running best | NW last-column max, aux].
    fstate_*: Gotoh F state, same layout ((1, 8, 128) dummy when linear).
    """
    match = jnp.int32(params.score_match)
    mismatch = jnp.int32(params.score_mismatch)
    gap_read = jnp.int32(params.score_gap_read)
    gap_ref = jnp.int32(params.score_gap_ref)
    affine = params.affine
    open_r = jnp.int32(params.gap_open_read)
    open_f = jnp.int32(params.gap_open_ref)
    neg_inf = jnp.full((BLOCK_SUBLANES, BLOCK_LANES), NEG_INF_I32, jnp.int32)
    zero = jnp.zeros((BLOCK_SUBLANES, BLOCK_LANES), jnp.int32)
    unroll = 8 if win % 8 == 0 else (4 if win % 4 == 0 else (2 if win % 2 == 0 else 1))
    n_chunks = win // unroll
    win_start = win_start_ref[0]

    # Re-base the carried state to this tile's window (shift >= 0, bounded
    # by shift_cap; rows beyond `win` in the buffers are permanently -inf).
    # state_in aliases state_out, so bounce through scratch (the shifted
    # ranges overlap) and capture the first row's diagonal boundary — the
    # previous row's value at column win_start — before it is shifted away.
    shift = win_start - prev_ws_ref[0]
    pre_diag = jnp.where(
        shift >= 1,
        state_in_ref[jnp.maximum(shift - 1, 0)],
        jnp.where(win_start == 0,
                  jnp.zeros((BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
                  jnp.full((BLOCK_SUBLANES, BLOCK_LANES), NEG_INF_I32, jnp.int32)),
    )
    bounce_ref[...] = state_in_ref[pl.ds(shift, win)]
    state_out_ref[pl.ds(0, win)] = bounce_ref[...]
    state_out_ref[pl.ds(win, shift_cap)] = jnp.full(
        (shift_cap, BLOCK_SUBLANES, BLOCK_LANES), NEG_INF_I32, jnp.int32)
    best_out_ref[...] = best_in_ref[...]
    if affine:
        bounce_ref[...] = fstate_in_ref[pl.ds(shift, win)]
        fstate_out_ref[pl.ds(0, win)] = bounce_ref[...]
        fstate_out_ref[pl.ds(win, shift_cap)] = jnp.full(
            (shift_cap, BLOCK_SUBLANES, BLOCK_LANES), NEG_INF_I32, jnp.int32)

    # NW: window index of DP column n (band cells beyond are -inf anyway).
    w_lastcol = (n - 1) - win_start

    # R-row register wavefront (same scheme as the dense kernel): R rows of
    # the tile advance down each column together, row r consuming row r-1's
    # just-computed masked value from a register. R must divide tile.
    R = 4 if tile % 4 == 0 else (2 if tile % 2 == 0 else 1)
    at_col0 = win_start == 0
    h_bound = jnp.where(at_col0, zero, neg_inf)

    def group_body(ig, _):
        i0 = ig * R
        rcs = [reads_ref[i0 + r] for r in range(R)]
        rvs = [(rc >= 1) & (rc <= 4) for rc in rcs]
        lows = [offs_ref[i0 + r] - win_start for r in range(R)]
        # Column win_start of the row above: inside the pre-shift window only
        # for the tile's very first row (pre_diag); for every other row it is
        # left of all bands and only the col-0 boundary survives.
        diag0s = [jnp.where((ig == 0) & (r == 0), pre_diag, h_bound)
                  for r in range(R)]

        def chunk_body(c, carry):
            lefts, diags, evals, best, lc_best = carry
            k0 = c * unroll
            old = state_out_ref[pl.ds(k0, unroll)]
            ref_chunk = ref_win_ref[pl.ds(k0, unroll)]
            # Vectorized band masks: scalar-predicated selects would insert
            # a scalar->vector broadcast stall per cell; iota comparisons
            # keep the whole row on the VPU.
            w_vec = jax.lax.broadcasted_iota(
                jnp.int32, (unroll, BLOCK_SUBLANES, BLOCK_LANES), 0) + k0
            masks = [(w_vec >= lows[r]) & (w_vec < lows[r] + band)
                     for r in range(R)]
            if not local:
                wlc_mask = w_vec == w_lastcol
            if affine:
                f_old = fstate_out_ref[pl.ds(k0, unroll)]
                f_store = []
            store_vals = []
            for u in range(unroll):
                ref_col = ref_chunk[u]
                up = old[u]
                f_up = f_old[u] if affine else None
                new_lefts, new_diags, new_evals = [], [], []
                for r in range(R):
                    valid = rvs[r] & (ref_col >= 1) & (ref_col <= 4)
                    sub = jnp.where(
                        valid, jnp.where(rcs[r] == ref_col, match, mismatch), 0
                    )
                    if affine:
                        f_val = jnp.maximum(
                            jnp.maximum(up + open_f + gap_ref, f_up + gap_ref),
                            neg_inf)
                        e_val = jnp.maximum(
                            jnp.maximum(lefts[r] + open_r + gap_read,
                                        evals[r] + gap_read),
                            neg_inf)
                        cur = jnp.maximum(jnp.maximum(diags[r] + sub, f_val),
                                          e_val)
                        new_evals.append(e_val)
                    else:
                        cur = jnp.maximum(
                            jnp.maximum(diags[r] + sub, up + gap_ref),
                            lefts[r] + gap_read)
                    cur = jnp.maximum(cur, neg_inf)
                    in_band = masks[r][u]
                    if local:
                        cur = jnp.where(in_band, jnp.maximum(cur, 0), neg_inf)
                        best = jnp.maximum(best, jnp.where(in_band, cur, zero))
                    else:
                        cur = jnp.where(in_band, cur, neg_inf)
                        lc_best = jnp.maximum(
                            lc_best, jnp.where(wlc_mask[u], cur, neg_inf))
                    if affine:
                        f_up = jnp.where(in_band, f_val, neg_inf)
                    new_diags.append(up)
                    new_lefts.append(cur)
                    up = cur
                lefts, diags = new_lefts, new_diags
                if affine:
                    evals = new_evals
                    f_store.append(f_up)     # row R-1's F value
                store_vals.append(up)        # row R-1's H value
            state_out_ref[pl.ds(k0, unroll)] = jnp.stack(store_vals)
            if affine:
                fstate_out_ref[pl.ds(k0, unroll)] = jnp.stack(f_store)
            return lefts, diags, evals, best, lc_best

        init = ([h_bound] * R, diag0s, [neg_inf] * R,
                best_out_ref[0], best_out_ref[1])
        _, _, _, best, lc_best = jax.lax.fori_loop(0, n_chunks, chunk_body, init)
        best_out_ref[0] = best
        if not local:
            best_out_ref[1] = lc_best
        return 0

    jax.lax.fori_loop(0, tile // R, group_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("params", "algorithm", "band", "tile", "d_max", "interpret"),
)
def _banded_score_blocks(reads_b, refs_b, offsets, params, algorithm,
                         band: int, tile: int, d_max: int,
                         interpret: bool = False):
    """reads_b (G, m_pad, 8, 128); refs_b (G, n, 8, 128); offsets (m_pad,).

    ``d_max`` is the true max per-row offset step (static, from the offsets).
    """
    g, m_pad = reads_b.shape[0], reads_b.shape[1]
    n = refs_b.shape[1]
    local = Algorithm(algorithm) == Algorithm.SMITH_WATERMAN
    shift_cap = tile * d_max      # max inter-tile window advance
    win = band + shift_cap
    n_tiles = m_pad // tile
    state_rows = win + shift_cap  # -inf tail keeps the re-base slice in bounds

    # Pad ref blocks so any window slice is in-bounds; pad codes are 0
    # (invalid, sub = 0) and band cells beyond n never feed the outputs.
    refs_pad = jnp.pad(refs_b, ((0, 0), (0, win), (0, 0), (0, 0)))
    win_starts = offsets[::tile]  # (n_tiles,)

    kernel = functools.partial(
        _banded_tile_kernel, tile=tile, band=band, win=win,
        shift_cap=shift_cap, n=n, params=params, local=local,
    )
    fstate_rows = state_rows if params.affine else 1
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # reads tile
                pl.BlockSpec(memory_space=pltpu.VMEM),  # ref window
                pl.BlockSpec(memory_space=pltpu.VMEM),  # state in
                pl.BlockSpec(memory_space=pltpu.VMEM),  # best in
                pl.BlockSpec(memory_space=pltpu.VMEM),  # f state in
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),  # state out
                pl.BlockSpec(memory_space=pltpu.VMEM),  # best out
                pl.BlockSpec(memory_space=pltpu.VMEM),  # f state out
            ),
            scratch_shapes=[
                pltpu.VMEM((win, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((state_rows, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
            jax.ShapeDtypeStruct((2, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
            jax.ShapeDtypeStruct((fstate_rows, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
        ),
        input_output_aliases={5: 0, 6: 1, 7: 2},  # donate state/best/fstate
        interpret=interpret,
    )

    def run_block(rb, fb):
        # Row 0 boundary: H[0][j] = 0 for every column (free leading gaps) —
        # the initial window state is all zeros; the -inf tail never moves.
        state_init = jnp.concatenate([
            jnp.zeros((win, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
            jnp.full((shift_cap, BLOCK_SUBLANES, BLOCK_LANES), NEG_INF_I32, jnp.int32),
        ])
        best_init = jnp.stack([
            jnp.zeros((BLOCK_SUBLANES, BLOCK_LANES), jnp.int32) if local
            else jnp.full((BLOCK_SUBLANES, BLOCK_LANES), NEG_INF_I32, jnp.int32),
            jnp.full((BLOCK_SUBLANES, BLOCK_LANES), NEG_INF_I32, jnp.int32),
        ])
        fstate_init = jnp.full(
            (fstate_rows, BLOCK_SUBLANES, BLOCK_LANES), NEG_INF_I32, jnp.int32)

        def tile_step(carry, t):
            state, best, fstate = carry
            reads_tile = jax.lax.dynamic_slice(
                rb, (t * tile, 0, 0), (tile, BLOCK_SUBLANES, BLOCK_LANES))
            ws = win_starts[t]
            ref_win = jax.lax.dynamic_slice(
                fb, (ws, 0, 0), (win, BLOCK_SUBLANES, BLOCK_LANES))
            offs_tile = jax.lax.dynamic_slice(offsets, (t * tile,), (tile,))
            prev_ws = jnp.where(t == 0, ws, win_starts[jnp.maximum(t - 1, 0)])
            state, best, fstate = call(
                offs_tile, ws[None], prev_ws[None], reads_tile, ref_win,
                state, best, fstate,
            )
            return (state, best, fstate), None

        (state, best, _), _ = jax.lax.scan(
            tile_step, (state_init, best_init, fstate_init),
            jnp.arange(n_tiles))
        if local:
            return best[0]
        final_row = jnp.max(state[:win], axis=0)
        out = jnp.maximum(best[1], final_row)
        return jnp.maximum(out, 0)

    return jax.lax.map(lambda args: run_block(*args), (reads_b, refs_pad))


def banded_score_batch(
    reads: np.ndarray,
    refs: np.ndarray,
    params: AlignmentParameters,
    algorithm: Algorithm,
    band: int = 512,
    tile: int = 256,
    interpret: bool | None = None,
) -> np.ndarray:
    """Banded batch scoring: (B, m) x (B, n) -> (B,) int32.

    ``band`` is rounded down to the ref length; rows pad to a tile multiple
    (invalid padding rows cannot change the score — diagonal sub-0
    propagation only replays existing final-row values).
    """
    if interpret is None:
        interpret = not _is_tpu()
    b, m = reads.shape
    n = refs.shape[1]
    band = min(band, n)
    tile = min(tile, max(8, m))
    m_pad = -(-m // tile) * tile
    g = max(1, -(-b // BLOCK_PAIRS))
    b_pad = g * BLOCK_PAIRS

    def pack(x, length, pad_len):
        x = jnp.asarray(np.asarray(x)).astype(jnp.int32)
        x = jnp.pad(x, ((0, b_pad - x.shape[0]), (0, pad_len - length)))
        x = x.reshape(g, BLOCK_SUBLANES, BLOCK_LANES, pad_len)
        return jnp.transpose(x, (0, 3, 1, 2))

    offsets_np = band_offsets(m_pad, m, n, band)
    d_max = int(np.diff(offsets_np).max(initial=1)) if m_pad > 1 else 1
    d_max = max(d_max, 1)
    out = _banded_score_blocks(
        pack(reads, m, m_pad), pack(refs, n, n), jnp.asarray(offsets_np),
        params, Algorithm(algorithm), band, tile, d_max, interpret,
    )
    return np.asarray(out.reshape(b_pad)[:b], dtype=np.int32)


# ---------------------------------------------------------------------------
# Banded traceback (additive; score path above stays pointer-free)
# ---------------------------------------------------------------------------
#
# Semantics (greenfield — the reference has no banding): the banded SW
# alignment starts at the global argmax within the band and walks until a
# START pointer; the banded NW (overlap) alignment starts at the best of
# {last-column cells inside the band, final-row band cells} and walks until
# it leaves the matrix through row 0 or column 0 (free leading gaps). The
# pointer model is the linear DIAG > UP > LEFT order with SW zero-force —
# the canonical flavor. Pointers pack 2-bit x pack per int32, band-relative.

def _banded_tb_kernel(offs_ref, o_prev_ref, win_start_ref, row_base_ref,
                      reads_ref, ref_win_ref, band_in_ref, best_in_ref,
                      band_out_ref, best_out_ref, ptr_ref, *, tile, band,
                      d_max, n, pack, params: AlignmentParameters,
                      local: bool):
    """Tile kernel emitting band-relative packed pointers.

    best_in/out: (4, 8, 128) int32 —
      SW: [best, bi_abs, bj_abs, unused]; NW: [lc_best, lc_i, unused, unused].
    ptr_ref: (tile, band//pack, 8, 128) int32 out.
    """
    match = jnp.int32(params.score_match)
    mismatch = jnp.int32(params.score_mismatch)
    gap_read = jnp.int32(params.score_gap_read)
    gap_ref = jnp.int32(params.score_gap_ref)
    neg_inf = jnp.full((BLOCK_SUBLANES, BLOCK_LANES), NEG_INF_I32, jnp.int32)
    zero = jnp.zeros((BLOCK_SUBLANES, BLOCK_LANES), jnp.int32)
    n_chunks = band // pack
    d_code, u_code, l_code, s_code = (jnp.int32(3), jnp.int32(1),
                                      jnp.int32(2), jnp.int32(0))

    band_out_ref[...] = band_in_ref[...]
    best_out_ref[...] = best_in_ref[...]

    def row_body(i, _):
        o_cur = offs_ref[i]
        o_pr = jax.lax.cond(i == 0, lambda: o_prev_ref[0], lambda: offs_ref[i - 1])
        d = o_cur - o_pr
        base = o_cur - win_start_ref[0]
        row_abs = row_base_ref[0] + i
        read_col = reads_ref[i]
        read_valid = (read_col >= 1) & (read_col <= 4)

        at_left_edge = o_cur == 0
        h_left0 = jnp.where(at_left_edge, zero, neg_inf)
        diag_from_band = band_out_ref[jnp.maximum(d - 1, 0)]
        h_diag0 = jnp.where(d >= 1, diag_from_band,
                            jnp.where(at_left_edge, zero, neg_inf))

        def chunk_body(c, carry):
            h_left, h_diag, best, bi, bj = carry
            k0 = c * pack
            old = band_out_ref[pl.ds(k0 + d, pack)]
            ref_chunk = ref_win_ref[pl.ds(base + k0, pack)]
            new_vals = []
            word = zero
            for u in range(pack):
                up = old[u]
                ref_col = ref_chunk[u]
                valid = read_valid & (ref_col >= 1) & (ref_col <= 4)
                sub = jnp.where(
                    valid, jnp.where(read_col == ref_col, match, mismatch), 0
                )
                diag_v = h_diag + sub
                up_v = up + gap_ref
                left_v = h_left + gap_read
                cur = jnp.maximum(jnp.maximum(diag_v, up_v), left_v)
                cur = jnp.maximum(cur, neg_inf)
                if local:
                    cur = jnp.maximum(cur, 0)
                ptr = jnp.where(cur == diag_v, d_code,
                                jnp.where(cur == up_v, u_code,
                                          jnp.where(cur == left_v, l_code, s_code)))
                if local:
                    ptr = jnp.where(cur == 0, s_code, ptr)
                    gt = cur > best
                    best = jnp.where(gt, cur, best)
                    bi = jnp.where(gt, row_abs, bi)
                    bj = jnp.where(gt, o_cur + k0 + u, bj)
                word = word | (ptr << (2 * u))
                new_vals.append(cur)
                h_left = cur
                h_diag = up
            band_out_ref[pl.ds(k0, pack)] = jnp.stack(new_vals)
            ptr_ref[i, c] = word
            return h_left, h_diag, best, bi, bj

        init = (h_left0, h_diag0, best_out_ref[0], best_out_ref[1], best_out_ref[2])
        _, _, best, bi, bj = jax.lax.fori_loop(0, n_chunks, chunk_body, init)
        if local:
            best_out_ref[0] = best
            best_out_ref[1] = bi
            best_out_ref[2] = bj
        else:
            k_last = n - 1 - o_cur
            @pl.when((k_last >= 0) & (k_last < band))
            def _():
                lc = band_out_ref[k_last]
                gt = lc > best_out_ref[0]
                best_out_ref[1] = jnp.where(gt, row_abs, best_out_ref[1])
                best_out_ref[0] = jnp.maximum(best_out_ref[0], lc)
        return 0

    jax.lax.fori_loop(0, tile, row_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("params", "algorithm", "band", "tile", "d_max", "interpret"),
)
def _banded_align_blocks(reads_b, refs_b, offsets, params, algorithm,
                         band: int, tile: int, d_max: int,
                         interpret: bool = False):
    """Banded fill emitting pointers.

    Returns (ptr (G, m_pad, band//pack, 8, 128), best (G, 4, 8, 128),
    final_band (G, band+d_max, 8, 128)).
    """
    g, m_pad = reads_b.shape[0], reads_b.shape[1]
    n = refs_b.shape[1]
    local = Algorithm(algorithm) == Algorithm.SMITH_WATERMAN
    pack = 8 if band % 8 == 0 else (4 if band % 4 == 0 else (2 if band % 2 == 0 else 1))
    win = band + tile * d_max
    n_tiles = m_pad // tile
    refs_pad = jnp.pad(refs_b, ((0, 0), (0, win), (0, 0), (0, 0)))
    win_starts = offsets[::tile]

    kernel = functools.partial(
        _banded_tb_kernel, tile=tile, band=band, d_max=d_max, n=n, pack=pack,
        params=params, local=local,
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # reads tile
                pl.BlockSpec(memory_space=pltpu.VMEM),  # ref window
                pl.BlockSpec(memory_space=pltpu.VMEM),  # band in
                pl.BlockSpec(memory_space=pltpu.VMEM),  # best in
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((band + d_max, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
            jax.ShapeDtypeStruct((4, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
            jax.ShapeDtypeStruct((tile, band // pack, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
        ),
        input_output_aliases={6: 0, 7: 1},
        interpret=interpret,
    )

    def run_block(rb, fb):
        band_init = jnp.concatenate([
            jnp.zeros((band, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
            jnp.full((d_max, BLOCK_SUBLANES, BLOCK_LANES), NEG_INF_I32, jnp.int32),
        ])
        best_init = jnp.stack([
            jnp.zeros((BLOCK_SUBLANES, BLOCK_LANES), jnp.int32) if local
            else jnp.full((BLOCK_SUBLANES, BLOCK_LANES), NEG_INF_I32, jnp.int32),
            jnp.zeros((BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
            jnp.zeros((BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
            jnp.zeros((BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
        ])

        def tile_step(carry, t):
            band_state, best_state = carry
            reads_tile = jax.lax.dynamic_slice(
                rb, (t * tile, 0, 0), (tile, BLOCK_SUBLANES, BLOCK_LANES))
            ws = win_starts[t]
            ref_win = jax.lax.dynamic_slice(
                fb, (ws, 0, 0), (win, BLOCK_SUBLANES, BLOCK_LANES))
            offs_tile = jax.lax.dynamic_slice(offsets, (t * tile,), (tile,))
            o_prev = jnp.where(
                t == 0, offs_tile[:1],
                jax.lax.dynamic_slice(offsets, (jnp.maximum(t * tile - 1, 0),), (1,)))
            band_state, best_state, ptr_tile = call(
                offs_tile, o_prev, ws[None], (t * tile)[None], reads_tile,
                ref_win, band_state, best_state,
            )
            return (band_state, best_state), ptr_tile

        (band_state, best_state), ptrs = jax.lax.scan(
            tile_step, (band_init, best_init), jnp.arange(n_tiles))
        ptr_full = ptrs.reshape(m_pad, band // pack,
                                BLOCK_SUBLANES, BLOCK_LANES)
        return ptr_full, best_state, band_state

    return jax.lax.map(lambda args: run_block(*args), (reads_b, refs_pad))


def banded_align_batch(
    reads: np.ndarray,
    refs: np.ndarray,
    params: AlignmentParameters,
    algorithm: Algorithm,
    band: int = 512,
    tile: int = 256,
    interpret: bool | None = None,
):
    """Banded full alignment (pointers + host decode). Memory: the pointer
    stream is 2 bits x band per row per pair; batch accordingly for long
    reads (e.g. 16kbp x 512 band = 2MB/pair)."""
    from versalignlib_tpu.types import Alignment, Trace, cigar_from_gapped

    if params.affine:
        raise NotImplementedError(
            "banded traceback is linear-gap only (affine banded is "
            "score-only; see TODO.md)"
        )
    if interpret is None:
        interpret = not _is_tpu()
    algorithm = Algorithm(algorithm)
    local = algorithm == Algorithm.SMITH_WATERMAN
    b, m = reads.shape
    n = refs.shape[1]
    band = min(band, n)
    tile = min(tile, max(8, m))
    m_pad = -(-m // tile) * tile
    g = max(1, -(-b // BLOCK_PAIRS))
    b_pad = g * BLOCK_PAIRS
    pack = 8 if band % 8 == 0 else (4 if band % 4 == 0 else (2 if band % 2 == 0 else 1))

    def pack_arr(x, length, pad_len):
        x = jnp.asarray(np.asarray(x)).astype(jnp.int32)
        x = jnp.pad(x, ((0, b_pad - x.shape[0]), (0, pad_len - length)))
        x = x.reshape(g, BLOCK_SUBLANES, BLOCK_LANES, pad_len)
        return jnp.transpose(x, (0, 3, 1, 2))

    offsets_np = band_offsets(m_pad, m, n, band)
    d_max = max(int(np.diff(offsets_np).max(initial=1)), 1) if m_pad > 1 else 1
    ptr, best, final_band = _banded_align_blocks(
        pack_arr(reads, m, m_pad), pack_arr(refs, n, n),
        jnp.asarray(offsets_np), params, algorithm, band, tile, d_max,
        interpret,
    )
    # (G, m_pad, nc, 8, 128) -> (B, m_pad, nc) etc.
    ptr = np.asarray(ptr).transpose(0, 3, 4, 1, 2).reshape(
        b_pad, m_pad, band // pack)[:b]
    best = np.asarray(best).transpose(0, 2, 3, 1).reshape(b_pad, 4)[:b]
    final_band = np.asarray(final_band).transpose(0, 2, 3, 1).reshape(
        b_pad, band + d_max)[:b]

    starts_r = np.zeros(b, dtype=np.int32)
    starts_f = np.zeros(b, dtype=np.int32)
    scores = np.zeros(b, dtype=np.int32)
    for k in range(b):
        if local:
            score, bi, bj = int(best[k, 0]), int(best[k, 1]), int(best[k, 2])
        else:
            # Overlap end: best of tracked last-column cells vs final row.
            lc_best, lc_i = int(best[k, 0]), int(best[k, 1])
            fr = final_band[k, :band]
            fr_k = int(np.argmax(fr))
            fr_best = int(fr[fr_k])
            # Final (padded) row index m_pad-1, absolute column from offsets.
            if fr_best >= lc_best:
                score, bi, bj = fr_best, m_pad - 1, int(offsets_np[m_pad - 1]) + fr_k
            else:
                score, bi, bj = lc_best, lc_i, n - 1
            score = max(score, 0)
        starts_r[k], starts_f[k], scores[k] = bi, bj, score

    try:
        from versalignlib_tpu.native import decode_banded_native

        return decode_banded_native(
            ptr, pack, band, offsets_np, np.asarray(reads), np.asarray(refs),
            starts_r, starts_f, params, algorithm, scores,
        )
    except ImportError:
        return [
            _banded_decode_one(
                ptr[k], reads[k], refs[k], offsets_np, pack, band,
                int(starts_r[k]), int(starts_f[k]), int(scores[k]), params,
                local)
            for k in range(b)
        ]



def _banded_decode_one(ptr_words, read, ref, offsets, pack, band,
                       start_i, start_j, score, params, local):
    """Host walk over band-relative packed pointers."""
    from versalignlib_tpu.ops.traceback import _text_from_codes
    from versalignlib_tpu.types import Alignment, Trace, cigar_from_gapped

    m, n = read.shape[0], ref.shape[0]
    read_text = _text_from_codes(read)
    ref_text = _text_from_codes(ref)
    rp, fp = start_i, start_j
    rg, fg = [], []
    steps = 0
    max_steps = ptr_words.shape[0] + n + 2
    while rp >= 0 and fp >= 0 and steps <= max_steps:
        k = fp - int(offsets[rp])
        if k < 0 or k >= band:
            break  # walked off the band: treat as boundary
        word = int(ptr_words[rp, k // pack])
        bt = (word >> (2 * (k % pack))) & 3
        if bt == Trace.START:
            break
        if bt == Trace.UP:
            rg.append(read_text[rp] if rp < m else "\0")
            fg.append("-")
            rp -= 1
        elif bt == Trace.LEFT:
            rg.append("-")
            fg.append(ref_text[fp])
            fp -= 1
        else:
            rg.append(read_text[rp] if rp < m else "\0")
            fg.append(ref_text[fp])
            rp -= 1
            fp -= 1
        steps += 1
    read_g = "".join(reversed(rg))
    ref_g = "".join(reversed(fg))
    aln_length = m + n
    return Alignment(
        read=read_g, ref=ref_g, score=int(score),
        cigar=cigar_from_gapped(read_g, ref_g),
        read_start=rp + 1, read_end=start_i + 1,
        ref_start=fp + 1, ref_end=start_j + 1,
        buffer_start=aln_length - 1 - steps, buffer_end=aln_length - 1,
    )
