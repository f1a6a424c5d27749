"""Pallas TPU score kernels — the production hot path.

Design ("interpair" kernel): the TPU generalization of the reference's
inter-pair SIMD (8 int16 lanes per SSE instruction, SSEKernel.h:24; 16 per
AVX2/OpenCL work item). Here every VPU op processes a (8, 128) int32 register
tile = **1024 independent pairs at once**:

- pairs are packed along the (sublane, lane) dims: block b holds pairs
  ``b*1024 + s*128 + l`` at ``[s, l]``;
- the DP runs the reference's row-major cell order (DefaultKernel.cpp:93-128)
  sequentially *per pair* but vectorized *across pairs*, so no wavefront
  reordering is needed — the recurrence's data dependencies live entirely
  within a lane;
- the rolling H row (the reference's 2-row matrix, SCORING_ROWS=2,
  SSEKernel.cpp:14) lives in VMEM scratch as (n+1, 8, 128) int32 and is
  updated in place: reading H[j] before overwriting yields the "up" value,
  register carries provide "left" and "diag" — one VMEM load + one store per
  cell;
- the inner loop is unrolled ``unroll`` columns per iteration with chunked
  VMEM loads/stores, keeping the scalar core far ahead of the VPU;
- the grid dimension streams pair blocks; tail pairs are padded with
  all-zero (invalid) sequences, which score 0 — the same fill-up semantics
  as the reference's tail batches (SSEKernel.cpp:84-128).

Semantics are bit-identical to the reference kernels (same recurrence,
clamping, and NW overlap-score bookkeeping as the golden-gated oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from versalignlib_tpu.params import AlignmentParameters
from versalignlib_tpu.types import Algorithm

#: pairs per grid block: one full (sublane, lane) int32 register tile
BLOCK_SUBLANES = 8
BLOCK_LANES = 128
BLOCK_PAIRS = BLOCK_SUBLANES * BLOCK_LANES


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _pick_unroll(n: int) -> int:
    """Largest unroll factor dividing n — retained for the search kernel;
    the score/align kernels now run a fixed unroll of 8 over full chunks
    plus one statically-shaped remainder chunk, so odd ref lengths keep
    full throughput (the r2 cliff: unroll fell to 1 when n was prime)."""
    for u in (8, 4, 2):
        if n % u == 0:
            return u
    return 1


#: -inf stand-in safe against int32 adds
NEG_INF_I32 = -(2**30)


def make_sub_fn(params: AlignmentParameters, shift: int = 0):
    """(row_prep, col_prep, sub_of) triple for in-kernel substitution scoring.

    ``shift``: produce substitution scores pre-multiplied by ``1 << shift``
    (for kernels that run their DP in a left-shifted domain, e.g. the align
    kernel's packed value|priority max). Free for the default and chain
    paths (constants are scaled at trace time); +1 VPU op per cell on the
    bit-packed matrix path.

    Default: the reference's 6x6 structure as arithmetic — 3 VPU ops per
    cell (eq + select + mask-AND; no gather, alphabet.py:9-16): invalid
    codes map to DISTINCT per-side sentinels (-2 read / -1 ref) so the
    equality can never fire across validity, the ref context carries a
    pre-selected ``fbase`` (mismatch if the ref base is valid else 0), and
    read-side validity is a full-width bit mask folded in with one AND.
    The column context is two plain int32 vectors, so kernels can
    precompute it once per ref column into VMEM scratch instead of paying
    col_prep per row group (the score kernel does). Generic S x S
    ``params.matrix``: a per-row table is built once per row group by
    ``row_prep`` (amortized over the whole ref sweep); ``col_prep`` computes
    per-column lookup state once, shared across the R wavefront rows; each
    cell pays a gather-free VPU lookup (gathers don't vectorize on TPU; the
    MXU is inapplicable — both lookup indices are lane-local, so a systolic
    contraction can only materialize the whole (m, n) plane through HBM,
    MEASURED 2.2-47x slower, MXU_PROBE.json): biased
    matrix entries bit-packed 8-per-word (entry span <= 15) or 4-per-word
    (span <= 255) — ceil(S/fields) selects + a lane-wise variable-shift
    field extract per cell — falling back to an (S-1)-select chain when the
    chain is cheaper or the span exceeds 8 bits. Matrix row/col 0 are
    all-zero (validated), so padding and out-of-range codes score 0 exactly
    like the reference's '\\0' fill-up.
    """
    match = jnp.int32(params.score_match << shift)
    mismatch = jnp.int32(params.score_mismatch << shift)
    if params.matrix is None:
        def row_prep(rc):
            rv = (rc >= 1) & (rc <= 4)
            # (sentinel-mapped code, full-width validity mask)
            return (jnp.where(rv, rc, jnp.int32(-2)),
                    jnp.where(rv, jnp.int32(-1), jnp.int32(0)))

        def col_prep(ref_col):
            fv = (ref_col >= 1) & (ref_col <= 4)
            # (sentinel-mapped code, pre-selected base score) — two plain
            # int32 vectors, storable in VMEM scratch.
            return (jnp.where(fv, ref_col, jnp.int32(-1)),
                    jnp.where(fv, mismatch, jnp.int32(0)))

        def sub_of(rctx, cctx):
            rc2, rmask = rctx
            fc2, fbase = cctx
            # -2 != -1: the eq can only fire when BOTH sides are valid;
            # fbase is already 0 for invalid ref; the AND zeroes invalid
            # reads (x & -1 == x, x & 0 == 0 — exact for negatives too).
            return jnp.where(rc2 == fc2, match, fbase) & rmask

        return row_prep, col_prep, sub_of

    M = params.matrix
    S = len(M)
    entries = [M[a][s] for a in range(S) for s in range(S)]

    lo, hi = min(entries), max(entries)
    _fw = 4 if hi - lo <= 15 else 8
    _W = -(-S // (32 // _fw))
    # Per-cell cost: packed = W selects + ~3 extract ops; chain = S-1
    # selects. Pack whenever it wins (a 6x6 span<=15 matrix is ONE word).
    if hi - lo <= 255 and _W + 3 < S - 1:
        # Bit-packed row tables: each read row's matrix row is packed into
        # W int32 words of biased fields (field = M - lo), at the narrowest
        # power-of-2 field width the entry SPAN allows — 4 bits / 8 fields
        # per word for span <= 15 (BLOSUM62's [-4,11] fits: W = 4 at S=25),
        # else 8 bits / 4 fields. A cell pays W selects + a lane-wise
        # variable-shift field extract (~7 VPU ops at S=25) instead of an
        # (S-1)-select chain (24) — and holds W words live per wavefront
        # row instead of S vectors, which matters as much for register
        # pressure as for ALU count.
        fw, W = _fw, _W                      # field bits / words per row
        fpw = 32 // fw                       # fields per word
        fmask = (1 << fw) - 1
        bias = -lo

        def _word(a: int, w: int) -> int:
            v = 0
            for k in range(fpw):
                s_col = fpw * w + k
                f = (M[a][s_col] + bias) if s_col < S else bias
                v |= (f & fmask) << (fw * k)
            return v - (1 << 32) if v >= (1 << 31) else v

        all_bias = _word(0, 0)  # row 0 is all-zero (validated) = pure bias
        packed = [[_word(a, w) for w in range(W)] for a in range(S)]
        idx_shift = fpw.bit_length() - 1     # log2(fields per word)
        sh_shift = fw.bit_length() - 1       # log2(field bits)

        def row_prep(rc):
            words = []
            for w in range(W):
                acc = jnp.full_like(rc, all_bias)  # codes 0 / >= S: sub 0
                for a in range(1, S):
                    if packed[a][w] != all_bias:
                        acc = jnp.where(rc == a, jnp.int32(packed[a][w]), acc)
                words.append(acc)
            return words

        def col_prep(ref_col):
            # Word index + field shift, shared across the R wavefront rows.
            masks = [(ref_col >> idx_shift) == w for w in range(W)]
            return masks, (ref_col & (fpw - 1)) << sh_shift

        def sub_of(words, cctx):
            masks, fshift = cctx
            word = jnp.full_like(fshift, all_bias)  # ref codes >= W*fpw: sub 0
            for w in range(W):
                word = jnp.where(masks[w], words[w], word)
            # Arithmetic shift then mask is exact even when the top field
            # sets the sign bit; fields are biased non-negative.
            val = ((word >> fshift) & fmask) - bias
            return (val << shift) if shift else val

        return row_prep, col_prep, sub_of

    def row_prep(rc):
        rows = []
        for s_col in range(S):
            acc = jnp.zeros_like(rc)  # M[0][s] == 0; codes >= S fall through
            for a in range(1, S):
                if M[a][s_col] != 0:
                    acc = jnp.where(rc == a, jnp.int32(M[a][s_col] << shift),
                                    acc)
            rows.append(acc)
        return rows

    def col_prep(ref_col):
        return [ref_col == s_col for s_col in range(1, S)]

    def sub_of(rows, masks):
        acc = rows[0]  # per-lane M[rc][0] == 0 (col 0 zeros)
        for s_col in range(1, S):
            acc = jnp.where(masks[s_col - 1], rows[s_col], acc)
        return acc

    return row_prep, col_prep, sub_of


#: rows advanced together per pass (lead rows live in registers)
WAVE_ROWS = 4


def _score_kernel(reads_ref, refs_ref, out_ref, h_ref, f_ref, c0_ref, c1_ref,
                  *, m, n, unroll, params: AlignmentParameters, local: bool):
    """One pair-block: reads (1, m, 8, 128), refs (1, n, 8, 128) int32 codes.

    h_ref: (n+1, 8, 128) int32 VMEM scratch (rolling H row).
    f_ref: (n, 8, 128) int32 scratch (rolling Gotoh F row; affine only, else
    a (1, 8, 128) placeholder).
    c0_ref/c1_ref: (n, 8, 128) int32 scratch (default scoring only, else
    (1, 8, 128) placeholders): the per-column substitution context
    (sentinel code, base score) precomputed ONCE per block, so the row-group
    loop pays two VMEM loads per column instead of re-deriving the context
    m/R times (~1 VPU op/cell saved at R=4).
    out_ref: (1, 8, 128) int32 best scores per pair.

    The main loop is an **R-row register wavefront** (R = WAVE_ROWS): R
    consecutive read rows advance down each column in one pass, row r
    consuming row r-1's just-computed value from a register, so the VMEM H
    row is read once and written once per R cells. This cuts VMEM traffic
    and loop overhead by R vs the naive rolling row (R=4 measured 1.9x over
    R=1 on v5e; R=8 regresses on register pressure). Tail rows (m % R) run
    single-row passes. Affine (Gotoh) mode threads per-row E carries and
    chains F through the same register wave (model: ops/gotoh.py).
    """
    match = jnp.int32(params.score_match)
    mismatch = jnp.int32(params.score_mismatch)
    gap_read = jnp.int32(params.score_gap_read)
    gap_ref = jnp.int32(params.score_gap_ref)
    affine = params.affine
    open_read = jnp.int32(params.gap_open_read)
    open_ref = jnp.int32(params.gap_open_ref)
    zero = jnp.zeros((BLOCK_SUBLANES, BLOCK_LANES), jnp.int32)
    neg_inf = jnp.full((BLOCK_SUBLANES, BLOCK_LANES), NEG_INF_I32, jnp.int32)
    n_chunks = n // unroll   # full chunks; n % unroll handled statically

    # Fresh rows per grid step (scratch persists across grid iterations).
    h_ref[...] = jnp.zeros((n + 1, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32)
    if affine:
        f_ref[...] = jnp.full((n, BLOCK_SUBLANES, BLOCK_LANES), NEG_INF_I32, jnp.int32)

    row_prep, col_prep, sub_of = make_sub_fn(params)

    # Default scoring: stream the column context through scratch (col_prep
    # is elementwise, so whole chunks go through it at once, ~5/m ops/cell
    # amortized); matrix modes keep per-group col_prep (their context is
    # masks/shift register state, not two storable words).
    use_cstream = params.matrix is None
    if use_cstream:
        def fill_cctx(j0, size):
            fc2, fb = col_prep(refs_ref[0, pl.ds(j0, size)])
            c0_ref[pl.ds(j0, size)] = fc2
            c1_ref[pl.ds(j0, size)] = fb

        jax.lax.fori_loop(
            0, n_chunks,
            lambda c, z: (fill_cctx(c * unroll, unroll), z)[1], 0)
        if n % unroll:
            fill_cctx(n_chunks * unroll, n % unroll)

    def make_group_body(R, base=None):
        """Row-group DP pass. ``base``: static start row (tail) or None to
        derive from the loop index (main fori over groups of R)."""

        def group_body(idx, best):
            i0 = idx * R if base is None else base
            rctxs = [row_prep(reads_ref[0, i0 + r]) for r in range(R)]
            h0 = h_ref[0]  # column-0 boundary: 0 in both score paths

            def run_chunk(j0, carry, size):
                lefts, diags, evals, best = carry
                old = h_ref[pl.ds(j0 + 1, size)]     # row i0-1 values
                if use_cstream:
                    c0_chunk = c0_ref[pl.ds(j0, size)]
                    c1_chunk = c1_ref[pl.ds(j0, size)]
                else:
                    ref_chunk = refs_ref[0, pl.ds(j0, size)]
                if affine:
                    f_old = f_ref[pl.ds(j0, size)]
                    f_store = []
                store_vals = []
                for u in range(size):
                    cctx = ((c0_chunk[u], c1_chunk[u]) if use_cstream
                            else col_prep(ref_chunk[u]))
                    up = old[u]
                    f_up = f_old[u] if affine else None
                    new_lefts, new_diags, new_evals = [], [], []
                    for r in range(R):
                        s = sub_of(rctxs[r], cctx)
                        if affine:
                            # max(a+c, b+c) == max(a,b)+c: one add saved per
                            # gap arm (exact in ints).
                            f_val = jnp.maximum(up + open_ref, f_up) + gap_ref
                            e_val = jnp.maximum(lefts[r] + open_read,
                                                evals[r]) + gap_read
                            # SW: fuse the zero-clamp into the e-branch max.
                            e_in = jnp.maximum(e_val, 0) if local else e_val
                            cur = jnp.maximum(jnp.maximum(diags[r] + s, f_val),
                                              e_in)
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
                            best = jnp.maximum(best, cur)
                        new_diags.append(up)
                        new_lefts.append(cur)
                        up = cur
                    lefts, diags = new_lefts, new_diags
                    if affine:
                        evals = new_evals
                        f_store.append(f_up)   # row R-1's F value
                    store_vals.append(up)      # row R-1's H value
                h_ref[pl.ds(j0 + 1, size)] = jnp.stack(store_vals)
                if affine:
                    f_ref[pl.ds(j0, size)] = jnp.stack(f_store)
                return lefts, diags, evals, best

            init = ([h0] * R, [h0] * R, [neg_inf] * R, best)
            carry = jax.lax.fori_loop(
                0, n_chunks, lambda c, cr: run_chunk(c * unroll, cr, unroll),
                init)
            if n % unroll:
                # Statically-shaped remainder columns (odd ref lengths keep
                # the full unroll for the bulk of the sweep).
                carry = run_chunk(n_chunks * unroll, carry, n % unroll)
            lefts, _, _, best = carry
            if not local:
                # NW overlap: max over the LAST column of every row
                # (DefaultKernel.cpp:177); lefts[r] holds H_{i0+r}[n].
                for r in range(R):
                    best = jnp.maximum(best, lefts[r])
            return best

        return group_body

    R = WAVE_ROWS
    best = jax.lax.fori_loop(0, m // R, make_group_body(R), zero)
    for tail_row in range((m // R) * R, m):
        best = make_group_body(1, base=tail_row)(0, best)
    if not local:
        # ... and over the entire final row (DefaultKernel.cpp:189-191);
        # clamped >= 0 because the reference's globalMax starts at 0.
        def final_fold(j, b):
            return jnp.maximum(b, h_ref[j])
        best = jax.lax.fori_loop(0, n + 1, final_fold, best)
        best = jnp.maximum(best, 0)
    out_ref[0] = best


def score_vmem_plan(m: int, n: int, affine: bool = False) -> int:
    """VMEM bytes the score kernel requests for one (m, n) pair block:
    H (+F) scratch rows, column-context streams, double-buffered read/ref
    blocks, out, headroom. Counts the context streams unconditionally
    (matrix modes allocate placeholders — the gate stays conservative).
    Single source of truth shared with ``capabilities.dense_fits``."""
    return 4 * BLOCK_PAIRS * (
        (n + 1)                    # H scratch
        + (n if affine else 1)     # F scratch
        + 2 * n                    # column-context streams (default path)
        + 2 * (m + n)              # double-buffered read/ref blocks
        + 6 * min(128, n)          # per-chunk load/store stack temporaries
                                   # (old/c0/c1/store + remainder overlap at
                                   # unroll=128 — a 509-column sweep OOM'd
                                   # the old 1MB headroom by 80KB)
        + 2                        # out
    ) + 1024 * 1024                # headroom


@functools.partial(
    jax.jit, static_argnames=("params", "algorithm", "interpret")
)
def _score_blocks(reads_b, refs_b, params: AlignmentParameters,
                  algorithm: Algorithm, interpret: bool = False):
    """reads_b: (G, m, 8, 128) int32; refs_b: (G, n, 8, 128) int32."""
    g, m = reads_b.shape[0], reads_b.shape[1]
    n = refs_b.shape[1]
    local = algorithm == Algorithm.SMITH_WATERMAN
    kernel = functools.partial(
        # Deep unroll feeds the TPU compiler; interpreter-mode (CPU tests)
        # keeps the shallow one — a 128-column unrolled body costs minutes
        # of XLA-CPU compile time for zero interpret-mode benefit.
        _score_kernel, m=m, n=n, unroll=min(8 if interpret else 128, n),
        params=params, local=local,
    )
    vmem_bytes = score_vmem_plan(m, n, params.affine)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, m, BLOCK_SUBLANES, BLOCK_LANES),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, BLOCK_SUBLANES, BLOCK_LANES),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_SUBLANES, BLOCK_LANES),
                               lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, BLOCK_SUBLANES, BLOCK_LANES),
                                       jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((n + 1, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
            pltpu.VMEM((n if params.affine else 1, BLOCK_SUBLANES, BLOCK_LANES),
                       jnp.int32),
            pltpu.VMEM((n if params.matrix is None else 1,
                        BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
            pltpu.VMEM((n if params.matrix is None else 1,
                        BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        cost_estimate=pl.CostEstimate(
            flops=12 * g * m * n * BLOCK_PAIRS,
            bytes_accessed=4 * g * (m + n) * BLOCK_PAIRS,
            transcendentals=0,
        ),
        interpret=interpret,
    )(reads_b, refs_b)


@functools.partial(jax.jit, static_argnames=("params", "algorithm", "interpret"))
def score_batch_device(reads, refs, params: AlignmentParameters,
                       algorithm: Algorithm, interpret: bool = False):
    """Device-side batch scoring: (B, m), (B, n) uint8/int32 -> (B,) int32.

    Pads the batch up to a multiple of BLOCK_PAIRS with all-invalid pairs
    (score 0), packs pairs into (G, len, 8, 128) blocks, runs the Pallas
    kernel, and unpacks.
    """
    b, m = reads.shape
    n = refs.shape[1]
    g = max(1, -(-b // BLOCK_PAIRS))
    b_pad = g * BLOCK_PAIRS

    def pack(x, length):
        x = x.astype(jnp.int32)
        x = jnp.pad(x, ((0, b_pad - b), (0, 0)))
        # (b_pad, L) -> (G, 8, 128, L) -> (G, L, 8, 128)
        x = x.reshape(g, BLOCK_SUBLANES, BLOCK_LANES, length)
        return jnp.transpose(x, (0, 3, 1, 2))

    out = _score_blocks(pack(reads, m), pack(refs, n), params, algorithm,
                        interpret)
    # (G, 8, 128) -> (b,)
    return out.reshape(b_pad)[:b]


class PallasScorer:
    """Thin host wrapper choosing compiled vs interpreter mode."""

    def __init__(self, interpret: bool | None = None):
        self.interpret = (not _is_tpu()) if interpret is None else interpret

    def __call__(self, reads, refs, params, algorithm):
        if reads.shape[1] == 0 or refs.shape[1] == 0:
            # Degenerate empty sequences: all scores 0.
            return np.zeros(reads.shape[0], dtype=np.int32)
        out = score_batch_device(
            jnp.asarray(reads), jnp.asarray(refs), params,
            Algorithm(algorithm), self.interpret,
        )
        return np.asarray(out, dtype=np.int32)
