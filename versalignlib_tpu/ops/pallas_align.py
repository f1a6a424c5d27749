"""Pallas TPU alignment kernel: DP fill emitting a packed pointer matrix.

The reference's traceback backends keep a full (m+1)x(n+1) pointer matrix
(chars in DefaultKernel, int16 lanes in SSE, __global shorts in OpenCL —
"does not fit into private memory", alignment_kernels.cl:10-12). On TPU the
pointer matrix cannot live in VMEM either (512x512 x 1024 pairs = 64MB+), so
pointers are packed 2 bits each into int32 words and streamed to HBM one DP
row per grid step — the grid's output pipeline plays the role of the OpenCL
global-memory spill, with Pallas double-buffering the stores.

Grid = (pair_blocks, read_rows). VMEM scratch (rolling H row + best-cell
registers) persists across the row dimension; ``@pl.when(i == 0)`` resets it
per pair block. Bookkeeping matches the reference exactly:

- SW: strict row-major argmax of the clamped matrix (DefaultKernel.cpp:252-256)
  tracked in scratch, emitted with the score;
- NW: column 0 penalized ``(i+1)*gap_ref`` (:305); per-row strict argmax
  seeded by the column-0 value (:317-318,352-355) emitted per row; the end
  cell ``(max_read_pos, min(max_ref_pos, globalRowMaxIndex))`` is assembled
  on host from code validity + the emitted argmax stream (:381-387). The H
  row of the last valid read row is captured via a host-supplied row mask so
  the end-cell score is exact in every tie-break flavor.

Traceback itself decodes on host (ops/traceback.py / the native decoder),
mirroring the reference's scalar per-lane backtracks (SSEKernel.cpp:785-860).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from versalignlib_tpu.ops import traceback as tb
from versalignlib_tpu.ops.pallas_score import (
    BLOCK_LANES,
    BLOCK_PAIRS,
    BLOCK_SUBLANES,
    _is_tpu,
)
from versalignlib_tpu.params import AlignmentParameters
from versalignlib_tpu.types import Algorithm, Alignment, TieBreak


def _pick_pack(n: int) -> int:
    """Pointers per int32 word — always fully packed (16 x 2-bit codes).

    Round-2 picked the largest divisor of n, which collapsed to 1 for odd
    ref lengths (16x the pointer bytes). The kernels now run full words via
    the grid loop plus ONE statically-shaped partial word for ``n % 16``
    trailing columns, so the pack never degrades; the decoder's word count
    is ceil(n / 16)."""
    return 16


#: rows advanced together per align grid step (register wavefront)
ALIGN_WAVE_ROWS = 4

#: test hook: force the words-per-fori-iteration depth (None = automatic);
#: lets the interpret-mode suite exercise the compiled multi-word path.
_WPG_OVERRIDE = None


def align_vmem_plan(n: int, affine: bool = False, local: bool = False) -> int:
    """VMEM bytes the align kernels request (worst case over algorithms when
    ``local=False``): double-buffered R-row read group, ref block, mrp,
    packed pointer rows + the folded (4,) aux block, hsel (NW), plus
    H/hkeep (+F) scratch, the column-context streams (c0/c1/cv) and the
    per-run load/store temporaries of the deep word unroll (8 words = 128
    columns live per iteration). m-independent — read rows stream R at a
    time through the grid. Single source of truth shared with
    ``capabilities.dense_fits``."""
    R = ALIGN_WAVE_ROWS
    pack = _pick_pack_affine(n) if affine else _pick_pack(n)
    nc = -(-n // pack)
    run = min(128, n)
    return 4 * BLOCK_PAIRS * 2 * (
        R + n + 1 + R * nc + 4 + (0 if local else (n + 1))
    ) + 4 * BLOCK_PAIRS * (
        ((2 if affine else 1)) * (n + 1) + (0 if local else (n + 1))
        + 3 * n                    # column-context streams
        + 8 * run                  # run temporaries (old/keep/store/ctx)
    ) + 2 * 1024 * 1024


def _align_kernel(*refs_args, m_pad, n, pack, wpg, R,
                  params: AlignmentParameters, local: bool, tie: TieBreak):
    """One (pair_block, row_group) grid step — R-row register wavefront.

    R read rows advance down each column together (row r consuming row r-1's
    just-computed value from a register, as in the score kernel), so the VMEM
    H row is read/written once per R cells; the NW last-valid-row capture is
    fused into the column chunks (the per-row O(n) capture pass of the
    previous design doubled VMEM traffic).

    Inputs per block:
      reads_ref: (1, R, 8, 128)   — this group's read codes
      refs_ref:  (1, n, 8, 128)   — ref codes (constant across groups)
      mrp_ref:   (1, 8, 128)      — per-pair max_read_pos (NW row capture)
    Outputs:
      ptr_ref:   (1, R, ceil(n/pack), 8, 128) int32 — packed pointer rows
                 (the last word is partial when pack does not divide n)
      aux_ref:   (1, 4, 8, 128) int32 — journal folded ON DEVICE (the r2
                 per-row journal shipped (m_pad, 2) words/pair; this is 4):
                 SW  [global_max, argmax_row, argmax_col, 0] with the
                     reference's row-major strict-first-win scan seeded
                     0/(0,0) (DefaultKernel.cpp:252-256);
                 NW  [row_argmax of the last valid read row, 0, 0, 0]
                     (leftmost strict argmax seeded by the column-0 value at
                     index 0, DefaultKernel.cpp:317-318).
      hsel_ref:  (1, n+1, 8, 128) int32 — H row of each pair's last valid
                 read row (NW only)
    Scratch: h_ref (n+1, 8, 128); hkeep_ref (n+1, 8, 128) (NW only);
    c0/c1/cv_ref (n, 8, 128) column-context streams (default scoring — the
    substitution context and the SSE validity mask are computed ONCE per
    pair block at ip == 0 and re-read by every row group, instead of paying
    col_prep per row group as the r4 kernel did; matrix modes keep per-group
    col_prep — their context is masks/shift register state, not storable
    words — and get (1, 8, 128) placeholders).

    ``wpg`` packed pointer words are processed per fori iteration (8 words =
    128 columns compiled, matching the score kernel's deep unroll; the r4
    kernel ran ONE 16-column word per iteration), with one H-row load/store
    and one ptr store per word-run.

    The aux block maps to the same VMEM block for every row group, so the
    fold is a read-modify-write across grid steps: per-row (max, argmax)
    registers accumulate inside the group, then merge in row order at group
    end — preserving the reference's row-major first-win exactly. Padded
    read rows (m_pad > m) are all-invalid; their values can only replay real
    values diagonally (sub == 0, gaps negative), never exceed the running
    max, and the strict ``>`` keeps the earlier real cell on equality.
    """
    if local:
        (reads_ref, refs_ref, mrp_ref, ptr_ref, aux_ref,
         h_ref, c0_ref, c1_ref, cv_ref) = refs_args
        hsel_ref = hkeep_ref = None
    else:
        (reads_ref, refs_ref, mrp_ref, ptr_ref, aux_ref, hsel_ref,
         h_ref, hkeep_ref, c0_ref, c1_ref, cv_ref) = refs_args
    ip = pl.program_id(1)
    i0 = ip * R
    # The DP runs in a LEFT-SHIFTED domain: every H/sub/gap value carries
    # ``value << 2`` with a 2-bit move PRIORITY in the low bits, so one
    # ``max`` selects (value, tie-priority) lexicographically and the 8-op
    # eq/select pointer chain disappears. Scores stay far inside int32/4.
    gap_read = jnp.int32(params.score_gap_read << 2)
    gap_ref = jnp.int32(params.score_gap_ref << 2)
    zeros = jnp.zeros((BLOCK_SUBLANES, BLOCK_LANES), jnp.int32)

    from versalignlib_tpu.alphabet import make_validity
    from versalignlib_tpu.ops.pallas_score import make_sub_fn

    row_prep, col_prep, sub_of = make_sub_fn(params, shift=2)
    vfn = make_validity(params.matrix)
    canonical = tie == TieBreak.DIAG_UP_LEFT
    use_cstream = params.matrix is None

    @pl.when(ip == 0)
    def _():
        h_ref[...] = jnp.zeros((n + 1, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32)
        aux_ref[0] = jnp.zeros((4, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32)
        if not local:
            hkeep_ref[...] = jnp.zeros((n + 1, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32)
        if use_cstream:
            # Fill the column-context streams once per pair block
            # (elementwise col_prep over whole chunks; ~2/m ops per cell
            # amortized vs 2/R for the per-group recompute).
            fc = min(128, n)

            def fill_cctx(j0, size):
                rc = refs_ref[0, pl.ds(j0, size)]
                fc2, fb = col_prep(rc)
                c0_ref[pl.ds(j0, size)] = fc2
                c1_ref[pl.ds(j0, size)] = fb
                if not canonical:
                    cv_ref[pl.ds(j0, size)] = jnp.where(
                        vfn(rc), jnp.int32(-1), jnp.int32(0))

            jax.lax.fori_loop(
                0, n // fc, lambda c, z: (fill_cctx(c * fc, fc), z)[1], 0)
            if n % fc:
                fill_cctx((n // fc) * fc, n % fc)

    rcs = [reads_ref[0, r] for r in range(R)]
    rctxs = [row_prep(rcs[r]) for r in range(R)]
    if not canonical:
        # SSE flavor gates DIAG on both symbols being score-valid: the DIAG
        # candidate's priority is 3 only when valid, else 0 (an invalid
        # DIAG that still wins on value falls through the reference's chain
        # to START, SSEKernel.cpp:364-379 — priority 0 reproduces that).
        rv3s = [jnp.where(vfn(rc), jnp.int32(3), jnp.int32(0)) for rc in rcs]
    if local:
        col0s = [zeros] * (R + 1)
    else:
        # Column 0: H[i+1][0] = (i+1)*gap_ref (DefaultKernel.cpp:305);
        # col0s[r] = H[i0+r][0], r=0 being the previous group's last row
        # (i0*gap_ref — 0 for the first group, the row-0 boundary).
        col0s = [jnp.full((BLOCK_SUBLANES, BLOCK_LANES), i0 + r, jnp.int32) * gap_ref
                 for r in range(R + 1)]
    if not local:
        mrows = [mrp_ref[0] == (i0 + r) for r in range(R)]
        # Column 0 of the captured row (host may index hsel at start_ref=-1).
        hk0 = hkeep_ref[0]
        for r in range(R):
            hk0 = jnp.where(mrows[r], col0s[r + 1], hk0)
        hkeep_ref[0] = hk0

    even = jnp.int32(0x55555555)

    def run_body(j0, w0, carry, word_sizes):
        # One word-run per call: ``len(word_sizes)`` packed pointer words
        # (statically unrolled), ONE H-row load/store and context load for
        # the whole run, one unconditional ptr store per completed word per
        # row (a predicated in-loop flush measured 20x slower).  j0/w0 are
        # the run's first column / word index.
        #
        # Move selection is a single packed max: every candidate carries
        # ``(value << 2) | priority`` and ``max`` picks (value, priority)
        # lexicographically — the 8-op eq/select chain is gone.
        #   canonical: priorities DIAG 2 > UP 1 > LEFT 0, with START as the
        #     SW clamp constant ``3`` = (value 0, priority 3): one max is
        #     simultaneously the zero-clamp AND the zero-force-to-START
        #     (a 0-valued candidate loses to it, exactly the reference's
        #     rule). Priorities are remapped to stored Trace codes once per
        #     completed word (a fixed 2-bit shuffle: code.b1 = ~prio.b0,
        #     code.b0 = prio.b1 ^ prio.b0 — START 3->0, DIAG 2->3, UP 1->1,
        #     LEFT 0->2).
        #   SSE flavor: priorities (valid-gated DIAG 3) > LEFT 2 > UP 1 >
        #     START 0 ARE the stored codes; the SW clamp constant is 0.
        lefts, diags, bests, bargs = carry
        total = sum(word_sizes)
        old = h_ref[pl.ds(j0 + 1, total)]
        if use_cstream:
            c0c = c0_ref[pl.ds(j0, total)]
            c1c = c1_ref[pl.ds(j0, total)]
            if not canonical:
                cvc = cv_ref[pl.ds(j0, total)]
        else:
            ref_chunk = refs_ref[0, pl.ds(j0, total)]
        if not local:
            keep_old = hkeep_ref[pl.ds(j0 + 1, total)]
            keep_new = []
        store_vals = []
        col = 0
        for wi, fill in enumerate(word_sizes):
            words = [zeros] * R
            for u in range(fill):
                up = old[col]
                if use_cstream:
                    cctx = (c0c[col], c1c[col])
                    if not canonical:
                        fvm = cvc[col]
                else:
                    ref_col = ref_chunk[col]
                    cctx = col_prep(ref_col)
                    if not canonical:
                        fvm = jnp.where(vfn(ref_col), jnp.int32(-1),
                                        jnp.int32(0))
                keep_u = keep_old[col] if not local else None
                new_lefts, new_diags = [], []
                for r in range(R):
                    sub = sub_of(rctxs[r], cctx)     # value << 2
                    if canonical:
                        diag_p = (diags[r] + sub) | 2
                        up_p = (up + gap_ref) | 1
                        left_p = lefts[r] + gap_read     # priority 0
                        cur_p = jnp.maximum(jnp.maximum(diag_p, up_p), left_p)
                        if local:
                            cur_p = jnp.maximum(cur_p, 3)
                    else:
                        diag_p = (diags[r] + sub) | (rv3s[r] & fvm)
                        left_p = (lefts[r] + gap_read) | 2
                        up_p = (up + gap_ref) | 1
                        cur_p = jnp.maximum(jnp.maximum(diag_p, left_p), up_p)
                        if local:
                            cur_p = jnp.maximum(cur_p, 0)
                    cur = cur_p & ~3                 # H << 2, priority cleared
                    words[r] = words[r] | ((cur_p & 3) << (2 * u))

                    # Per-row leftmost strict argmax journal (shifted domain
                    # — << 2 is monotonic, strictness preserved).
                    gt = cur > bests[r]
                    bests[r] = jnp.where(gt, cur, bests[r])
                    bargs[r] = jnp.where(gt, j0 + col, bargs[r])

                    if not local:
                        keep_u = jnp.where(mrows[r], cur, keep_u)
                    new_diags.append(up)
                    new_lefts.append(cur)
                    up = cur
                lefts, diags = new_lefts, new_diags
                store_vals.append(up)            # row R-1's H value
                if not local:
                    keep_new.append(keep_u)
                col += 1
            for r in range(R):
                w = words[r]
                if canonical:
                    # priority -> stored-code 2-bit shuffle, once per word.
                    w = (((~w) & even) << 1) | (((w >> 1) ^ w) & even)
                    if fill < pack:
                        # Unfilled fields would otherwise remap 0 -> LEFT;
                        # the walk's word-granular flag math must see START.
                        w = w & jnp.int32((1 << (2 * fill)) - 1)
                ptr_ref[0, r, w0 + wi] = w
        h_ref[pl.ds(j0 + 1, total)] = jnp.stack(store_vals)
        if not local:
            hkeep_ref[pl.ds(j0 + 1, total)] = jnp.stack(keep_new)
        return lefts, diags, bests, bargs

    init = (
        [col0s[r + 1] for r in range(R)],          # lefts: H[i0+r][0]
        [col0s[r] for r in range(R)],              # diags: H[i0+r-1][0]
        [zeros if local else col0s[r + 1] for r in range(R)],  # row-max seed
        [zeros] * R,                               # row-arg seed (index 0)
    )
    n_words = n // pack          # full words; n % pack via one partial word
    n_runs = n_words // wpg      # full word-runs through the fori loop
    run_sizes = (pack,) * wpg
    carry = init
    if n_runs:
        carry = jax.lax.fori_loop(
            0, n_runs,
            lambda c, cr: run_body(c * (wpg * pack), c * wpg, cr, run_sizes),
            carry)
    # Tail: leftover full words plus one partial word, a single
    # statically-shaped run (odd ref lengths keep the full pack).
    tail_sizes = (pack,) * (n_words - n_runs * wpg)
    if n % pack:
        tail_sizes = tail_sizes + (n % pack,)
    if tail_sizes:
        carry = run_body(n_runs * wpg * pack, n_runs * wpg, carry, tail_sizes)
    lefts, diags, bests, bargs = carry

    # Group-end fold into the persistent aux block (see docstring). The
    # fold runs in the shifted domain (monotonic, strictness preserved);
    # the last group unshifts what the host/walk reads as plain scores.
    if local:
        gbest, gi, gj = aux_ref[0, 0], aux_ref[0, 1], aux_ref[0, 2]
        for r in range(R):
            gt = bests[r] > gbest
            gbest = jnp.where(gt, bests[r], gbest)
            gi = jnp.where(gt, i0 + r, gi)
            gj = jnp.where(gt, bargs[r], gj)
        aux_ref[0, 0] = gbest
        aux_ref[0, 1] = gi
        aux_ref[0, 2] = gj

        @pl.when(ip == (m_pad // R) - 1)
        def _():
            aux_ref[0, 0] = aux_ref[0, 0] >> 2
    else:
        garg = aux_ref[0, 0]
        for r in range(R):
            garg = jnp.where(mrows[r], bargs[r], garg)
        aux_ref[0, 0] = garg

        @pl.when(ip == (m_pad // R) - 1)
        def _():
            hsel_ref[0] = hkeep_ref[...] >> 2


@functools.partial(jax.jit, static_argnames=("params", "algorithm", "tie", "interpret"))
def _align_blocks(reads_b, refs_b, mrp_b, params, algorithm: Algorithm,
                  tie: TieBreak, interpret: bool = False):
    """reads_b: (G, m_pad, 8, 128) with m_pad % R == 0 (padding rows are
    all-invalid and cannot disturb the journals: SW values can only replay
    diagonally, NW rows beyond mrp are ignored); refs_b: (G, n, 8, 128);
    mrp_b: (G, 8, 128).

    Returns (ptr_packed (G, m_pad, ceil(n/16), 8, 128),
             aux (G, 4, 8, 128) device-folded journal (see _align_kernel),
             hsel (G, n+1, 8, 128)).
    """
    g, m_pad = reads_b.shape[0], reads_b.shape[1]
    n = refs_b.shape[1]
    local = algorithm == Algorithm.SMITH_WATERMAN
    pack = _pick_pack(n)
    # Deep word unroll for compiled runs (8 words = 128 columns per fori
    # iteration, the score kernel's depth); interpret mode keeps one word
    # per iteration — XLA-CPU compiles of the unrolled body cost minutes.
    wpg = _WPG_OVERRIDE or (1 if interpret else 8)
    R = ALIGN_WAVE_ROWS
    assert m_pad % R == 0
    kernel = functools.partial(
        _align_kernel, m_pad=m_pad, n=n, pack=pack, wpg=wpg, R=R,
        params=params, local=local, tie=tie
    )
    nc = -(-n // pack)
    out_specs = [
        pl.BlockSpec((1, R, nc, BLOCK_SUBLANES, BLOCK_LANES),
                     lambda gg, ii: (gg, ii, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, BLOCK_SUBLANES, BLOCK_LANES),
                     lambda gg, ii: (gg, 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((g, m_pad, nc, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
        jax.ShapeDtypeStruct((g, 4, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
    ]
    scratch_shapes = [
        pltpu.VMEM((n + 1, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
    ]
    if not local:
        out_specs.append(
            pl.BlockSpec((1, n + 1, BLOCK_SUBLANES, BLOCK_LANES),
                         lambda gg, ii: (gg, 0, 0, 0), memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((g, n + 1, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32))
        scratch_shapes.append(
            pltpu.VMEM((n + 1, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32))
    # Column-context streams (default scoring; placeholders in matrix mode):
    # c0/c1 substitution context + cv SSE-validity mask, filled at ip == 0.
    use_cstream = params.matrix is None
    sse = tie != TieBreak.DIAG_UP_LEFT
    scratch_shapes += [
        pltpu.VMEM((n if use_cstream else 1, BLOCK_SUBLANES, BLOCK_LANES),
                   jnp.int32),
        pltpu.VMEM((n if use_cstream else 1, BLOCK_SUBLANES, BLOCK_LANES),
                   jnp.int32),
        pltpu.VMEM((n if (use_cstream and sse) else 1,
                    BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
    ]
    # Account for Pallas double-buffering of every in/out block.
    vmem_bytes = align_vmem_plan(n, affine=False, local=local)
    out = pl.pallas_call(
        kernel,
        grid=(g, m_pad // R),
        in_specs=[
            pl.BlockSpec((1, R, BLOCK_SUBLANES, BLOCK_LANES),
                         lambda gg, ii: (gg, ii, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, BLOCK_SUBLANES, BLOCK_LANES),
                         lambda gg, ii: (gg, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_SUBLANES, BLOCK_LANES),
                         lambda gg, ii: (gg, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        interpret=interpret,
    )(reads_b, refs_b, mrp_b)
    if local:
        ptr, aux = out
        return ptr, aux, None
    return out


def _chunk_pairs_for(m: int, nc: int, device_walk: bool) -> int:
    """Pairs per device round — the reference's memory-driven batching
    (OpenCLKernel.cpp:517-568) with the budget set by the binding resource.

    Pointer-D2H path: ~64MB of packed pointer words per round (the
    device->host link dominates). Device-walk path: the link carries only
    (m, ) records (4B/row/pair), so the link budget allows far larger
    rounds (fewer dispatch round-trips); the pointer stream stays in HBM,
    capped at ~1GB per round.
    """
    ptr_bytes = m * nc * 4
    if device_walk:
        blocks = max(1, min((64 << 20) // (m * 4 * BLOCK_PAIRS),
                            (1 << 30) // (ptr_bytes * BLOCK_PAIRS)))
        return min(128, blocks) * BLOCK_PAIRS
    blocks = max(1, (64 << 20) // (ptr_bytes * BLOCK_PAIRS))
    return min(16, blocks) * BLOCK_PAIRS


class PackedPtr:
    """2D pointer accessor over packed int32 words (one pair)."""

    def __init__(self, words: np.ndarray, pack: int, n: int):
        self.words = words  # (m, n_chunks)
        self.pack = pack
        self.shape = (words.shape[0], n)

    def __getitem__(self, idx):
        i, j = idx
        return (int(self.words[i, j // self.pack]) >> (2 * (j % self.pack))) & 3


def _pack_blocks(x, g: int, length: int):
    x = jnp.asarray(x).astype(jnp.int32)
    b_pad = g * BLOCK_PAIRS
    x = jnp.pad(x, ((0, b_pad - x.shape[0]), (0, 0)))
    x = x.reshape(g, BLOCK_SUBLANES, BLOCK_LANES, length)
    return jnp.transpose(x, (0, 3, 1, 2))


def _pack_vec(x, g: int):
    x = jnp.asarray(x).astype(jnp.int32)
    b_pad = g * BLOCK_PAIRS
    x = jnp.pad(x, (0, b_pad - x.shape[0]))
    return x.reshape(g, BLOCK_SUBLANES, BLOCK_LANES)


def _unpack_pairs(x: np.ndarray, g: int):
    """(G, ..., 8, 128) -> (G*1024, ...) moving pair dims to the front."""
    x = np.asarray(x)
    mid = x.shape[1:-2]
    perm = (0, x.ndim - 2, x.ndim - 1) + tuple(range(1, x.ndim - 2))
    return x.transpose(perm).reshape((g * BLOCK_PAIRS,) + mid)


def _validity(codes: np.ndarray, tie: TieBreak, matrix=None) -> np.ndarray:
    """Boundary validity flavor: Default counts any nonzero code valid; SSE
    only nonzero-scoring codes (A/C/G/T for DNA; matrix-aware otherwise)."""
    if tie == TieBreak.DIAG_UP_LEFT:
        return codes != 0
    from versalignlib_tpu.alphabet import make_validity

    return make_validity(matrix)(codes)


def _last_valid_pos(codes: np.ndarray, tie: TieBreak, matrix=None) -> np.ndarray:
    """Reference max_*_pos: index before the first invalid char, else len-1."""
    invalid = ~_validity(codes, tie, matrix)
    any_inv = invalid.any(axis=1)
    return np.where(any_inv, invalid.argmax(axis=1) - 1, codes.shape[1] - 1).astype(np.int32)


def pallas_align_batch(
    reads: np.ndarray,
    refs: np.ndarray,
    params: AlignmentParameters,
    algorithm: Algorithm,
    tie: TieBreak = TieBreak.DIAG_UP_LEFT,
    interpret: bool | None = None,
    chunk_pairs: int | None = None,
    read_texts: list[str] | None = None,
    ref_texts: list[str] | None = None,
    raw: bool = False,
    device_walk: bool = False,
    gapped: bool = True,
) -> list[Alignment]:
    """Full-batch alignment: Pallas pointer fill + traceback decode.

    Processes ``chunk_pairs`` pairs per device round to bound the packed
    pointer matrix's HBM/host/link footprint — the reference's memory-driven
    batching (OpenCLKernel.cpp:517-568) with the budget set by the
    device->host link (the pointer stream dominates: 2 bits/cell). Device
    dispatch is pipelined one chunk ahead of the host decode.

    ``raw=True`` returns a :class:`~versalignlib_tpu.types.AlignmentBatch`
    column store (requires the native decoder) — ~6x faster than
    materializing per-pair ``Alignment`` objects; use for bulk pipelines.

    ``device_walk=True`` walks the pointer matrix ON DEVICE (ops/walk.py):
    only per-row path records (4B/row/pair) cross the link instead of the
    packed pointer matrix (2 bits/cell — 8x more at 128bp, 32x at 512bp),
    and the host does a branch-free replay. Output is bit-identical
    (test-gated); the pointer stream never leaves HBM.

    Honors ``params.affine`` by routing to
    :func:`pallas_align_affine_batch` (the 2-bit linear kernel cannot
    represent Gotoh open/extend state — calling it directly with affine
    params previously returned LINEAR-model alignments silently).
    """
    if params.affine:
        return pallas_align_affine_batch(
            reads, refs, params, algorithm, tie=tie, interpret=interpret,
            chunk_pairs=chunk_pairs, read_texts=read_texts,
            ref_texts=ref_texts, raw=raw, device_walk=device_walk,
            gapped=gapped)
    if interpret is None:
        interpret = not _is_tpu()
    algorithm = Algorithm(algorithm)
    local = algorithm == Algorithm.SMITH_WATERMAN
    b, m = reads.shape
    n = refs.shape[1]
    if m == 0 or n == 0:
        # Degenerate empty sequences: empty alignments (boundary-only walk).
        return [
            tb.decode_one(np.zeros((1, 1), np.uint8), reads[i], refs[i],
                          -1, -1, params, algorithm)
            for i in range(b)
        ]
    pack = _pick_pack(n)
    if chunk_pairs is None:
        chunk_pairs = _chunk_pairs_for(m, -(-n // pack), device_walk)
    results: list[Alignment] = []

    m_pad = -(-m // ALIGN_WAVE_ROWS) * ALIGN_WAVE_ROWS

    def _dispatch(lo):
        r_np = np.asarray(reads[lo : lo + chunk_pairs])
        f_np = np.asarray(refs[lo : lo + chunk_pairs])
        g = max(1, -(-r_np.shape[0] // BLOCK_PAIRS))
        mrp = _last_valid_pos(r_np, tie, params.matrix)
        r_rows = np.pad(r_np, ((0, 0), (0, m_pad - m)))
        dev = _align_blocks(
            _pack_blocks(r_rows, g, m_pad), _pack_blocks(f_np, g, n),
            _pack_vec(mrp, g), params, algorithm, tie, interpret,
        )
        if device_walk:
            from versalignlib_tpu.ops.walk import walk_blocks

            ptr, aux, hsel = dev
            if local:
                dev = walk_blocks(ptr, aux, None, None, None,
                                  m=m, n=n, pack=pack, local=True)
            else:
                mxp = _last_valid_pos(f_np, tie, params.matrix)
                dev = walk_blocks(
                    ptr, aux, hsel, _pack_vec(mrp, g), _pack_vec(mxp, g),
                    m=m, n=n, pack=pack, local=False,
                )
        return lo, r_np, f_np, mrp, g, dev

    def _decode(entry):
        lo, r_np, f_np, mrp, g, dev = entry
        if device_walk:
            return _decode_records_chunk(
                lo, r_np, f_np, g, dev, params, algorithm,
                read_texts, ref_texts, raw, gapped)
        ptr, aux, hsel = dev
        return _decode_chunk(
            lo, r_np, f_np, mrp, g, ptr, aux, hsel, params, algorithm, tie,
            pack, n, read_texts, ref_texts, raw, gapped,
        )

    starts = list(range(0, b, chunk_pairs))
    pending = []
    for idx, start in enumerate(starts):
        pending.append(_dispatch(start))
        # Keep one chunk in flight ahead of the host decode.
        if len(pending) < 2 and idx + 1 < len(starts):
            continue
        results.append(_decode(pending.pop(0)))
    for entry in pending:
        results.append(_decode(entry))
    if raw:
        from versalignlib_tpu.types import AlignmentBatch

        return AlignmentBatch.concat(results)
    return [a for chunk in results for a in chunk]


def _decode_chunk(lo, r_np, f_np, mrp, g, ptr, aux, hsel, params, algorithm,
                  tie, pack, n, read_texts, ref_texts,
                  raw: bool = False, gapped: bool = True) -> list[Alignment]:
    local = algorithm == Algorithm.SMITH_WATERMAN
    m = r_np.shape[1]
    nb = r_np.shape[0]
    results: list[Alignment] = []
    ptr = _unpack_pairs(ptr, g)[:nb, :m]    # (nb, m, nc)
    aux = _unpack_pairs(aux, g)[:nb]        # (nb, 4) device-folded journal
    if local:
        # Device fold already implements the reference SW argmax: first cell
        # (row-major) attaining the global max, strict > scan seeded at
        # 0/(0,0) (DefaultKernel.cpp:252-256); gmax == 0 folds to (0, 0).
        scores = aux[:, 0].astype(np.int32)
        start_r = aux[:, 1].astype(np.int32)
        start_f = aux[:, 2].astype(np.int32)
    else:
        hsel = _unpack_pairs(hsel, g)[:nb]  # (nb, n+1)
        max_ref_pos = _last_valid_pos(f_np, tie, params.matrix)
        # aux[:, 0] = leftmost strict argmax of the last valid read row
        # (0 when mrp < 0: no row matches the capture mask).
        gri = aux[:, 0]
        start_r = mrp
        start_f = np.minimum(max_ref_pos, gri).astype(np.int32)
        scores = np.where(
            start_r >= 0, hsel[np.arange(nb), np.clip(start_f, -1, n - 1) + 1], 0
        ).astype(np.int32)

    rt = None if read_texts is None else read_texts[lo : lo + nb]
    ft = None if ref_texts is None else ref_texts[lo : lo + nb]
    try:
        from versalignlib_tpu.native import decode_batch_native

        return decode_batch_native(
            (ptr, pack), r_np, f_np, start_r, start_f, params,
            algorithm, scores, rt, ft, raw=raw, gapped=gapped,
        )
    except ImportError:
        if raw:
            raise  # raw mode requires the native decoder
        for k in range(nb):
            results.append(
                tb.decode_one(
                    PackedPtr(ptr[k], pack, n), r_np[k], f_np[k],
                    int(start_r[k]), int(start_f[k]), params, algorithm,
                    int(scores[k]),
                    None if rt is None else rt[k],
                    None if ft is None else ft[k],
                )
            )
    return results


def _decode_records_chunk(lo, r_np, f_np, g, dev, params, algorithm,
                          read_texts, ref_texts, raw: bool = False,
                          gapped: bool = True):
    """Device-walk decode: replay per-row records (see ops/walk.py)."""
    from versalignlib_tpu.ops.walk import replay_batch

    records, start_r, start_f, scores = dev
    nb = r_np.shape[0]
    records = _unpack_pairs(records, g)[:nb]
    start_r = _unpack_pairs(start_r, g)[:nb]
    start_f = _unpack_pairs(start_f, g)[:nb]
    scores = _unpack_pairs(scores, g)[:nb]
    rt = None if read_texts is None else read_texts[lo : lo + nb]
    ft = None if ref_texts is None else ref_texts[lo : lo + nb]
    return replay_batch(
        records, r_np, f_np, start_r, start_f, scores, params, algorithm,
        rt, ft, raw=raw, gapped=gapped)


# ---------------------------------------------------------------------------
# Affine (Gotoh) variant: 4-bit codes, 8 per int32 word
# ---------------------------------------------------------------------------

def _pick_pack_affine(n: int) -> int:
    """4-bit affine codes: always 8 per int32 word (partial trailing word
    when 8 does not divide n — see _pick_pack)."""
    return 8


def _affine_align_kernel(*refs_args, m_pad, n, pack, wpg, R,
                         params: AlignmentParameters, local: bool,
                         tie: TieBreak):
    """Affine pointer-row fill; 4-bit codes hptr(2b)|e_ext<<2|f_ext<<3.

    Same R-row register wavefront as the linear kernel plus a persisted
    Gotoh F row (F flows row-to-row through the wave registers, the scratch
    holds the group's last row); E is a register carry within each row.
    Canonical tie order DIAG > UP(F) > LEFT(E) with the SW zero-force; the
    SSE flavor gates DIAG on symbol validity and orders DIAG > LEFT(E) >
    UP(F), no zero-force (gotoh._affine_pointers). Extend beats open on gap
    ties in both flavors. aux is the device-folded (4,) journal of the
    linear kernel (SW [gmax, gi, gj, 0]; NW [argmax of last valid row]).

    Shares the linear kernel's r5 treatments: column-context streams
    (c0/c1/cv scratch, filled once per pair block at ip == 0) and ``wpg``
    packed words per fori iteration (16 words = 128 columns compiled).
    """
    from versalignlib_tpu.ops.pallas_score import NEG_INF_I32

    if local:
        (reads_ref, refs_ref, mrp_ref, ptr_ref, aux_ref,
         h_ref, f_ref, c0_ref, c1_ref, cv_ref) = refs_args
        hsel_ref = hkeep_ref = None
    else:
        (reads_ref, refs_ref, mrp_ref, ptr_ref, aux_ref, hsel_ref,
         h_ref, f_ref, hkeep_ref, c0_ref, c1_ref, cv_ref) = refs_args
    ip = pl.program_id(1)
    i0 = ip * R
    # Shifted domain (see the linear kernel): H/E/F carry value << 2 with a
    # 2-bit move priority in cur's low bits; NEG_INF_I32 itself serves as
    # the shifted -inf sentinel (drift stays thousands, far from wrap).
    ext_r = jnp.int32(params.score_gap_read << 2)
    ext_f = jnp.int32(params.score_gap_ref << 2)
    open_r = jnp.int32(params.gap_open_read << 2)
    open_f = jnp.int32(params.gap_open_ref << 2)
    zeros = jnp.zeros((BLOCK_SUBLANES, BLOCK_LANES), jnp.int32)

    from versalignlib_tpu.alphabet import make_validity
    from versalignlib_tpu.ops.pallas_score import make_sub_fn

    row_prep, col_prep, sub_of = make_sub_fn(params, shift=2)
    vfn = make_validity(params.matrix)
    canonical = tie == TieBreak.DIAG_UP_LEFT
    use_cstream = params.matrix is None

    @pl.when(ip == 0)
    def _():
        h_ref[...] = jnp.zeros((n + 1, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32)
        f_ref[...] = jnp.full((n, BLOCK_SUBLANES, BLOCK_LANES), NEG_INF_I32, jnp.int32)
        aux_ref[0] = jnp.zeros((4, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32)
        if not local:
            hkeep_ref[...] = jnp.zeros((n + 1, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32)
        if use_cstream:
            # Column-context streams, once per pair block (see _align_kernel).
            fc = min(128, n)

            def fill_cctx(j0, size):
                rc = refs_ref[0, pl.ds(j0, size)]
                fc2, fb = col_prep(rc)
                c0_ref[pl.ds(j0, size)] = fc2
                c1_ref[pl.ds(j0, size)] = fb
                if not canonical:
                    cv_ref[pl.ds(j0, size)] = jnp.where(
                        vfn(rc), jnp.int32(-1), jnp.int32(0))

            jax.lax.fori_loop(
                0, n // fc, lambda c, z: (fill_cctx(c * fc, fc), z)[1], 0)
            if n % fc:
                fill_cctx((n // fc) * fc, n % fc)

    rcs = [reads_ref[0, r] for r in range(R)]
    rctxs = [row_prep(rcs[r]) for r in range(R)]
    if not canonical:
        # SSE flavor: valid-gated DIAG priority (see the linear kernel).
        rv3s = [jnp.where(vfn(rc), jnp.int32(3), jnp.int32(0)) for rc in rcs]
    if local:
        col0s = [zeros] * (R + 1)
    else:
        # Gotoh boundary: H[k][0] = open_f + k*ext_f (k >= 1), H[0][0] = 0
        # (shifted constants keep this in the shifted domain).
        col0s = [
            jnp.where(i0 + r == 0, zeros,
                      open_f + jnp.full((BLOCK_SUBLANES, BLOCK_LANES),
                                        i0 + r, jnp.int32) * ext_f)
            for r in range(R + 1)
        ]
    if not local:
        mrows = [mrp_ref[0] == (i0 + r) for r in range(R)]
        hk0 = hkeep_ref[0]
        for r in range(R):
            hk0 = jnp.where(mrows[r], col0s[r + 1], hk0)
        hkeep_ref[0] = hk0

    even4 = jnp.int32(0x11111111)   # bit 0 of each 4-bit field
    ef4 = jnp.int32(0xCCCCCCCC - (1 << 32))  # e_ext|f_ext bits per field

    def run_body(j0, w0, carry, word_sizes):
        # One word-run per call (see _align_kernel.run_body): one H/F-row
        # load/store and context load for the whole run, one ptr store per
        # completed word per row.
        lefts, diags, evals, bests, bargs = carry
        total = sum(word_sizes)
        old = h_ref[pl.ds(j0 + 1, total)]
        f_old = f_ref[pl.ds(j0, total)]
        if use_cstream:
            c0c = c0_ref[pl.ds(j0, total)]
            c1c = c1_ref[pl.ds(j0, total)]
            if not canonical:
                cvc = cv_ref[pl.ds(j0, total)]
        else:
            ref_chunk = refs_ref[0, pl.ds(j0, total)]
        if not local:
            keep_old = hkeep_ref[pl.ds(j0 + 1, total)]
            keep_new = []
        store_vals = []
        f_store = []
        col = 0
        for wi, fill in enumerate(word_sizes):
            words = [zeros] * R
            for u in range(fill):
                up = old[col]
                if use_cstream:
                    cctx = (c0c[col], c1c[col])
                    if not canonical:
                        fvm = cvc[col]
                else:
                    ref_col = ref_chunk[col]
                    cctx = col_prep(ref_col)
                    if not canonical:
                        fvm = jnp.where(vfn(ref_col), jnp.int32(-1),
                                        jnp.int32(0))
                f_up = f_old[col]
                keep_u = keep_old[col] if not local else None
                new_lefts, new_diags, new_evals = [], [], []
                for r in range(R):
                    sub = sub_of(rctxs[r], cctx)     # value << 2
                    # max(a+c, b+c) == max(a,b)+c (exact in ints); the extend
                    # bits compare the pre-add maxes: f_val == f_up+ext iff
                    # max(up+open, f_up) == f_up.
                    f_pre = jnp.maximum(up + open_f, f_up)
                    f_val = f_pre + ext_f
                    e_pre = jnp.maximum(lefts[r] + open_r, evals[r])
                    e_new = e_pre + ext_r
                    diag_v = diags[r] + sub
                    # Packed value|priority max (see the linear kernel).
                    if canonical:
                        # DIAG 2 > UP(F) 1 > LEFT(E) 0; START = the SW clamp
                        # constant 3; prio -> code remap once per word below.
                        cur_p = jnp.maximum(jnp.maximum(diag_v | 2, f_val | 1),
                                            e_new)
                        if local:
                            cur_p = jnp.maximum(cur_p, 3)
                    else:
                        # SSE: valid-gated DIAG 3 > LEFT(E) 2 > UP(F) 1 are
                        # the stored codes; no zero-force (START only when
                        # every candidate is negative in SW).
                        cur_p = jnp.maximum(
                            jnp.maximum(diag_v | (rv3s[r] & fvm), e_new | 2),
                            f_val | 1)
                        if local:
                            cur_p = jnp.maximum(cur_p, 0)
                    cur = cur_p & ~3                 # H << 2, priority cleared
                    # where(eq, const, 0) in place of astype<<shift: one
                    # select instead of select+shift per extend flag.
                    code = (cur_p & 3) \
                        | jnp.where(e_pre == evals[r], jnp.int32(4),
                                    jnp.int32(0)) \
                        | jnp.where(f_pre == f_up, jnp.int32(8),
                                    jnp.int32(0))
                    words[r] = words[r] | (code << (4 * u))

                    gt = cur > bests[r]
                    bests[r] = jnp.where(gt, cur, bests[r])
                    bargs[r] = jnp.where(gt, j0 + col, bargs[r])

                    if not local:
                        keep_u = jnp.where(mrows[r], cur, keep_u)
                    new_diags.append(up)
                    new_lefts.append(cur)
                    new_evals.append(e_new)
                    up = cur
                    f_up = f_val
                lefts, diags, evals = new_lefts, new_diags, new_evals
                store_vals.append(up)        # row R-1's H value
                f_store.append(f_up)         # row R-1's F value
                if not local:
                    keep_new.append(keep_u)
                col += 1
            for r in range(R):
                w = words[r]
                if canonical:
                    # hptr priority -> stored-code shuffle per 4-bit field
                    # (b1' = ~b0, b0' = b1 ^ b0), e_ext/f_ext bits untouched.
                    w = (w & ef4) | (((~w) & even4) << 1) | (((w >> 1) ^ w) & even4)
                    if fill < pack:
                        # Unfilled fields would remap 0 -> LEFT; keep START.
                        w = w & jnp.int32((1 << (4 * fill)) - 1)
                ptr_ref[0, r, w0 + wi] = w
        h_ref[pl.ds(j0 + 1, total)] = jnp.stack(store_vals)
        f_ref[pl.ds(j0, total)] = jnp.stack(f_store)
        if not local:
            hkeep_ref[pl.ds(j0 + 1, total)] = jnp.stack(keep_new)
        return lefts, diags, evals, bests, bargs

    # E init: -inf, but DATA-dependent (min of a loaded vector with the
    # constant) — a pure splat carry gets a replicated Mosaic layout that
    # cannot re-join the concrete loop value (observed at pack == 1:
    # "Invalid relayout: ... replicated in destination but not in source").
    e_init = [jnp.minimum(reads_ref[0, r], jnp.int32(NEG_INF_I32))
              for r in range(R)]
    init = (
        [col0s[r + 1] for r in range(R)],
        [col0s[r] for r in range(R)],
        e_init,
        [zeros if local else col0s[r + 1] for r in range(R)],
        [zeros] * R,
    )
    n_words = n // pack
    n_runs = n_words // wpg
    run_sizes = (pack,) * wpg
    carry = init
    if n_runs:
        carry = jax.lax.fori_loop(
            0, n_runs,
            lambda c, cr: run_body(c * (wpg * pack), c * wpg, cr, run_sizes),
            carry)
    tail_sizes = (pack,) * (n_words - n_runs * wpg)
    if n % pack:
        tail_sizes = tail_sizes + (n % pack,)
    if tail_sizes:
        carry = run_body(n_runs * wpg * pack, n_runs * wpg, carry, tail_sizes)
    lefts, diags, evals, bests, bargs = carry

    # Group-end fold into the persistent aux block (see _align_kernel).
    if local:
        gbest, gi, gj = aux_ref[0, 0], aux_ref[0, 1], aux_ref[0, 2]
        for r in range(R):
            gt = bests[r] > gbest
            gbest = jnp.where(gt, bests[r], gbest)
            gi = jnp.where(gt, i0 + r, gi)
            gj = jnp.where(gt, bargs[r], gj)
        aux_ref[0, 0] = gbest
        aux_ref[0, 1] = gi
        aux_ref[0, 2] = gj

        @pl.when(ip == (m_pad // R) - 1)
        def _():
            # Leave the H << 2 domain at the block boundary.
            aux_ref[0, 0] = aux_ref[0, 0] >> 2
    else:
        garg = aux_ref[0, 0]
        for r in range(R):
            garg = jnp.where(mrows[r], bargs[r], garg)
        aux_ref[0, 0] = garg

        @pl.when(ip == (m_pad // R) - 1)
        def _():
            hsel_ref[0] = hkeep_ref[...] >> 2


@functools.partial(jax.jit, static_argnames=("params", "algorithm", "tie", "interpret"))
def _affine_align_blocks(reads_b, refs_b, mrp_b, params, algorithm: Algorithm,
                         tie: TieBreak = TieBreak.DIAG_UP_LEFT,
                         interpret: bool = False):
    """Affine analogue of _align_blocks; same output structure."""
    g, m_pad = reads_b.shape[0], reads_b.shape[1]
    n = refs_b.shape[1]
    local = algorithm == Algorithm.SMITH_WATERMAN
    pack = _pick_pack_affine(n)
    # 16 words x 8 columns = 128 columns per fori iteration compiled (the
    # score kernel's depth); one word per iteration under interpret.
    wpg = _WPG_OVERRIDE or (1 if interpret else 16)
    R = ALIGN_WAVE_ROWS
    assert m_pad % R == 0
    kernel = functools.partial(
        _affine_align_kernel, m_pad=m_pad, n=n, pack=pack, wpg=wpg, R=R,
        params=params, local=local, tie=tie
    )
    nc = -(-n // pack)
    out_specs = [
        pl.BlockSpec((1, R, nc, BLOCK_SUBLANES, BLOCK_LANES),
                     lambda gg, ii: (gg, ii, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, BLOCK_SUBLANES, BLOCK_LANES),
                     lambda gg, ii: (gg, 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((g, m_pad, nc, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
        jax.ShapeDtypeStruct((g, 4, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
    ]
    scratch_shapes = [
        pltpu.VMEM((n + 1, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
        pltpu.VMEM((n, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),  # F row
    ]
    if not local:
        out_specs.append(
            pl.BlockSpec((1, n + 1, BLOCK_SUBLANES, BLOCK_LANES),
                         lambda gg, ii: (gg, 0, 0, 0), memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((g, n + 1, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32))
        scratch_shapes.append(
            pltpu.VMEM((n + 1, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32))
    # Column-context streams (see _align_blocks).
    use_cstream = params.matrix is None
    sse = tie != TieBreak.DIAG_UP_LEFT
    scratch_shapes += [
        pltpu.VMEM((n if use_cstream else 1, BLOCK_SUBLANES, BLOCK_LANES),
                   jnp.int32),
        pltpu.VMEM((n if use_cstream else 1, BLOCK_SUBLANES, BLOCK_LANES),
                   jnp.int32),
        pltpu.VMEM((n if (use_cstream and sse) else 1,
                    BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
    ]
    vmem_bytes = align_vmem_plan(n, affine=True, local=local)
    out = pl.pallas_call(
        kernel,
        grid=(g, m_pad // R),
        in_specs=[
            pl.BlockSpec((1, R, BLOCK_SUBLANES, BLOCK_LANES),
                         lambda gg, ii: (gg, ii, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, BLOCK_SUBLANES, BLOCK_LANES),
                         lambda gg, ii: (gg, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_SUBLANES, BLOCK_LANES),
                         lambda gg, ii: (gg, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        interpret=interpret,
    )(reads_b, refs_b, mrp_b)
    if local:
        ptr, aux = out
        return ptr, aux, None
    return out


def _unpack_affine_words(words: np.ndarray, pack: int, n: int) -> np.ndarray:
    """(b, m, nc) int32 -> (b, m, n) uint8 4-bit codes (python fallback)."""
    b, m, nc = words.shape
    out = np.zeros((b, m, n), dtype=np.uint8)
    for u in range(pack):
        cols = np.arange(u, n, pack)
        out[:, :, cols] = ((words >> (4 * u)) & 15).astype(np.uint8)[:, :, : cols.size]
    return out


def pallas_align_affine_batch(
    reads: np.ndarray,
    refs: np.ndarray,
    params: AlignmentParameters,
    algorithm: Algorithm,
    tie: TieBreak = TieBreak.DIAG_UP_LEFT,
    interpret: bool | None = None,
    chunk_pairs: int | None = None,
    read_texts: list[str] | None = None,
    ref_texts: list[str] | None = None,
    raw: bool = False,
    device_walk: bool = False,
    gapped: bool = True,
) -> list[Alignment]:
    """Affine full-batch alignment on the Pallas path.

    Pointer model: ops/gotoh.py — canonical DIAG > UP(F) > LEFT(E) with the
    SW zero-force, or the SSE flavor (validity-gated DIAG > LEFT(E) > UP(F),
    no zero-force); extend beats open in both. ``raw=True`` returns an
    :class:`~versalignlib_tpu.types.AlignmentBatch` column store (requires
    the native decoder), as in :func:`pallas_align_batch`.
    ``device_walk=True`` runs the Gotoh traceback on device (ops/walk.py —
    the 4-bit pointer stream never leaves HBM; records replay is shared
    with the linear path).
    """
    if interpret is None:
        interpret = not _is_tpu()
    algorithm = Algorithm(algorithm)
    local = algorithm == Algorithm.SMITH_WATERMAN
    b, m = reads.shape
    n = refs.shape[1]
    if m == 0 or n == 0:
        return [
            tb.decode_one(np.zeros((1, 1), np.uint8), reads[i], refs[i],
                          -1, -1, params, algorithm)
            for i in range(b)
        ]
    pack = _pick_pack_affine(n)
    if chunk_pairs is None:
        chunk_pairs = _chunk_pairs_for(m, -(-n // pack), device_walk)
    results: list[Alignment] = []
    m_pad = -(-m // ALIGN_WAVE_ROWS) * ALIGN_WAVE_ROWS

    # Same 1-ahead pipelined dispatch as the linear path (the r2 affine loop
    # was synchronous — device fill of chunk k+1 now overlaps the host
    # decode of chunk k).
    def _dispatch(lo):
        r_np = np.asarray(reads[lo : lo + chunk_pairs])
        f_np = np.asarray(refs[lo : lo + chunk_pairs])
        g = max(1, -(-r_np.shape[0] // BLOCK_PAIRS))
        mrp = _last_valid_pos(r_np, tie, params.matrix)
        r_rows = np.pad(r_np, ((0, 0), (0, m_pad - m)))
        dev = _affine_align_blocks(
            _pack_blocks(r_rows, g, m_pad), _pack_blocks(f_np, g, n),
            _pack_vec(mrp, g), params, algorithm, tie, interpret,
        )
        if device_walk:
            from versalignlib_tpu.ops.walk import walk_blocks_affine

            ptr, aux, hsel = dev
            if local:
                dev = walk_blocks_affine(ptr, aux, None, None, None,
                                         m=m, n=n, pack=pack, local=True)
            else:
                mxp = _last_valid_pos(f_np, tie, params.matrix)
                dev = walk_blocks_affine(
                    ptr, aux, hsel, _pack_vec(mrp, g), _pack_vec(mxp, g),
                    m=m, n=n, pack=pack, local=False,
                )
        return lo, r_np, f_np, mrp, g, dev

    def _decode(item):
        lo, r_np, f_np, mrp, g, dev = item
        if device_walk:
            return _decode_records_chunk(
                lo, r_np, f_np, g, dev, params, algorithm,
                read_texts, ref_texts, raw, gapped)
        ptr, aux, hsel = dev
        return _decode_affine_chunk(
            lo, r_np, f_np, mrp, g, ptr, aux, hsel, params, algorithm, tie,
            pack, n, read_texts, ref_texts, raw, gapped,
        )

    starts = list(range(0, b, chunk_pairs))
    pending = []
    for idx, start in enumerate(starts):
        pending.append(_dispatch(start))
        if len(pending) < 2 and idx + 1 < len(starts):
            continue
        results.append(_decode(pending.pop(0)))
    for item in pending:
        results.append(_decode(item))
    if raw:
        from versalignlib_tpu.types import AlignmentBatch

        return AlignmentBatch.concat(results)
    return [a for chunk in results for a in chunk]


def _decode_affine_chunk(lo, r_np, f_np, mrp, g, ptr, aux, hsel, params,
                         algorithm, tie, pack, n, read_texts,
                         ref_texts, raw: bool = False,
                         gapped: bool = True) -> list[Alignment]:
    """Affine analogue of :func:`_decode_chunk` (4-bit codes, Gotoh walk)."""
    local = algorithm == Algorithm.SMITH_WATERMAN
    m = r_np.shape[1]
    nb = r_np.shape[0]
    ptr = _unpack_pairs(ptr, g)[:nb, :m]
    aux = _unpack_pairs(aux, g)[:nb]        # (nb, 4) device-folded journal
    if local:
        scores = aux[:, 0].astype(np.int32)
        start_r = aux[:, 1].astype(np.int32)
        start_f = aux[:, 2].astype(np.int32)
    else:
        hsel = _unpack_pairs(hsel, g)[:nb]
        max_ref_pos = _last_valid_pos(f_np, tie, params.matrix)
        gri = aux[:, 0]
        start_r = mrp
        start_f = np.minimum(max_ref_pos, gri).astype(np.int32)
        scores = np.where(
            start_r >= 0, hsel[np.arange(nb), np.clip(start_f, -1, n - 1) + 1], 0
        ).astype(np.int32)
    rt = None if read_texts is None else read_texts[lo : lo + nb]
    ft = None if ref_texts is None else ref_texts[lo : lo + nb]
    try:
        from versalignlib_tpu.native import decode_batch_native

        return decode_batch_native(
            (ptr, pack), r_np, f_np, start_r, start_f, params, algorithm,
            scores, rt, ft, affine=True, raw=raw, gapped=gapped,
        )
    except ImportError:
        if raw:
            raise  # raw mode requires the native decoder
        dense = _unpack_affine_words(ptr, pack, n)
        return tb.decode_batch_affine(
            dense, r_np, f_np, start_r, start_f, params, algorithm,
            scores, rt, ft,
        )
