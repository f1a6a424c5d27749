"""NumPy scalar oracle — the semantic ground truth for every other backend.

Replicates the reference DefaultKernel's DP semantics exactly
(/root/reference/src/Kernels/default/DefaultKernel.cpp), including its quirks:

- Smith-Waterman (score + traceback): clamp at 0, global argmax in row-major
  "strictly greater" order (DefaultKernel.cpp:252-256), traceback until a
  START pointer (:417-439).
- "Needleman-Wunsch" score-only is an *overlap* score: row 0 and column 0
  stay 0, result = max over the last column of every row and over the whole
  final row, never negative (globalMax starts at 0) (:148-199).
- NW traceback variant differs from its score variant: column 0 IS penalized
  (``(i+1)*gap_ref``, pointer UP, :304-305) and the traceback start cell is
  ``(max_read_pos, min(max_ref_pos, globalRowMaxIndex))`` where max_*_pos are
  the last valid (non-padding) positions and globalRowMaxIndex is the argmax
  column of the last valid read row (:285-388).
- Substitution scoring through the char->code + 6x6 table (DefaultKernel.h:43-96).

The row fill is vectorized with the prefix-max identity
``H[i,j] = max_k<=j (T[k] + (j-k)*gap_read)  =  gap_read*j + cummax(T - gap_read*iota)``
(exact in integer arithmetic), so the oracle is fast enough to gate large
randomized test batches; pointers are then derived from the completed H
matrix, which is equivalent to the reference's in-loop pointer selection.

This module is deliberately NOT the reference's buggy ``memset(scores, max, 1)``
score write (DefaultKernel.cpp:137,199 — stores only the low byte); scores
here are true int32 values.
"""

from __future__ import annotations

import numpy as np

from versalignlib_tpu.alphabet import make_validity, substitution_scores
from versalignlib_tpu.params import AlignmentParameters
from versalignlib_tpu.types import Algorithm, Alignment, TieBreak, Trace, cigar_from_gapped


# ---------------------------------------------------------------------------
# DP matrix fill
# ---------------------------------------------------------------------------

def _row_fill(t_row: np.ndarray, gap_read: int) -> np.ndarray:
    """Resolve the within-row left dependency: H[j] = max(T[j], H[j-1]+gap).

    Exact prefix-max formulation; ``t_row`` has length ref_len+1 with
    ``t_row[0]`` = the column-0 boundary value.
    """
    j = np.arange(t_row.size, dtype=np.int64)
    shifted = np.maximum.accumulate(t_row.astype(np.int64) - gap_read * j)
    return (shifted + gap_read * j).astype(np.int32)


def _fill_matrix(
    read: np.ndarray,
    ref: np.ndarray,
    p: AlignmentParameters,
    *,
    local: bool,
    col0_penalty: bool,
    sub: np.ndarray | None = None,
) -> np.ndarray:
    """Full (read_len+1, ref_len+1) H matrix.

    ``local``: clamp cells at 0 (Smith-Waterman).
    ``col0_penalty``: column 0 = (i)*gap_ref as in the NW traceback variant
    (row i of H corresponds to read_pos i-1, so H[i,0] = i*gap_ref matches
    the reference's ``(read_pos+1)*scoreGapRef``); otherwise column 0 stays 0.
    ``sub``: optional precomputed (read_len, ref_len) substitution plane
    (position-specific scoring, ops/pssm.py); default derives it from the
    codes.
    """
    read = np.asarray(read, dtype=np.int32)
    ref = np.asarray(ref, dtype=np.int32)
    m, n = read.size, ref.size
    h = np.zeros((m + 1, n + 1), dtype=np.int32)
    if col0_penalty:
        h[:, 0] = np.arange(m + 1, dtype=np.int32) * p.score_gap_ref

    # sub[i, j] = substitution score of read[i] vs ref[j]
    if sub is None:
        sub = substitution_scores(read[:, None], ref[None, :], p.score_match, p.score_mismatch, p.matrix)

    for i in range(1, m + 1):
        t = np.empty(n + 1, dtype=np.int32)
        t[0] = h[i, 0]
        diag = h[i - 1, :n] + sub[i - 1]
        up = h[i - 1, 1:] + p.score_gap_ref
        t[1:] = np.maximum(diag, up)
        if local:
            t[1:] = np.maximum(t[1:], 0)
        h[i, 1:] = _row_fill(t, p.score_gap_read)[1:]
    return h


# ---------------------------------------------------------------------------
# Score-only paths
# ---------------------------------------------------------------------------

def sw_score(read: np.ndarray, ref: np.ndarray, p: AlignmentParameters) -> int:
    """Smith-Waterman score: global max of the clamped matrix
    (DefaultKernel.cpp:83-138)."""
    h = _fill_matrix(read, ref, p, local=True, col0_penalty=False)
    return int(h.max())


def nw_score(read: np.ndarray, ref: np.ndarray, p: AlignmentParameters) -> int:
    """Semi-global ("NW") overlap score (DefaultKernel.cpp:140-202).

    Free leading gaps (row 0 / col 0 are 0) and free trailing gaps (max over
    last column of every row and over the entire final row); clamped >= 0
    because the reference's globalMax starts at 0.
    """
    h = _fill_matrix(read, ref, p, local=False, col0_penalty=False)
    last_col = h[1:, -1].max() if h.shape[0] > 1 else 0
    last_row = h[-1, :].max()
    return int(max(0, last_col, last_row))


# ---------------------------------------------------------------------------
# Pointer matrices
# ---------------------------------------------------------------------------

def _pointers(
    h: np.ndarray,
    sub: np.ndarray,
    valid_comp: np.ndarray,
    p: AlignmentParameters,
    *,
    local: bool,
    tie: TieBreak,
) -> np.ndarray:
    """Pointer matrix (same shape as h; row/col 0 = START).

    Equivalent to the reference's in-loop pointer selection. Flavors:

    - DIAG_UP_LEFT (Default, DefaultKernel.cpp:238-248/:338-346): if/else
      chain START(SW@0) > DIAG > UP > LEFT; DIAG unconditional.
    - DIAG_LEFT_UP (SSE, SSEKernel.cpp:364-379): max-of-codes
      DIAG(3) > LEFT(2) > UP(1), DIAG only where both symbols are valid
      (``valid_comp`` — A/C/G/T for the DNA table; nonzero matrix row/col
      for custom matrices, alphabet.valid_code_mask), no START force at
      zero SW cells.
    """
    m, n = h.shape
    ptr = np.zeros((m, n), dtype=np.uint8)
    if m == 1 or n == 1:
        if not local and m > 1:
            ptr[1:, 0] = Trace.UP
        return ptr
    cur = h[1:, 1:]
    diag = h[:-1, :-1] + sub
    up = h[:-1, 1:] + p.score_gap_ref
    left = h[1:, :-1] + p.score_gap_read

    is_diag = cur == diag
    is_up = cur == up
    is_left = cur == left

    if tie == TieBreak.DIAG_UP_LEFT:
        out = np.where(is_diag, Trace.DIAG, np.where(is_up, Trace.UP, np.where(is_left, Trace.LEFT, Trace.START))).astype(np.uint8)
        if local:
            out = np.where(cur == 0, np.uint8(Trace.START), out)
    else:
        is_diag = is_diag & valid_comp
        out = np.where(is_diag, Trace.DIAG, np.where(is_left, Trace.LEFT, np.where(is_up, Trace.UP, Trace.START))).astype(np.uint8)
    ptr[1:, 1:] = out
    if not local:
        # NW traceback variant: column 0 pointers are UP (DefaultKernel.cpp:304).
        ptr[1:, 0] = Trace.UP
    return ptr


# ---------------------------------------------------------------------------
# Full alignment (traceback) paths
# ---------------------------------------------------------------------------

def _text_from_codes(codes: np.ndarray) -> str:
    """Fallback rendering of a code array when the original characters are
    unavailable: A/T/C/G/N for codes 1-5, '\0' for code 0."""
    table = "\0ATCGN"
    return "".join(table[int(c)] if 0 <= int(c) <= 5 else "\0" for c in codes)


def _traceback(
    read: np.ndarray,
    ref: np.ndarray,
    ptr: np.ndarray,
    start_read_pos: int,
    start_ref_pos: int,
    score: int,
    read_text: str | None = None,
    ref_text: str | None = None,
) -> Alignment:
    """Walk pointers from (start_read_pos, start_ref_pos) until START,
    emitting gapped strings exactly like DefaultKernel.cpp:413-451.

    The reference emits the ORIGINAL input characters (case preserved); pass
    ``read_text``/``ref_text`` for bit-identical output when the caller still
    has them (codes alone lose case and non-ACGTN identity).
    """
    if read_text is None:
        read_text = _text_from_codes(read)
    if ref_text is None:
        ref_text = _text_from_codes(ref)

    aln_length = read.size + ref.size
    read_chars: list[str] = []
    ref_chars: list[str] = []
    rp, fp = int(start_read_pos), int(start_ref_pos)
    steps = 0
    while rp >= -1 and fp >= -1:
        bt = ptr[rp + 1, fp + 1]
        if bt == Trace.START:
            break
        if bt == Trace.UP:
            read_chars.append(read_text[rp])
            ref_chars.append("-")
            rp -= 1
        elif bt == Trace.LEFT:
            read_chars.append("-")
            ref_chars.append(ref_text[fp])
            fp -= 1
        else:  # DIAG
            read_chars.append(read_text[rp])
            ref_chars.append(ref_text[fp])
            rp -= 1
            fp -= 1
        steps += 1
        if steps > aln_length:  # safety; cannot happen with valid pointers
            raise RuntimeError("traceback did not terminate")

    read_g = "".join(reversed(read_chars))
    ref_g = "".join(reversed(ref_chars))
    buffer_start = aln_length - 1 - steps  # == reference's aln_pos + 1
    return Alignment(
        read=read_g,
        ref=ref_g,
        score=int(score),
        cigar=cigar_from_gapped(read_g, ref_g),
        read_start=rp + 1,
        read_end=int(start_read_pos) + 1,
        ref_start=fp + 1,
        ref_end=int(start_ref_pos) + 1,
        buffer_start=buffer_start,
        buffer_end=aln_length - 1,
    )


def sw_align(
    read: np.ndarray,
    ref: np.ndarray,
    p: AlignmentParameters,
    tie: TieBreak = TieBreak.DIAG_UP_LEFT,
    read_text: str | None = None,
    ref_text: str | None = None,
) -> Alignment:
    """SW full alignment (DefaultKernel.cpp:204-280, 391-456)."""
    read = np.asarray(read, dtype=np.int32)
    ref = np.asarray(ref, dtype=np.int32)
    h = _fill_matrix(read, ref, p, local=True, col0_penalty=False)
    sub = substitution_scores(read[:, None], ref[None, :], p.score_match, p.score_mismatch, p.matrix)
    vfn = make_validity(p.matrix)
    valid_comp = vfn(read)[:, None] & vfn(ref)[None, :]
    ptr = _pointers(h, sub, valid_comp, p, local=True, tie=tie)
    inner = h[1:, 1:]
    if inner.size == 0:
        return _traceback(read, ref, ptr, -1, -1, 0, read_text, ref_text)
    # Reference tracks "cur > max_score" in row-major order with max_score
    # starting at 0 (DefaultKernel.cpp:252-256). Cells are clamped >= 0, so
    # np.argmax's first-occurrence-of-max is exactly that scan (equal cells
    # never replace the best; all-zero matrices yield (0, 0)).
    flat = int(np.argmax(inner))
    best_read, best_ref = divmod(flat, inner.shape[1])
    score = int(inner[best_read, best_ref])
    return _traceback(read, ref, ptr, best_read, best_ref, score, read_text, ref_text)


def nw_align(
    read: np.ndarray,
    ref: np.ndarray,
    p: AlignmentParameters,
    tie: TieBreak = TieBreak.DIAG_UP_LEFT,
    read_text: str | None = None,
    ref_text: str | None = None,
) -> Alignment:
    """NW (semi-global) full alignment (DefaultKernel.cpp:282-389, 458-525).

    End cell = (max_read_pos, min(max_ref_pos, globalRowMaxIndex)), making the
    alignment robust to '\\0' padding: the whole unpadded read aligns, ending
    at the best ref column of its last valid row.
    """
    read = np.asarray(read, dtype=np.int32)
    ref = np.asarray(ref, dtype=np.int32)
    m, n = read.size, ref.size
    h = _fill_matrix(read, ref, p, local=False, col0_penalty=True)
    sub = substitution_scores(read[:, None], ref[None, :], p.score_match, p.score_mismatch, p.matrix)
    vfn = make_validity(p.matrix)
    valid_comp = vfn(read)[:, None] & vfn(ref)[None, :]
    ptr = _pointers(h, sub, valid_comp, p, local=False, tie=tie)

    # End-cell validity tracking: the Default kernel counts N as valid
    # (char_to_score != 0, DefaultKernel.cpp:308,348) while SSE counts only
    # A/C/G/T (SSEKernel.cpp:515-527,676-681; generalized to nonzero-scoring
    # codes for custom matrices).
    if tie == TieBreak.DIAG_UP_LEFT:
        read_valid = read != 0
        ref_valid = ref != 0
    else:
        read_valid = vfn(read)
        ref_valid = vfn(ref)
    # max_read_pos: position before the first invalid read char (or m-1).
    invalid_reads = np.flatnonzero(~read_valid)
    max_read_pos = int(invalid_reads[0]) - 1 if invalid_reads.size else m - 1
    invalid_refs = np.flatnonzero(~ref_valid)
    max_ref_pos = int(invalid_refs[0]) - 1 if invalid_refs.size else n - 1

    # globalRowMaxIndex: argmax ref_pos of row (max_read_pos+1) in H, where the
    # running max starts at the column-0 boundary value with index 0 and only
    # strictly-greater cells replace it (DefaultKernel.cpp:317-355,381-385).
    def row_max_index(row_idx: int) -> int:
        # Strict-improvement scan: the recorded index is the first ref_pos
        # achieving the row max, or 0 if the column-0 boundary value already
        # ties/beats every cell (rowMax starts at the col-0 score with
        # rowMaxIndex = 0, DefaultKernel.cpp:317-318).
        row = h[row_idx + 1]  # h row for read_pos == row_idx
        inner_row = row[1:]
        if inner_row.size == 0 or int(inner_row.max()) <= int(row[0]):
            return 0
        return int(np.argmax(inner_row))

    if max_read_pos >= 0:
        global_row_max_index = row_max_index(max_read_pos)
    else:
        # Read starts with an invalid char: reference captures rowMaxIndex's
        # initial value 0 (DefaultKernel.cpp:313-315 with rowMaxIndex = 0).
        global_row_max_index = 0

    best_ref = min(max_ref_pos, global_row_max_index)
    start_rp, start_fp = max_read_pos, best_ref
    score = int(h[start_rp + 1, start_fp + 1]) if start_rp >= -1 and start_fp >= -1 else 0
    return _traceback(read, ref, ptr, start_rp, start_fp, score, read_text, ref_text)


# ---------------------------------------------------------------------------
# Batch API (reference AlignmentKernel virtuals)
# ---------------------------------------------------------------------------

def score_alignments(
    algorithm: Algorithm,
    reads: np.ndarray,
    refs: np.ndarray,
    p: AlignmentParameters,
) -> np.ndarray:
    """Batch scores; reads/refs are (n, L) uint8 code arrays.

    Honors ``p.affine`` by routing to the Gotoh oracle (ops/gotoh.py) —
    the per-pair ``sw_score``/``nw_score`` helpers are linear-only.
    """
    if p.affine:
        from versalignlib_tpu.ops import gotoh

        return gotoh.score_alignments_affine(algorithm, reads, refs, p)
    fn = sw_score if algorithm == Algorithm.SMITH_WATERMAN else nw_score
    return np.array([fn(r, f, p) for r, f in zip(reads, refs)], dtype=np.int32)


def compute_alignments(
    algorithm: Algorithm,
    reads: np.ndarray,
    refs: np.ndarray,
    p: AlignmentParameters,
    tie: TieBreak = TieBreak.DIAG_UP_LEFT,
) -> list[Alignment]:
    """Batch full alignments. Honors ``p.affine`` (see score_alignments)."""
    if p.affine:
        from versalignlib_tpu.ops import gotoh

        return gotoh.compute_alignments_affine(algorithm, reads, refs, p, tie)
    fn = sw_align if algorithm == Algorithm.SMITH_WATERMAN else nw_align
    return [fn(r, f, p, tie) for r, f in zip(reads, refs)]
