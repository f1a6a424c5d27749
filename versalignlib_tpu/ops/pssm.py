"""Position-specific scoring (PSSM / profile) search — ADDITIVE capability.

The reference library scores every read position with one substitution rule
(match/mismatch tables, /root/reference/src/Kernels/default/DefaultKernel.h:83-96);
a PSSM generalizes that to a per-position score row: aligning profile
position ``i`` against symbol code ``s`` scores ``P[i, s]`` (the standard
motif/domain-scanning model behind PSI-BLAST / MEME / HMM match states).
Gap costs stay the engine's linear or affine (Gotoh) model, and both
algorithm variants keep their exact reference semantics (SW clamp/global
max; the NW overlap score's free leading/trailing gaps,
DefaultKernel.cpp:177,189-191).

Semantically a PSSM is "matrix mode with a position-indexed read": a
synthetic read ``[1..m]`` scored through a rectangular (m+1, S) matrix.
The oracle is therefore the established numpy fills with a precomputed
substitution plane (oracle._fill_matrix / gotoh._fill_affine ``sub=``).

TPU-first design: the profile rides the one-vs-many search kernel
(ops/pallas_search.py) as the SMEM query side — each profile row's S
scores are bit-packed into ``W = ceil(S / fields_per_word)`` int32 words of
biased fields (the same field scheme make_sub_fn uses for constant
matrices, but here the tables are RUNTIME data). A cell pays W scalar-
broadcast selects + one lane-wise variable-shift extract, the pool side
keeps 1024 candidates per (8, 128) register tile, and scores stream out
with no cross-product materialization.

Score conventions: ``P[i, 0]`` must be 0 (code 0 is the padding sentinel,
pad scores 0 exactly like the reference's '\\0' fill-up); codes outside
the table score 0 (the reference's invalid-base rule).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from versalignlib_tpu.params import AlignmentParameters
from versalignlib_tpu.types import Algorithm


class PssmMeta(NamedTuple):
    """Static (hashable) packing descriptor for a bit-packed profile."""

    n_symbols: int    # S: table width (codes >= S score 0)
    words: int        # W: int32 words per profile row
    field_bits: int   # 4 or 8
    bias: int         # stored field = score + bias (fields non-negative)


def validate_pssm(P) -> np.ndarray:
    P = np.asarray(P, dtype=np.int32)
    if P.ndim != 2 or P.shape[1] < 2:
        raise ValueError(f"PSSM must be (m, S >= 2), got {P.shape}")
    if np.any(P[:, 0] != 0):
        raise ValueError("PSSM column 0 must be zero (code 0 is padding)")
    return P


def pack_pssms(Ps) -> tuple[np.ndarray, PssmMeta]:
    """Jointly pack K equal-shape profiles -> ((K, m, W) words, shared
    PssmMeta) for one multi-profile kernel dispatch (the search kernel's
    query axis streams profiles through SMEM)."""
    Ps = [validate_pssm(P) for P in Ps]
    if len({P.shape for P in Ps}) != 1:
        raise ValueError("multi-profile packing requires equal (m, S) shapes")
    stack = np.stack(Ps)
    lo = int(min(0, stack.min()))
    hi = int(max(0, stack.max()))
    packed = [pack_pssm(P, lo=lo, hi=hi) for P in Ps]
    return np.stack([w for w, _ in packed]), packed[0][1]


def pack_pssm(P, lo: int | None = None,
              hi: int | None = None) -> tuple[np.ndarray, PssmMeta]:
    """(m, S) int score table -> ((m, W) int32 packed words, PssmMeta).

    Field width is the narrowest power-of-2 the entry SPAN allows (4 bits
    for span <= 15, 8 for span <= 255); wider tables are rejected — rescale
    the profile (PSSM log-odds at sensible scales fit 8 bits with room).
    ``lo``/``hi`` widen the assumed entry range (joint multi-profile packs).
    """
    P = validate_pssm(P)
    m, s = P.shape
    lo = int(min(0, P.min())) if lo is None else lo
    hi = int(max(0, P.max())) if hi is None else hi
    span = hi - lo
    if span <= 15:
        fw = 4
    elif span <= 255:
        fw = 8
    else:
        raise ValueError(
            f"PSSM entry span {span} exceeds 255; rescale the profile")
    bias = -lo
    fpw = 32 // fw
    fmask = (1 << fw) - 1
    w_cnt = -(-s // fpw)
    words = np.zeros((m, w_cnt), dtype=np.int64)
    for w in range(w_cnt):
        for k in range(fpw):
            sym = w * fpw + k
            field = (P[:, sym].astype(np.int64) + bias) if sym < s else bias
            words[:, w] |= (field & fmask) << (fw * k)
    words = np.where(words >= (1 << 31), words - (1 << 32), words)
    return words.astype(np.int32), PssmMeta(s, w_cnt, fw, bias)


def make_pssm_sub_fn(meta: PssmMeta):
    """(col_prep, sub_of) for in-kernel profile scoring.

    ``sub_of(row_words, cctx)``: row_words are the W packed SMEM scalars of
    one profile row; cctx comes from ``col_prep(ref_col)`` on the lane
    vector. Mirrors make_sub_fn's bit-packed matrix path with runtime
    tables.
    """
    fw, w_cnt, bias = meta.field_bits, meta.words, meta.bias
    fpw = 32 // fw
    fmask = (1 << fw) - 1
    bw = 0
    for k in range(fpw):
        bw |= (bias & fmask) << (fw * k)
    bias_word = bw - (1 << 32) if bw >= (1 << 31) else bw
    idx_shift = fpw.bit_length() - 1
    sh_shift = fw.bit_length() - 1

    def col_prep(ref_col):
        masks = [(ref_col >> idx_shift) == w for w in range(w_cnt)]
        return masks, (ref_col & (fpw - 1)) << sh_shift

    def sub_of(row_words, cctx):
        masks, shift = cctx
        # Codes >= W*fpw select no word and fall through to pure bias
        # (score 0); codes in [S, W*fpw) hit bias fields packed at build
        # time — the oracle's "outside the table scores 0" rule exactly.
        word = jnp.full_like(shift, jnp.int32(bias_word))
        for w in range(w_cnt):
            word = jnp.where(masks[w], row_words[w], word)
        return ((word >> shift) & fmask) - bias

    return col_prep, sub_of


# ---------------------------------------------------------------------------
# Oracle (numpy) — the semantic source of truth for profile scoring
# ---------------------------------------------------------------------------

def profile_sub_plane(P: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """(m, n) substitution plane: sub[i, j] = P[i, ref_j] (0 outside)."""
    P = validate_pssm(P)
    ref = np.asarray(ref, dtype=np.int32)
    s = P.shape[1]
    inside = (ref >= 0) & (ref < s)
    codes = np.where(inside, ref, 0)
    return np.where(inside[None, :], P[:, codes], 0).astype(np.int32)


def score_profile_oracle(
    P: np.ndarray,
    refs: np.ndarray,
    params: AlignmentParameters,
    algorithm: Algorithm,
) -> np.ndarray:
    """Batch profile scores vs (R, n) code array — numpy reference.

    Reuses the golden-gated fills with a precomputed sub plane, so SW /
    NW-overlap / affine semantics are identical to sequence scoring.
    """
    from versalignlib_tpu.ops import gotoh, oracle

    P = validate_pssm(P)
    refs = np.asarray(refs, dtype=np.uint8)
    m = P.shape[0]
    dummy_read = np.zeros(m, dtype=np.int32)
    local = Algorithm(algorithm) == Algorithm.SMITH_WATERMAN
    out = np.empty(refs.shape[0], dtype=np.int32)
    for i, ref in enumerate(refs):
        sub = profile_sub_plane(P, ref)
        if params.affine:
            h, _, _ = gotoh._fill_affine(
                dummy_read, ref, params, local=local, col0_penalty=False,
                sub=sub)
        else:
            h = oracle._fill_matrix(
                dummy_read, ref, params, local=local, col0_penalty=False,
                sub=sub)
        if local:
            out[i] = int(h.max())
        else:
            last_col = h[1:, -1].max() if h.shape[0] > 1 else 0
            out[i] = int(max(0, int(last_col), int(h[-1, :].max())))
    return out


def profile_argmax_oracle(
    P: np.ndarray,
    refs: np.ndarray,
    params: AlignmentParameters,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """SW (scores, end_rows, end_cols) per pool entry — numpy reference for
    the device coords fold: first cell attaining the global max in row-major
    order, strict-> scan seeded 0/(0, 0) (DefaultKernel.cpp:252-256)."""
    from versalignlib_tpu.ops import gotoh, oracle

    P = validate_pssm(P)
    refs = np.asarray(refs, dtype=np.uint8)
    m = P.shape[0]
    dummy_read = np.zeros(m, dtype=np.int32)
    nb = refs.shape[0]
    scores = np.zeros(nb, dtype=np.int32)
    rows = np.zeros(nb, dtype=np.int32)
    cols = np.zeros(nb, dtype=np.int32)
    for i, ref in enumerate(refs):
        sub = profile_sub_plane(P, ref)
        if params.affine:
            h, _, _ = gotoh._fill_affine(dummy_read, ref, params, local=True,
                                         col0_penalty=False, sub=sub)
        else:
            h = oracle._fill_matrix(dummy_read, ref, params, local=True,
                                    col0_penalty=False, sub=sub)
        best = int(h.max())
        if best > 0:
            flat = int(np.argmax(h[1:, 1:]))  # row-major first maximum
            rows[i] = flat // ref.size
            cols[i] = flat % ref.size
            scores[i] = best
    return scores, rows, cols


def profile_consensus_text(P: np.ndarray) -> str:
    """Displayable per-position consensus letters for the profile side of an
    alignment (argmax symbol per row; DNA letters for S <= 6 tables, the
    protein alphabet otherwise)."""
    from versalignlib_tpu.alphabet import PROTEIN_ALPHABET

    P = validate_pssm(P)
    s = P.shape[1]
    table = "\0ATCGN" if s <= 6 else ("\0" + PROTEIN_ALPHABET)
    out = []
    for row in P:
        sym = int(np.argmax(row[1:])) + 1
        out.append(table[sym] if sym < len(table) else "X")
    return "".join(out)


def profile_align_oracle(
    P: np.ndarray,
    ref: np.ndarray,
    params: AlignmentParameters,
    end: tuple[int, int] | None = None,
    ref_text: str | None = None,
):
    """Full SW alignment of a profile against one pool entry: gapped
    strings (profile side rendered as consensus letters), CIGAR, and true
    start/end coordinates — the ``compute_alignments`` half of the
    interface (include/AlignmentKernel.h:40-43) for profile queries.

    ``end``: (end_row, end_col) walk start (e.g. from the device coords
    fold); derived from the fill's row-major argmax when omitted. Linear
    params walk oracle._pointers, affine walk gotoh's Gotoh pointers —
    canonical DIAG > UP > LEFT flavor in both.
    """
    from versalignlib_tpu.ops import gotoh, oracle

    P = validate_pssm(P)
    ref = np.asarray(ref, dtype=np.uint8)
    m = P.shape[0]
    dummy_read = np.zeros(m, dtype=np.int32)
    sub = profile_sub_plane(P, ref)
    if params.affine:
        h, e, f = gotoh._fill_affine(dummy_read, ref, params, local=True,
                                     col0_penalty=False, sub=sub)
    else:
        h = oracle._fill_matrix(dummy_read, ref, params, local=True,
                                col0_penalty=False, sub=sub)
    if end is None:
        best = int(h.max())
        if best <= 0:
            end = (0, 0)
        else:
            flat = int(np.argmax(h[1:, 1:]))
            end = (flat // ref.size, flat % ref.size)
    from versalignlib_tpu.types import TieBreak

    score = int(h[end[0] + 1, end[1] + 1])
    consensus = profile_consensus_text(P)
    if params.affine:
        ptr = gotoh._affine_pointers(h, e, f, sub, params, local=True)
        return gotoh._affine_traceback(dummy_read, ref, ptr, end[0], end[1],
                                       score, consensus, ref_text)
    ptr = oracle._pointers(h, sub, None, params, local=True,
                           tie=TieBreak.DIAG_UP_LEFT)
    return oracle._traceback(dummy_read, ref, ptr, end[0], end[1], score,
                             consensus, ref_text)


# ---------------------------------------------------------------------------
# Device path
# ---------------------------------------------------------------------------

def pssm_scores_device(
    words,
    meta: PssmMeta,
    pool,
    params: AlignmentParameters,
    algorithm: Algorithm,
    interpret: bool = False,
    with_coords: bool = False,
):
    """(m, W) packed words x (R, n) pool codes -> (R,) int32 scores; a
    (K, m, W) stack of jointly-packed profiles (pack_pssms) -> (K, R).

    One Pallas dispatch either way: profiles stream through SMEM along the
    kernel's query axis while the big lane block stays resident, 1024 pool
    sequences per register tile (see module docstring).

    ``with_coords`` (SW only): returns (scores, end_rows, end_cols) — the
    argmax DP cell per (profile, entry) from the search kernel's device
    fold (row-major strict-first-win, the reference SW end rule); 0-based
    profile position / pool column of the hit's last aligned pair.
    """
    from versalignlib_tpu.ops.pallas_search import (_pack_lanes,
                                                    _search_blocks)
    from versalignlib_tpu.ops.pallas_score import BLOCK_PAIRS

    words = jnp.asarray(words, jnp.int32)
    multi = words.ndim == 3
    k = words.shape[0] if multi else 1
    m = words.shape[1] if multi else words.shape[0]
    pool = jnp.asarray(pool)
    r, n = pool.shape
    query_b = words.reshape(k, 1, m * meta.words)
    lanes_b = _pack_lanes(pool, n)
    out = _search_blocks(query_b, lanes_b, params, Algorithm(algorithm),
                         True, interpret, pssm_meta=meta,
                         with_coords=with_coords)
    if with_coords:
        out, aux = out
    g = out.shape[0]
    # (G, K, 8, 128) -> (K, G*1024) -> trim lane padding.
    scores = jnp.transpose(out, (1, 0, 2, 3)).reshape(k, g * BLOCK_PAIRS)
    if with_coords:
        coords = jnp.transpose(aux, (1, 2, 0, 3, 4)).reshape(
            k, 2, g * BLOCK_PAIRS)
        if multi:
            return scores[:, :r], coords[:, 0, :r], coords[:, 1, :r]
        return scores[0, :r], coords[0, 0, :r], coords[0, 1, :r]
    if multi:
        return scores[:, :r]
    return scores[0, :r]


def calibrate_profile(
    P: np.ndarray,
    params: AlignmentParameters | None = None,
    n: int = 128,
    samples: int = 512,
    seed: int = 0,
    backend: str = "auto",
):
    """Gumbel calibration for PROFILE scores vs random sequences — E-values
    for profile_search hits (``cal.evalue(score, P.shape[0], db_len)``).

    Scores ``samples`` random uniform sequences of length ``n`` through the
    profile (uniform ACGT for DNA-width tables, uniform over codes
    1..S-1 otherwise) and fits the extreme-value law with
    :func:`versalignlib_tpu.stats.calibrate_scores` — the same
    simulation-in-miniature approach the pairwise ``stats.calibrate``
    uses, with the profile as the fixed query side.
    """
    from versalignlib_tpu.params import DEFAULT_PARAMETERS
    from versalignlib_tpu.stats import calibrate_scores

    params = DEFAULT_PARAMETERS if params is None else params
    P = validate_pssm(P)
    s = P.shape[1]
    hi_code = 5 if s == 6 else s  # DNA tables: uniform ACGT (skip N)
    rng = np.random.default_rng(seed)
    pool = rng.integers(1, hi_code, size=(samples, n)).astype(np.uint8)
    if backend == "oracle":
        scores = score_profile_oracle(P, pool, params,
                                      Algorithm.SMITH_WATERMAN)
    else:
        from versalignlib_tpu.ops.pallas_score import _is_tpu

        words, meta = pack_pssm(P)
        scores = np.asarray(pssm_scores_device(
            words, meta, pool, params, Algorithm.SMITH_WATERMAN,
            interpret=not _is_tpu()))
    return calibrate_scores(scores, P.shape[0], n, samples=samples)


# ---------------------------------------------------------------------------
# Profile construction
# ---------------------------------------------------------------------------

def pssm_from_sequences(
    seqs: np.ndarray,
    n_symbols: int = 6,
    pseudocount: float = 1.0,
    scale: float = 2.0,
    background: np.ndarray | None = None,
) -> np.ndarray:
    """Log-odds PSSM from aligned equal-length sequences ((B, m) codes).

    Counts each valid symbol (codes 1..n_symbols-1) per column, adds the
    pseudocount, and scores ``round(scale * log2(freq / background))``.
    Background defaults to uniform over codes 1..4 (the DNA alphabet,
    alphabet.py:9-16); column 0 (padding) is fixed at 0.
    """
    seqs = np.asarray(seqs, dtype=np.int32)
    if seqs.ndim != 2:
        raise ValueError("seqs must be (B, m) code array")
    b, m = seqs.shape
    s = n_symbols
    counts = np.zeros((m, s), dtype=np.float64)
    for sym in range(1, s):
        counts[:, sym] = (seqs == sym).sum(axis=0)
    if background is None:
        background = np.zeros(s)
        background[1:5] = 0.25
    background = np.asarray(background, dtype=np.float64)
    P = np.zeros((m, s), dtype=np.int32)
    valid_total = counts[:, 1:].sum(axis=1) + pseudocount * (s - 1)
    for sym in range(1, s):
        if background[sym] <= 0:
            continue  # symbols with no background stay 0 (neutral)
        freq = (counts[:, sym] + pseudocount) / valid_total
        P[:, sym] = np.round(scale * np.log2(freq / background[sym]))
    return P


class ProfileHit(NamedTuple):
    """One reported profile hit: WHERE the motif sits, not just how well.

    ``end_row``/``end_col``: 0-based profile position / pool-entry column of
    the hit's last aligned pair (the SW argmax cell, reference end rule).
    ``alignment`` (opt-in): full traceback — gapped strings (profile side as
    consensus letters), CIGAR, true start coordinates. ``evalue``/
    ``bitscore`` (opt-in): Gumbel statistics from a profile calibration.
    """

    index: int
    score: int
    end_row: int
    end_col: int
    alignment: object = None   # types.Alignment when requested
    evalue: float | None = None
    bitscore: float | None = None


def profile_search(
    P: np.ndarray,
    pool,
    params: AlignmentParameters = None,
    algorithm: Algorithm = Algorithm.SMITH_WATERMAN,
    k: int = 10,
    backend: str = "auto",
    chunk: int = 1 << 17,
    hits: bool = False,
    alignments: bool = False,
    calibration=None,
    db_len: int | None = None,
):
    """Top-k pool entries for a profile: (scores, indices), score-sorted
    (ties keep the lower index, matching lax.top_k / the search paths).

    ``P``: one (m, S) table, or a LIST of equal-shape tables — multi-profile
    mode packs them jointly and scores every profile in ONE kernel dispatch
    per pool chunk (the pool block stays resident while profiles stream
    through SMEM), returning a list of (scores, indices).

    ``pool``: (R, n) uint8 code array or list of sequence strings
    (padded + encoded with the reference rules). ``backend``: "pallas"
    (compiled on TPU, interpret elsewhere), "oracle", or "auto".
    ``chunk``: pool entries per device round (bounds the lane block's HBM
    footprint to ~chunk*n int32 — the reference's memory-driven batching,
    OpenCLKernel.cpp:517-568; genome-scale pools stream through).

    ``hits=True`` (SW only) returns list[ProfileHit] instead — hit
    coordinates ride the search kernel's device argmax fold (zero extra
    host passes over the pool); ``alignments=True`` adds the full traceback
    per reported hit via :func:`profile_align_oracle` (host-side, k tiny
    fills — the same division of labor as the pairwise pipeline's host
    decode); ``calibration`` (a GumbelCalibration, e.g. from
    :func:`calibrate_profile`) adds bitscore/E-value columns with ``db_len``
    total database residues (default: pool cells).
    """
    from versalignlib_tpu.params import DEFAULT_PARAMETERS

    params = DEFAULT_PARAMETERS if params is None else params
    multi = isinstance(P, (list, tuple))
    if not isinstance(pool, np.ndarray):
        from versalignlib_tpu.alphabet import pad_and_encode

        pool = pad_and_encode(list(pool))
    want_coords = hits or alignments
    if want_coords and Algorithm(algorithm) != Algorithm.SMITH_WATERMAN:
        raise ValueError("profile hits with coordinates are SW-only "
                         "(NW overlap end cells are not a single argmax)")
    coord_rows = None
    if backend == "oracle":
        Ps = [validate_pssm(p0) for p0 in P] if multi else [validate_pssm(P)]
        if want_coords:
            trips = [profile_argmax_oracle(p0, pool, params) for p0 in Ps]
            score_rows = [t[0] for t in trips]
            coord_rows = [(t[1], t[2]) for t in trips]
        else:
            score_rows = [score_profile_oracle(p0, pool, params, algorithm)
                          for p0 in Ps]
    else:
        from versalignlib_tpu.ops.pallas_score import _is_tpu

        interpret = not _is_tpu()
        if multi:
            words, meta = pack_pssms(P)
        else:
            words, meta = pack_pssm(P)
        parts = [
            pssm_scores_device(
                words, meta, pool[lo:lo + chunk], params, algorithm,
                interpret, with_coords=want_coords)
            for lo in range(0, pool.shape[0], chunk)
        ]
        if want_coords:
            out = np.concatenate([np.asarray(p[0]) for p in parts], axis=-1)
            rows = np.concatenate([np.asarray(p[1]) for p in parts], axis=-1)
            cols = np.concatenate([np.asarray(p[2]) for p in parts], axis=-1)
            if multi:
                score_rows = list(out)
                coord_rows = [(rows[i], cols[i]) for i in range(len(out))]
            else:
                score_rows = [out]
                coord_rows = [(rows, cols)]
        else:
            out = np.concatenate([np.asarray(p) for p in parts], axis=-1)
            score_rows = list(out) if multi else [out]

    def topk(scores):
        kk = min(k, scores.shape[0])
        # Stable top-k: sort by (-score, index).
        order = np.lexsort((np.arange(scores.shape[0]),
                            -scores.astype(np.int64)))
        top = order[:kk]
        return scores[top].astype(np.int32), top.astype(np.int32)

    if not want_coords:
        if multi:
            return [topk(s) for s in score_rows]
        return topk(score_rows[0])

    Ps = [validate_pssm(p0) for p0 in P] if multi else [validate_pssm(P)]
    if db_len is None:
        db_len = int(pool.size)

    def build_hits(pi):
        scores, idx = topk(score_rows[pi])
        rows, cols = coord_rows[pi]
        out = []
        for s, i in zip(scores, idx):
            er, ec = int(rows[i]), int(cols[i])
            aln = None
            if alignments:
                aln = profile_align_oracle(Ps[pi], pool[i], params,
                                           end=(er, ec))
            ev = bs = None
            if calibration is not None:
                bs = float(calibration.bit_score(int(s)))
                ev = float(calibration.evalue(int(s), Ps[pi].shape[0],
                                              db_len))
            out.append(ProfileHit(int(i), int(s), er, ec, aln, ev, bs))
        return out

    if multi:
        return [build_hits(i) for i in range(len(Ps))]
    return build_hits(0)
