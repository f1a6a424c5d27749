"""Oracle vs brute-force triple-loop on randomized + edge-case inputs."""

import numpy as np
import pytest

from tests import brute
from tests.conftest import random_codes
from versalignlib_tpu.alphabet import decode, encode, pad_and_encode
from versalignlib_tpu.ops import oracle
from versalignlib_tpu.params import AlignmentParameters
from versalignlib_tpu.types import Algorithm, TieBreak

PARAM_SETS = [
    AlignmentParameters(),
    AlignmentParameters(score_match=3, score_mismatch=-2, score_gap_read=-1, score_gap_ref=-2),
    AlignmentParameters(score_match=1, score_mismatch=-4, score_gap_read=-5, score_gap_ref=-1),
]


def _random_pairs(rng, n, rlen, flen, **kw):
    return random_codes(rng, n, rlen, **kw), random_codes(rng, n, flen, **kw)


@pytest.mark.parametrize("p", PARAM_SETS)
@pytest.mark.parametrize("shape", [(8, 12), (16, 16), (1, 9), (9, 1), (13, 7)])
def test_scores_match_brute(rng, p, shape):
    reads, refs = _random_pairs(rng, 20, shape[0], shape[1], padded=True, n_prob=0.1)
    for read, ref in zip(reads, refs):
        assert oracle.sw_score(read, ref, p) == brute.brute_sw_score(read, ref, p)
        assert oracle.nw_score(read, ref, p) == brute.brute_nw_score(read, ref, p)


@pytest.mark.parametrize("p", PARAM_SETS)
@pytest.mark.parametrize("tie", [TieBreak.DIAG_UP_LEFT, TieBreak.DIAG_LEFT_UP])
def test_sw_align_matches_brute(rng, p, tie):
    reads, refs = _random_pairs(rng, 25, 14, 11, padded=True, n_prob=0.05)
    for read, ref in zip(reads, refs):
        h, ptr, bi, bj = brute.brute_sw_pointers(read, ref, p, tie)
        rs, fs = decode(read), decode(ref)
        # decode strips padding; rebuild full-length strings for traceback emit
        rs_full = rs + "\0" * (len(read) - len(rs))
        fs_full = fs + "\0" * (len(ref) - len(fs))
        rg, fg, rp_end, fp_end = brute.brute_traceback(rs_full, fs_full, ptr, bi, bj)
        got = oracle.sw_align(read, ref, p, tie)
        assert got.read == rg
        assert got.ref == fg
        assert got.score == int(h[bi + 1][bj + 1])
        assert got.read_start == rp_end + 1
        assert got.read_end == bi + 1
        assert got.ref_start == fp_end + 1
        assert got.ref_end == bj + 1


@pytest.mark.parametrize("p", PARAM_SETS)
@pytest.mark.parametrize("tie", [TieBreak.DIAG_UP_LEFT, TieBreak.DIAG_LEFT_UP])
def test_nw_align_matches_brute(rng, p, tie):
    reads, refs = _random_pairs(rng, 25, 12, 15, padded=True, n_prob=0.05)
    for read, ref in zip(reads, refs):
        h, ptr, bi, bj = brute.brute_nw_pointers(read, ref, p, tie)
        rs, fs = decode(read), decode(ref)
        rs_full = rs + "\0" * (len(read) - len(rs))
        fs_full = fs + "\0" * (len(ref) - len(fs))
        rg, fg, rp_end, fp_end = brute.brute_traceback(rs_full, fs_full, ptr, bi, bj)
        got = oracle.nw_align(read, ref, p, tie)
        assert got.read == rg
        assert got.ref == fg
        assert got.read_start == rp_end + 1
        assert got.ref_start == fp_end + 1


def test_known_alignment():
    # Hand-checkable: identical sequences align end to end with all matches.
    p = AlignmentParameters()
    read = encode("ACGTACGT")
    ref = encode("ACGTACGT")
    a = oracle.sw_align(read, ref, p)
    assert a.score == 16
    assert a.read == "ACGTACGT"
    assert a.ref == "ACGTACGT"
    assert a.cigar == "8M"
    assert (a.read_start, a.read_end) == (0, 8)


def test_known_mismatch_and_gap():
    p = AlignmentParameters()
    # SW: best local alignment of TTACGT vs ACGT is the ACGT block.
    a = oracle.sw_align(encode("TTACGT"), encode("ACGT"), p)
    assert a.score == 8
    assert a.read == "ACGT"
    assert a.cigar == "4M"
    # A single gap: read has an extra base.
    b = oracle.sw_align(encode("ACGTTACG"), encode("ACGTACG"), p)
    assert b.score == 2 * 7 - 3  # 7 matches, one 1-base gap
    # DIAG beats UP on ties, so the gap lands leftmost of the run of Ts.
    assert b.cigar == "3M1I4M"


def test_padding_scores_zero(default_params):
    # All-padding and all-N pairs score 0 in both algorithms.
    z = np.zeros(8, dtype=np.uint8)
    n5 = np.full(8, 5, dtype=np.uint8)
    acgt = encode("ACGTACGT")
    for other in (z, n5):
        assert oracle.sw_score(acgt, other, default_params) == 0
        assert oracle.sw_score(other, acgt, default_params) == 0
        assert oracle.nw_score(acgt, other, default_params) == 0


def test_nw_overlap_free_end_gaps(default_params):
    # Overlap score: suffix of read matches prefix of ref with no penalty for
    # the unaligned flanks.
    read = encode("TTTTACGT")
    ref = encode("ACGTCCCC")
    assert oracle.nw_score(read, ref, default_params) == 8


def test_nw_align_padding_robust(default_params):
    # NW traceback must end at the last valid read row even with padding.
    read = pad_and_encode(["ACGT"], 8)[0]  # ACGT + 4 pad bytes
    ref = pad_and_encode(["ACGT"], 8)[0]
    a = oracle.nw_align(read, ref, default_params)
    assert a.read == "ACGT"
    assert a.ref == "ACGT"
    assert a.cigar == "4M"


def test_batch_api(rng, default_params):
    reads, refs = _random_pairs(rng, 10, 10, 12)
    scores = oracle.score_alignments(Algorithm.SMITH_WATERMAN, reads, refs, default_params)
    assert scores.shape == (10,)
    alns = oracle.compute_alignments(Algorithm.NEEDLEMAN_WUNSCH, reads, refs, default_params)
    assert len(alns) == 10


def test_lowercase_equivalence(default_params):
    a = oracle.sw_score(encode("acgtACGT"), encode("AcGtAcGt"), default_params)
    b = oracle.sw_score(encode("ACGTACGT"), encode("ACGTACGT"), default_params)
    assert a == b == 16
