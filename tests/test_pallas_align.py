"""Pallas align kernel (packed pointers + host decode) vs oracle, interpret mode."""

import numpy as np
import pytest

from tests.conftest import random_codes
from versalignlib_tpu.ops import oracle
from versalignlib_tpu.ops.pallas_align import PackedPtr, pallas_align_batch
from versalignlib_tpu.params import AlignmentParameters
from versalignlib_tpu.types import Algorithm, TieBreak


def _check(got, want):
    for i, (g, w) in enumerate(zip(got, want)):
        assert g.read == w.read, (i, g, w)
        assert g.ref == w.ref, (i, g, w)
        assert g.score == w.score, (i, g, w)
        assert g.cigar == w.cigar, (i, g, w)
        assert (g.read_start, g.read_end, g.ref_start, g.ref_end) == (
            w.read_start, w.read_end, w.ref_start, w.ref_end,
        ), (i, g, w)


@pytest.mark.parametrize("algorithm", [Algorithm.SMITH_WATERMAN, Algorithm.NEEDLEMAN_WUNSCH])
@pytest.mark.parametrize("tie", [TieBreak.DIAG_UP_LEFT, TieBreak.DIAG_LEFT_UP])
def test_align_matches_oracle(rng, algorithm, tie, default_params):
    reads = random_codes(rng, 16, 15, padded=True, n_prob=0.08)
    refs = random_codes(rng, 16, 21, padded=True, n_prob=0.08)
    got = pallas_align_batch(reads, refs, default_params, algorithm, tie, interpret=True)
    want = oracle.compute_alignments(algorithm, reads, refs, default_params, tie)
    _check(got, want)


@pytest.mark.parametrize("n", [7, 9, 18, 32])  # pack widths 1/2/4... variants
def test_pack_widths(rng, default_params, n):
    reads = random_codes(rng, 6, 10, padded=True)
    refs = random_codes(rng, 6, n, padded=True)
    got = pallas_align_batch(
        reads, refs, default_params, Algorithm.SMITH_WATERMAN,
        TieBreak.DIAG_UP_LEFT, interpret=True,
    )
    want = oracle.compute_alignments(
        Algorithm.SMITH_WATERMAN, reads, refs, default_params
    )
    _check(got, want)


def test_packed_ptr_roundtrip():
    # PackedPtr decodes 2-bit fields from int32 words.
    codes = np.array([[0, 1, 2, 3, 3, 2, 1, 0]], dtype=np.int64)
    word = 0
    for j, c in enumerate(codes[0]):
        word |= int(c) << (2 * j)
    pp = PackedPtr(np.array([[word]], dtype=np.int32), pack=8, n=8)
    assert [pp[0, j] for j in range(8)] == list(codes[0])


def test_chunked_batches(rng, default_params):
    reads = random_codes(rng, 9, 8)
    refs = random_codes(rng, 9, 8)
    got = pallas_align_batch(
        reads, refs, default_params, Algorithm.NEEDLEMAN_WUNSCH,
        TieBreak.DIAG_UP_LEFT, interpret=True, chunk_pairs=4,
    )
    want = oracle.compute_alignments(
        Algorithm.NEEDLEMAN_WUNSCH, reads, refs, default_params
    )
    _check(got, want)


def test_pallas_affine_align_matches_gotoh(rng):
    from versalignlib_tpu.ops import gotoh
    from versalignlib_tpu.ops.pallas_align import pallas_align_affine_batch

    p = AlignmentParameters(score_match=2, score_mismatch=-1, score_gap_read=-1,
                            score_gap_ref=-1, gap_open_read=-4, gap_open_ref=-4)
    reads = random_codes(rng, 14, 12, padded=True, n_prob=0.05)
    refs = random_codes(rng, 14, 18, padded=True, n_prob=0.05)
    for algorithm in (Algorithm.SMITH_WATERMAN, Algorithm.NEEDLEMAN_WUNSCH):
        got = pallas_align_affine_batch(reads, refs, p, algorithm, interpret=True)
        want = gotoh.compute_alignments_affine(algorithm, reads, refs, p)
        for g, w in zip(got, want):
            assert (g.read, g.ref, g.score, g.cigar) == (w.read, w.ref, w.score, w.cigar)
