"""XLA backend vs numpy oracle (which is itself golden-gated)."""

import numpy as np
import pytest

from tests.conftest import random_codes
from versalignlib_tpu.ops import oracle
from versalignlib_tpu.ops.xla import XLABackend
from versalignlib_tpu.params import AlignmentParameters
from versalignlib_tpu.types import Algorithm, TieBreak

PARAM_SETS = [
    AlignmentParameters(),
    AlignmentParameters(score_match=3, score_mismatch=-2, score_gap_read=-1, score_gap_ref=-2),
]


@pytest.fixture(scope="module")
def backend():
    return XLABackend()


@pytest.mark.parametrize("p", PARAM_SETS)
@pytest.mark.parametrize("algorithm", [Algorithm.SMITH_WATERMAN, Algorithm.NEEDLEMAN_WUNSCH])
@pytest.mark.parametrize("shape", [(24, 16, 16), (10, 33, 17), (7, 5, 40)])
def test_scores_match_oracle(rng, backend, p, algorithm, shape):
    n, rlen, flen = shape
    reads = random_codes(rng, n, rlen, padded=True, n_prob=0.1)
    refs = random_codes(rng, n, flen, padded=True, n_prob=0.1)
    got = backend.score_alignments(algorithm, reads, refs, p)
    want = oracle.score_alignments(algorithm, reads, refs, p)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p", PARAM_SETS)
@pytest.mark.parametrize("algorithm", [Algorithm.SMITH_WATERMAN, Algorithm.NEEDLEMAN_WUNSCH])
@pytest.mark.parametrize("tie", [TieBreak.DIAG_UP_LEFT, TieBreak.DIAG_LEFT_UP])
def test_alignments_match_oracle(rng, backend, p, algorithm, tie):
    reads = random_codes(rng, 24, 18, padded=True, n_prob=0.08)
    refs = random_codes(rng, 24, 23, padded=True, n_prob=0.08)
    got = backend.compute_alignments(algorithm, reads, refs, p, tie)
    want = oracle.compute_alignments(algorithm, reads, refs, p, tie)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g.read == w.read, (i, g, w)
        assert g.ref == w.ref, (i, g, w)
        assert g.score == w.score, (i, g, w)
        assert g.cigar == w.cigar, (i, g, w)
        assert (g.read_start, g.read_end, g.ref_start, g.ref_end) == (
            w.read_start, w.read_end, w.ref_start, w.ref_end,
        ), (i, g, w)
        assert (g.buffer_start, g.buffer_end) == (w.buffer_start, w.buffer_end)


def test_align_chunking(rng, backend, default_params):
    # Batch larger than align_chunk exercises the chunked path.
    backend.align_chunk = 8
    try:
        reads = random_codes(rng, 20, 12)
        refs = random_codes(rng, 20, 12)
        got = backend.compute_alignments(
            Algorithm.SMITH_WATERMAN, reads, refs, default_params, TieBreak.DIAG_UP_LEFT
        )
        want = oracle.compute_alignments(
            Algorithm.SMITH_WATERMAN, reads, refs, default_params
        )
        assert [g.cigar for g in got] == [w.cigar for w in want]
        assert [g.score for g in got] == [w.score for w in want]
    finally:
        backend.align_chunk = 256


def test_empty_like_inputs(backend, default_params):
    # All-padding pair batch: everything scores 0, empty alignments.
    reads = np.zeros((4, 8), dtype=np.uint8)
    refs = np.zeros((4, 8), dtype=np.uint8)
    scores = backend.score_alignments(Algorithm.SMITH_WATERMAN, reads, refs, default_params)
    np.testing.assert_array_equal(scores, np.zeros(4, np.int32))
    alns = backend.compute_alignments(
        Algorithm.SMITH_WATERMAN, reads, refs, default_params, TieBreak.DIAG_UP_LEFT
    )
    assert all(a.read == "" for a in alns)
