"""Pallas interpair score kernel vs oracle (interpreter mode on CPU).

Compiled-mode equivalence on real TPU hardware is exercised by bench.py and
scripts/tpu_check.py; these tests pin the kernel's semantics portably.
"""

import numpy as np
import pytest

from tests.conftest import random_codes
from versalignlib_tpu.ops import oracle
from versalignlib_tpu.ops.pallas_score import PallasScorer
from versalignlib_tpu.params import AlignmentParameters
from versalignlib_tpu.types import Algorithm

PARAM_SETS = [
    AlignmentParameters(),
    AlignmentParameters(score_match=3, score_mismatch=-2, score_gap_read=-1, score_gap_ref=-2),
]


@pytest.fixture(scope="module")
def scorer():
    return PallasScorer(interpret=True)


@pytest.mark.parametrize("p", PARAM_SETS)
@pytest.mark.parametrize("algorithm", [Algorithm.SMITH_WATERMAN, Algorithm.NEEDLEMAN_WUNSCH])
def test_scores_match_oracle(rng, scorer, p, algorithm):
    reads = random_codes(rng, 30, 19, padded=True, n_prob=0.1)
    refs = random_codes(rng, 30, 26, padded=True, n_prob=0.1)
    got = scorer(reads, refs, p, algorithm)
    want = oracle.score_alignments(algorithm, reads, refs, p)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n", [7, 9, 12, 16])  # exercise unroll 1/2/4/8
def test_unroll_factors(rng, scorer, default_params, n):
    reads = random_codes(rng, 10, 11, padded=True)
    refs = random_codes(rng, 10, n, padded=True)
    for algorithm in (Algorithm.SMITH_WATERMAN, Algorithm.NEEDLEMAN_WUNSCH):
        got = scorer(reads, refs, default_params, algorithm)
        want = oracle.score_alignments(algorithm, reads, refs, default_params)
        np.testing.assert_array_equal(got, want)


def test_all_invalid(scorer, default_params):
    reads = np.zeros((5, 8), dtype=np.uint8)
    refs = np.zeros((5, 8), dtype=np.uint8)
    np.testing.assert_array_equal(
        scorer(reads, refs, default_params, Algorithm.SMITH_WATERMAN), np.zeros(5)
    )


def test_backend_adapter(rng, default_params):
    from versalignlib_tpu.ops.pallas_backend import PallasBackend

    backend = PallasBackend(interpret=True)
    reads = random_codes(rng, 8, 10)
    refs = random_codes(rng, 8, 10)
    got = backend.score_alignments(Algorithm.SMITH_WATERMAN, reads, refs, default_params)
    want = oracle.score_alignments(Algorithm.SMITH_WATERMAN, reads, refs, default_params)
    np.testing.assert_array_equal(got, want)
