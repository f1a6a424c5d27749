"""Banded long-pair scoring vs banded oracle + dense equivalence."""

import numpy as np
import pytest

from tests.conftest import random_codes
from versalignlib_tpu.ops import oracle
from versalignlib_tpu.ops.banded import band_offsets, banded_score_batch, banded_score_oracle
from versalignlib_tpu.params import AlignmentParameters
from versalignlib_tpu.types import Algorithm


def _oracle_batch(reads, refs, p, band, tile, algorithm):
    m = reads.shape[1]
    n = refs.shape[1]
    m_pad = -(-m // tile) * tile
    offs = band_offsets(m_pad, m, n, band)
    reads_pad = np.pad(reads, ((0, 0), (0, m_pad - m)))
    return np.array(
        [banded_score_oracle(r, f, p, band, algorithm, offs)
         for r, f in zip(reads_pad, refs)],
        dtype=np.int32,
    )


@pytest.mark.parametrize("algorithm", [Algorithm.SMITH_WATERMAN, Algorithm.NEEDLEMAN_WUNSCH])
@pytest.mark.parametrize("shape,band,tile", [
    ((6, 40, 56), 16, 8),
    ((5, 64, 32), 24, 16),   # n < m: band clamps to left region
    ((4, 30, 90), 16, 10),   # n >> m: steep band steps (d > 1)
])
def test_banded_matches_oracle(rng, default_params, algorithm, shape, band, tile):
    b, m, n = shape
    reads = random_codes(rng, b, m, padded=True, n_prob=0.05)
    refs = random_codes(rng, b, n, padded=True, n_prob=0.05)
    got = banded_score_batch(reads, refs, default_params, algorithm,
                             band=band, tile=tile, interpret=True)
    want = _oracle_batch(reads, refs, default_params, min(band, n), tile, algorithm)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("algorithm", [Algorithm.SMITH_WATERMAN, Algorithm.NEEDLEMAN_WUNSCH])
def test_full_band_equals_dense(rng, default_params, algorithm):
    reads = random_codes(rng, 8, 24, padded=True)
    refs = random_codes(rng, 8, 24, padded=True)
    got = banded_score_batch(reads, refs, default_params, algorithm,
                             band=24, tile=8, interpret=True)
    want = oracle.score_alignments(algorithm, reads, refs, default_params)
    np.testing.assert_array_equal(got, want)


def test_wide_band_finds_distant_hit(default_params):
    # A hit far off-diagonal is invisible to a narrow band but found by a
    # wide one — the expected approximation tradeoff.
    from versalignlib_tpu.alphabet import pad_and_encode

    read = "ACGTACGTAC" + "T" * 50
    ref = "G" * 50 + "ACGTACGTAC"
    reads = pad_and_encode([read])
    refs = pad_and_encode([ref])
    narrow = banded_score_batch(reads, refs, default_params,
                                Algorithm.SMITH_WATERMAN, band=8, tile=8,
                                interpret=True)
    wide = banded_score_batch(reads, refs, default_params,
                              Algorithm.SMITH_WATERMAN, band=60, tile=8,
                              interpret=True)
    assert wide[0] == 20
    assert narrow[0] < wide[0]
