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


def test_banded_align_full_band_equals_dense(rng, default_params):
    from versalignlib_tpu.ops.banded import banded_align_batch
    from versalignlib_tpu.types import TieBreak

    reads = random_codes(rng, 6, 20)
    refs = random_codes(rng, 6, 20)
    got = banded_align_batch(reads, refs, default_params,
                             Algorithm.SMITH_WATERMAN, band=20, tile=10,
                             interpret=True)
    want = oracle.compute_alignments(Algorithm.SMITH_WATERMAN, reads, refs,
                                     default_params, TieBreak.DIAG_UP_LEFT)
    for g, w in zip(got, want):
        assert (g.read, g.ref, g.score, g.cigar) == (w.read, w.ref, w.score, w.cigar)


def test_banded_align_nw_score_consistency(rng, default_params):
    from versalignlib_tpu.ops.banded import banded_align_batch, banded_score_batch

    reads = random_codes(rng, 5, 30, padded=True)
    refs = random_codes(rng, 5, 36, padded=True)
    alns = banded_align_batch(reads, refs, default_params,
                              Algorithm.NEEDLEMAN_WUNSCH, band=12, tile=6,
                              interpret=True)
    scores = banded_score_batch(reads, refs, default_params,
                                Algorithm.NEEDLEMAN_WUNSCH, band=12, tile=6,
                                interpret=True)
    assert [a.score for a in alns] == [int(s) for s in scores]


def test_banded_align_narrow_band_snp(default_params):
    # Nearly identical 60bp pair, one substitution: 60M through a 16-band.
    from versalignlib_tpu.ops.banded import banded_align_batch

    rng = np.random.default_rng(13)
    seq = rng.integers(1, 5, size=(3, 60)).astype(np.uint8)
    mut = seq.copy()
    mut[:, 30] = (mut[:, 30] % 4) + 1
    alns = banded_align_batch(seq, mut, default_params,
                              Algorithm.SMITH_WATERMAN, band=16, tile=10,
                              interpret=True)
    for a in alns:
        assert a.cigar == "60M"
        assert a.score in (117, 120)  # one mismatch (or silent same-base "mutation")


def test_banded_affine_scores(rng):
    from versalignlib_tpu.ops import gotoh
    from versalignlib_tpu.ops.banded import band_offsets

    p = AlignmentParameters(score_match=2, score_mismatch=-1, score_gap_read=-1,
                            score_gap_ref=-1, gap_open_read=-4, gap_open_ref=-4)
    reads = random_codes(rng, 5, 32, padded=True)
    refs = random_codes(rng, 5, 40, padded=True)
    band, tile = 16, 8
    for algorithm in (Algorithm.SMITH_WATERMAN, Algorithm.NEEDLEMAN_WUNSCH):
        got = banded_score_batch(reads, refs, p, algorithm, band=band,
                                 tile=tile, interpret=True)
        want = _oracle_batch(reads, refs, p, band, tile, algorithm)
        np.testing.assert_array_equal(got, want)
    # full band degenerates to the dense Gotoh scores
    got = banded_score_batch(reads, refs, p, Algorithm.SMITH_WATERMAN,
                             band=40, tile=8, interpret=True)
    want = gotoh.score_alignments_affine(Algorithm.SMITH_WATERMAN, reads, refs, p)
    np.testing.assert_array_equal(got, want)


def test_banded_align_steep_band(rng, default_params):
    # n >> m: per-row band steps d > 1 exercise the shifted-band traceback.
    from versalignlib_tpu.ops.banded import banded_align_batch, banded_score_batch

    reads = random_codes(rng, 4, 20)
    refs = random_codes(rng, 4, 70)
    alns = banded_align_batch(reads, refs, default_params,
                              Algorithm.SMITH_WATERMAN, band=16, tile=5,
                              interpret=True)
    scores = banded_score_batch(reads, refs, default_params,
                                Algorithm.SMITH_WATERMAN, band=16, tile=5,
                                interpret=True)
    assert [a.score for a in alns] == [int(s) for s in scores]
    # Walked path must replay the score exactly (banded SW: path sum).
    for a, r, f in zip(alns, reads, refs):
        cost = 0
        for rc, fc in zip(a.read, a.ref):
            if rc == "-" or fc == "-":
                cost += -3
            else:
                cost += 2 if rc == fc else -1
        assert cost == a.score, (a, cost)


def test_banded_align_rejects_affine(rng):
    from versalignlib_tpu.ops.banded import banded_align_batch

    p = AlignmentParameters(score_match=2, score_mismatch=-1, score_gap_read=-1,
                            score_gap_ref=-1, gap_open_read=-4, gap_open_ref=-4)
    reads = random_codes(rng, 2, 10)
    refs = random_codes(rng, 2, 10)
    with pytest.raises(NotImplementedError):
        banded_align_batch(reads, refs, p, Algorithm.SMITH_WATERMAN, band=10,
                           tile=5, interpret=True)
