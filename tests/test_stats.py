"""Karlin-Altschul / Gumbel statistics for search hits."""

import json
import math

import numpy as np
import pytest

from versalignlib_tpu.params import AlignmentParameters
from versalignlib_tpu.stats import (GumbelCalibration, calibrate, entropy_h,
                                    karlin_lambda)


def test_karlin_lambda_closed_form():
    # match +1 / mismatch -1, uniform DNA: sum = x/4 + 3/(4x) = 1 has the
    # closed-form positive root x = e^lambda = 3.
    p = AlignmentParameters(score_match=1, score_mismatch=-1)
    lam = karlin_lambda(p)
    assert abs(lam - math.log(3)) < 1e-9


def test_karlin_lambda_satisfies_identity():
    for p in (AlignmentParameters(),                        # 2/-1
              AlignmentParameters(score_match=1, score_mismatch=-3),
              AlignmentParameters(score_match=5, score_mismatch=-4)):
        lam = karlin_lambda(p)
        s = np.full((4, 4), float(p.score_mismatch))
        np.fill_diagonal(s, float(p.score_match))
        val = (np.exp(lam * s) / 16.0).sum()
        assert abs(val - 1.0) < 1e-9, p
        assert entropy_h(p) > 0


def test_karlin_lambda_matrix_and_freqs():
    # A custom 3-letter matrix with skewed composition.
    mat = ((0, 0, 0, 0), (0, 2, -2, -2), (0, -2, 2, -2), (0, -2, -2, 2))
    p = AlignmentParameters(score_gap_read=-3, score_gap_ref=-3, matrix=mat)
    lam = karlin_lambda(p, freqs=(0.5, 0.25, 0.25))
    pr = np.array([0.5, 0.25, 0.25])
    s = np.array(mat, dtype=float)[1:, 1:]
    val = (np.outer(pr, pr) * np.exp(lam * s)).sum()
    assert abs(val - 1.0) < 1e-9
    with pytest.raises(ValueError, match="summing to 1"):
        karlin_lambda(p, freqs=(0.9, 0.9, 0.9))


def test_karlin_lambda_invalid_models():
    with pytest.raises(ValueError, match="negative-drift"):
        karlin_lambda(AlignmentParameters(score_match=2, score_mismatch=2))
    with pytest.raises(ValueError, match="negative-drift"):
        # expected = (2 - 3*0.5)/4... match 2 mism -0.5 -> mean > 0
        karlin_lambda(AlignmentParameters(score_match=9, score_mismatch=-1))


def test_calibration_evalues_sane(rng):
    p = AlignmentParameters()
    m = n = 64
    cal = calibrate(p, m=m, n=n, samples=384, seed=3, impl="xla")
    assert cal.lam > 0 and cal.k > 0
    # A perfect 64bp self-hit (raw 128) is overwhelmingly significant.
    assert cal.evalue(2 * m, m, n) < 1e-6
    # At the empirical median of random scores, P ~= 0.5 -> E ~= ln 2.
    from versalignlib_tpu.ops.xla import score_batch
    from versalignlib_tpu.types import Algorithm

    reads = rng.integers(1, 5, size=(256, m)).astype(np.uint8)
    refs = rng.integers(1, 5, size=(256, n)).astype(np.uint8)
    med = float(np.median(np.asarray(
        score_batch(reads, refs, p, Algorithm.SMITH_WATERMAN))))
    e_med = float(cal.evalue(med, m, n))
    assert 0.15 < e_med < 3.0, e_med
    # Bit-score identity: E = m * D * 2^{-S'}.
    raw = 80
    sp = float(cal.bit_score(raw))
    assert np.isclose(cal.evalue(raw, m, 10 * n),
                      m * 10 * n * 2.0 ** (-sp))
    # Ungapped: the empirically fitted lambda lands near the theory value.
    assert abs(cal.lam - karlin_lambda(p)) / karlin_lambda(p) < 0.5
    # p-value in (0, 1], monotone decreasing in score.
    pv = cal.pvalue(np.array([20, 60, 128]), m, n)
    assert np.all(np.diff(pv) < 0) and pv[-1] > 0


def test_calibration_json_roundtrip():
    cal = GumbelCalibration(lam=0.7, k=0.1, m=64, n=64, samples=128)
    assert GumbelCalibration.from_json(cal.to_json()) == cal
    assert json.loads(cal.to_json())["lam"] == 0.7


def test_cli_panel_stats_columns(tmp_path, rng):
    from versalignlib_tpu.cli import main
    from versalignlib_tpu.io.fasta import write_fasta

    bases = np.array(list("ACGT"))
    panel = ["".join(rng.choice(bases, size=48)) for _ in range(3)]
    reads = [panel[1][4:36], "".join(rng.choice(bases, size=32))]
    rf, pf = tmp_path / "r.fa", tmp_path / "p.fa"
    write_fasta(rf, reads)
    write_fasta(pf, panel)
    rc = main(["--reads", str(rf), "--panel", str(pf), "--outdir",
               str(tmp_path), "--backend", "oracle", "--stats",
               "--stats-samples", "96"])
    assert rc == 0
    lines = (tmp_path / "hits_smith_waterman.tsv").read_text().splitlines()
    assert lines[0].split("\t")[-2:] == ["bitscore", "evalue"]
    planted = lines[1].split("\t")
    random_read = lines[2].split("\t")
    # The planted read is significant; the random one is not even close.
    assert float(planted[-1]) < 1e-3
    assert float(planted[-1]) < float(random_read[-1])
    assert float(planted[-2]) > float(random_read[-2])
    # Calibration cache: second run loads (identical columns), file exists.
    cache = tmp_path / "calib.json"
    rc = main(["--reads", str(rf), "--panel", str(pf), "--outdir",
               str(tmp_path), "--backend", "oracle", "--stats",
               "--stats-samples", "96", "--stats-cache", str(cache)])
    assert rc == 0 and cache.is_file()
    first = (tmp_path / "hits_smith_waterman.tsv").read_text()
    rc = main(["--reads", str(rf), "--panel", str(pf), "--outdir",
               str(tmp_path), "--backend", "oracle", "--stats",
               "--stats-cache", str(cache)])
    assert rc == 0
    assert (tmp_path / "hits_smith_waterman.tsv").read_text() == first

# ---------------------------------------------------------------------------
# External-constant gates: the island method must reproduce the PUBLISHED
# Karlin-Altschul constants (NCBI blast_stat.c tables), not merely separate
# planted hits from noise. Precision artifact: scripts/calibrate_stats.py.
# ---------------------------------------------------------------------------

def test_karlin_lambda_blosum62_published():
    """Theory cross-check: BLOSUM62 + Robinson-Robinson background must give
    the published ungapped lambda 0.3176 (Altschul 1991 / blast_stat.c)."""
    from versalignlib_tpu.alphabet import blosum62
    from versalignlib_tpu.stats import ROBINSON_FREQS

    p = AlignmentParameters(score_gap_read=-1, score_gap_ref=-1,
                            matrix=blosum62())
    lam = karlin_lambda(p, freqs=ROBINSON_FREQS)
    assert abs(lam - 0.3176) < 5e-4


def test_gumbel_mle_recovers_parameters(rng):
    from versalignlib_tpu.stats import _gumbel_mle

    mu, beta = 23.0, 4.0
    x = rng.gumbel(mu, beta, size=20000)
    lam, mode = _gumbel_mle(x)
    assert abs(lam - 1 / beta) / (1 / beta) < 0.03
    assert abs(mode - mu) < 0.2


def test_islands_ungapped_dna_published():
    """Ungapped +1/-2 DNA: lambda vs the exact theory root and K vs the
    published NCBI blastn ungapped table value 0.621."""
    from versalignlib_tpu.stats import calibrate_islands

    p = AlignmentParameters(score_match=1, score_mismatch=-2,
                            score_gap_read=-1000, score_gap_ref=-1000,
                            gap_open_read=-1000000, gap_open_ref=-1000000)
    cal = calibrate_islands(p, m=1024, n=1024, samples=8, seed=1)
    theory = karlin_lambda(p)  # = ln((3 + sqrt(21)) / 2) ~= 1.3327
    assert abs(cal.lam - theory) / theory < 0.03
    assert abs(cal.k - 0.621) / 0.621 < 0.15


def test_islands_gapped_blosum62_published():
    """Gapped BLOSUM62 open 11 / extend 1 with the Robinson background:
    lambda within 10% of the published 0.267 and K within 2x of 0.041
    (the precision run in scripts/calibrate_stats.py lands within ~5%;
    this gate trades samples for test runtime)."""
    from versalignlib_tpu.alphabet import blosum62
    from versalignlib_tpu.stats import ROBINSON_FREQS, calibrate_islands

    p = AlignmentParameters(score_gap_read=-1, score_gap_ref=-1,
                            gap_open_read=-11, gap_open_ref=-11,
                            matrix=blosum62())
    cal = calibrate_islands(p, m=1024, n=1024, samples=96, seed=3, c=28,
                            freqs=ROBINSON_FREQS)
    assert abs(cal.lam - 0.267) / 0.267 < 0.10
    assert 0.5 * 0.041 < cal.k < 2.0 * 0.041


def test_island_max_equals_sw_score(rng):
    """The largest island peak IS the SW maximum — ties the extractor to
    the golden-gated oracle on both linear and affine models."""
    from versalignlib_tpu.ops import gotoh, oracle
    from versalignlib_tpu.stats import island_scores
    from versalignlib_tpu.types import Algorithm

    p_lin = AlignmentParameters()
    p_aff = AlignmentParameters(score_gap_read=-1, score_gap_ref=-1,
                                gap_open_read=-5, gap_open_ref=-5)
    for _ in range(10):
        m, n = rng.integers(5, 40, size=2)
        r = rng.integers(1, 5, size=(1, m)).astype(np.uint8)
        f = rng.integers(1, 5, size=(1, n)).astype(np.uint8)
        pk = island_scores(r, f, p_lin)
        want = oracle.score_alignments(
            Algorithm.SMITH_WATERMAN, r, f, p_lin)[0]
        assert pk.max(initial=0) == want
        pk = island_scores(r, f, p_aff)
        assert pk.max(initial=0) == gotoh.sw_score_affine(r[0], f[0], p_aff)
