"""Public API: AlignmentEngine end-to-end over raw strings."""

import numpy as np
import pytest

import versalignlib_tpu as val
from versalignlib_tpu import Algorithm, AlignmentEngine, AlignmentParameters


def test_engine_score_and_align_strings():
    engine = AlignmentEngine(backend="xla")
    reads = ["ACGTACGT", "TTTT", "acgt"]
    refs = ["ACGTACGT", "GGGGTTTTGGGG", "ACGT"]
    scores = engine.score_alignments(Algorithm.SMITH_WATERMAN, reads, refs)
    np.testing.assert_array_equal(scores, [16, 8, 8])
    alns = engine.compute_alignments(Algorithm.SMITH_WATERMAN, reads, refs)
    assert alns[0].cigar == "8M"
    assert alns[1].read == "TTTT"
    assert alns[1].ref == "TTTT"


def test_engine_validates_counts():
    engine = AlignmentEngine(backend="oracle")
    with pytest.raises(ValueError):
        engine.score_alignments(Algorithm.SMITH_WATERMAN, ["ACGT"], ["ACGT", "ACGT"])


def test_engine_backend_registry():
    assert "oracle" in val.available_backends()
    assert "xla" in val.available_backends()
    with pytest.raises(KeyError):
        val.get_backend("nonexistent")


def test_engine_auto_backend():
    engine = AlignmentEngine(backend="auto")
    # auto must pick something that works
    scores = engine.score_alignments(Algorithm.NEEDLEMAN_WUNSCH, ["ACGT"], ["TTACGT"])
    assert scores[0] == 8


def test_params_interface():
    p = AlignmentParameters()
    assert p.param_int("score_match") == 2
    assert p.has_key("score_gap_read")
    assert not p.has_key("bogus")
    with pytest.raises(KeyError):
        p.param_int("bogus")
    with pytest.raises(ValueError):
        AlignmentParameters(score_gap_read=1)


def test_empty_and_degenerate_batches():
    import numpy as np

    from versalignlib_tpu.ops.pallas_backend import PallasBackend
    from versalignlib_tpu.params import DEFAULT_PARAMETERS

    eng = AlignmentEngine(backend="xla")
    assert eng.score_alignments(Algorithm.SMITH_WATERMAN, [], []).shape == (0,)
    assert eng.compute_alignments(Algorithm.SMITH_WATERMAN, [], []) == []
    np.testing.assert_array_equal(
        eng.score_alignments(Algorithm.SMITH_WATERMAN, ["", "ACGT"], ["ACGT", "ACGT"]),
        [0, 8],
    )
    np.testing.assert_array_equal(
        eng.score_alignments(Algorithm.NEEDLEMAN_WUNSCH, ["", ""], ["", ""]), [0, 0]
    )
    pb = PallasBackend(interpret=True)
    out = pb.score_alignments(
        Algorithm.SMITH_WATERMAN, np.zeros((0, 5), np.uint8),
        np.zeros((0, 5), np.uint8), DEFAULT_PARAMETERS,
    )
    assert out.shape == (0,)


def test_auto_backend_skips_interpret_pallas_on_cpu():
    # On the CPU test mesh, "auto" must not pick the (interpreter-mode)
    # Pallas backend — the XLA scan backend is the fast portable choice.
    import versalignlib_tpu as val

    assert val.get_backend("auto").name == "xla"
    # Explicit selection still works.
    assert val.get_backend("pallas").name == "pallas"
