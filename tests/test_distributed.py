"""Data-parallel mesh layer on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

from tests.conftest import random_codes
from versalignlib_tpu.ops import oracle
from versalignlib_tpu.parallel import distributed_score_batch, make_mesh
from versalignlib_tpu.types import Algorithm, TieBreak


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


@pytest.mark.parametrize("algorithm", [Algorithm.SMITH_WATERMAN, Algorithm.NEEDLEMAN_WUNSCH])
def test_distributed_scores_match_oracle(rng, mesh, default_params, algorithm):
    reads = random_codes(rng, 33, 12, padded=True)  # 33: uneven shard sizes
    refs = random_codes(rng, 33, 15, padded=True)
    got = distributed_score_batch(reads, refs, default_params, algorithm,
                                  mesh=mesh, impl="xla")
    want = oracle.score_alignments(algorithm, reads, refs, default_params)
    np.testing.assert_array_equal(got, want)


def test_distributed_align_device(rng, mesh, default_params):
    import jax.numpy as jnp

    from versalignlib_tpu.ops.traceback import decode_batch
    from versalignlib_tpu.parallel.distributed import distributed_align_device

    b = 16
    reads = random_codes(rng, b, 10)
    refs = random_codes(rng, b, 12)
    ptr, sr, sf, best = distributed_align_device(
        jnp.asarray(reads), jnp.asarray(refs), default_params,
        Algorithm.SMITH_WATERMAN, TieBreak.DIAG_UP_LEFT, mesh,
    )
    alns = decode_batch(np.asarray(ptr), reads, refs, np.asarray(sr),
                        np.asarray(sf), default_params,
                        Algorithm.SMITH_WATERMAN, np.asarray(best))
    want = oracle.compute_alignments(Algorithm.SMITH_WATERMAN, reads, refs, default_params)
    for g, w in zip(alns, want):
        assert (g.read, g.ref, g.score, g.cigar) == (w.read, w.ref, w.score, w.cigar)


def test_mesh_helpers():
    m = make_mesh(4)
    assert m.devices.size == 4
    with pytest.raises(ValueError):
        make_mesh(10_000)


def test_engine_with_mesh(rng, mesh, default_params):
    from versalignlib_tpu import AlignmentEngine

    engine = AlignmentEngine(backend="xla", mesh=mesh)
    reads = random_codes(rng, 12, 10)
    refs = random_codes(rng, 12, 10)
    got = engine.score_alignments(Algorithm.SMITH_WATERMAN, reads, refs)
    want = oracle.score_alignments(Algorithm.SMITH_WATERMAN, reads, refs, default_params)
    np.testing.assert_array_equal(got, want)


def test_graft_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_engine_mesh_align(rng, mesh, default_params):
    from versalignlib_tpu import AlignmentEngine
    from versalignlib_tpu.ops import oracle as orc

    engine = AlignmentEngine(backend="xla", mesh=mesh)
    reads = random_codes(rng, 13, 10)  # uneven across 8 devices
    refs = random_codes(rng, 13, 12)
    got = engine.compute_alignments(Algorithm.SMITH_WATERMAN, reads, refs)
    want = orc.compute_alignments(Algorithm.SMITH_WATERMAN, reads, refs, default_params)
    assert len(got) == 13
    for g, w in zip(got, want):
        assert (g.read, g.ref, g.score, g.cigar) == (w.read, w.ref, w.score, w.cigar)


def test_engine_mesh_align_affine(rng, mesh):
    # Mesh + affine must route through the sharded Gotoh fill, not silently
    # bypass the mesh (round-1 defect), and must reject the SSE flavor.
    from versalignlib_tpu import AlignmentEngine
    from versalignlib_tpu.ops import gotoh
    from versalignlib_tpu.params import AlignmentParameters

    p = AlignmentParameters(score_match=2, score_mismatch=-1,
                            score_gap_read=-1, score_gap_ref=-1,
                            gap_open_read=-4, gap_open_ref=-4)
    engine = AlignmentEngine(params=p, backend="xla", mesh=mesh)
    reads = random_codes(rng, 9, 10, padded=True)
    refs = random_codes(rng, 9, 12, padded=True)
    for algorithm in (Algorithm.SMITH_WATERMAN, Algorithm.NEEDLEMAN_WUNSCH):
        got = engine.compute_alignments(algorithm, reads, refs)
        want = gotoh.compute_alignments_affine(algorithm, reads, refs, p)
        for g, w in zip(got, want):
            assert (g.read, g.ref, g.score, g.cigar) == (w.read, w.ref, w.score, w.cigar)

    sse = AlignmentEngine(params=p, backend="xla", mesh=mesh,
                          tie=TieBreak.DIAG_LEFT_UP)
    got = sse.compute_alignments(Algorithm.SMITH_WATERMAN, reads, refs)
    want = gotoh.compute_alignments_affine(
        Algorithm.SMITH_WATERMAN, reads, refs, p, TieBreak.DIAG_LEFT_UP)
    for g, w in zip(got, want):
        assert (g.read, g.ref, g.score, g.cigar) == (w.read, w.ref, w.score, w.cigar)


def test_distributed_align_batch_nw_padded(rng, mesh, default_params):
    # NW through the packed sharded fill with padded reads (end-cell rule).
    from versalignlib_tpu.parallel.distributed import distributed_align_batch

    reads = random_codes(rng, 11, 10, padded=True, n_prob=0.1)
    refs = random_codes(rng, 11, 14, padded=True, n_prob=0.1)
    for tie in (TieBreak.DIAG_UP_LEFT, TieBreak.DIAG_LEFT_UP):
        got = distributed_align_batch(reads, refs, default_params,
                                      Algorithm.NEEDLEMAN_WUNSCH, tie, mesh=mesh)
        want = oracle.compute_alignments(Algorithm.NEEDLEMAN_WUNSCH, reads,
                                         refs, default_params, tie)
        for g, w in zip(got, want):
            assert (g.read, g.ref, g.score, g.cigar) == (w.read, w.ref, w.score, w.cigar)
