#!/usr/bin/env python
"""On-hardware verification + performance sweep.

Runs the COMPILED Pallas kernels on the real TPU against the golden-gated
numpy oracle (the pytest suite runs on a CPU mesh; this script is the
hardware gate). Exits nonzero on any mismatch.

Usage: python scripts/tpu_check.py [--quick]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small sizes only")
    args = ap.parse_args()

    import jax

    if jax.devices()[0].platform != "tpu":
        print("WARNING: no TPU; compiled checks will run on", jax.devices()[0].platform)

    from versalignlib_tpu.ops import gotoh, oracle
    from versalignlib_tpu.ops.banded import band_offsets, banded_score_batch, banded_score_oracle
    from versalignlib_tpu.ops.pallas_align import pallas_align_batch
    from versalignlib_tpu.ops.pallas_score import PallasScorer
    from versalignlib_tpu.params import AlignmentParameters
    from versalignlib_tpu.types import Algorithm, TieBreak

    rng = np.random.default_rng(123)
    failures = 0

    def check(name, ok):
        nonlocal failures
        print(f"  {'PASS' if ok else 'FAIL'}  {name}")
        if not ok:
            failures += 1

    p_lin = AlignmentParameters()
    p_aff = AlignmentParameters(score_match=2, score_mismatch=-1,
                                score_gap_read=-1, score_gap_ref=-1,
                                gap_open_read=-4, gap_open_ref=-4)
    scorer = PallasScorer(interpret=False)

    print("== score kernels (compiled) ==")
    b = 64 if args.quick else 256
    reads = rng.integers(0, 6, size=(b, 120)).astype(np.uint8)
    refs = rng.integers(0, 6, size=(b, 200)).astype(np.uint8)
    for alg in (Algorithm.SMITH_WATERMAN, Algorithm.NEEDLEMAN_WUNSCH):
        got = scorer(reads, refs, p_lin, alg)
        want = oracle.score_alignments(alg, reads, refs, p_lin)
        check(f"linear {alg.name}", np.array_equal(got, want))
        got = scorer(reads, refs, p_aff, alg)
        want = gotoh.score_alignments_affine(alg, reads, refs, p_aff)
        check(f"affine {alg.name}", np.array_equal(got, want))

    print("== align kernel (compiled) ==")
    for alg in (Algorithm.SMITH_WATERMAN, Algorithm.NEEDLEMAN_WUNSCH):
        for tie in (TieBreak.DIAG_UP_LEFT, TieBreak.DIAG_LEFT_UP):
            got = pallas_align_batch(reads[:32], refs[:32], p_lin, alg, tie,
                                     interpret=False)
            want = oracle.compute_alignments(alg, reads[:32], refs[:32], p_lin, tie)
            ok = all(
                (g.read, g.ref, g.score, g.cigar) == (w.read, w.ref, w.score, w.cigar)
                for g, w in zip(got, want)
            )
            check(f"align {alg.name} {tie.name}", ok)

    print("== banded kernel (compiled) ==")
    m, n, band, tile = 300, 340, 64, 32
    reads_b = rng.integers(0, 6, size=(16, m)).astype(np.uint8)
    refs_b = rng.integers(0, 6, size=(16, n)).astype(np.uint8)
    m_pad = -(-m // tile) * tile
    offs = band_offsets(m_pad, m, n, band)
    reads_pad = np.pad(reads_b, ((0, 0), (0, m_pad - m)))
    for alg in (Algorithm.SMITH_WATERMAN, Algorithm.NEEDLEMAN_WUNSCH):
        got = banded_score_batch(reads_b, refs_b, p_lin, alg, band=band,
                                 tile=tile, interpret=False)
        want = np.array([banded_score_oracle(r, f, p_lin, band, alg, offs)
                         for r, f in zip(reads_pad, refs_b)])
        check(f"banded {alg.name}", np.array_equal(got, want))

    if not args.quick:
        print("== performance (marginal rate; see BENCHMARKS.md) ==")
        import jax.numpy as jnp

        from versalignlib_tpu.ops.pallas_score import score_batch_device

        def tmin(r, f, reps=5):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(score_batch_device(r, f, p_lin,
                                              Algorithm.SMITH_WATERMAN, False))
                best = min(best, time.perf_counter() - t0)
            return best

        for (b1, b2, m, n) in [(4096, 16384, 512, 512),
                               (8192, 32768, 128, 128),
                               (1024, 4096, 1024, 1024)]:
            def mk(b):
                return (jnp.asarray(rng.integers(1, 5, size=(b, m)).astype(np.uint8)),
                        jnp.asarray(rng.integers(1, 5, size=(b, n)).astype(np.uint8)))
            a1, a2 = mk(b1), mk(b2)
            np.asarray(score_batch_device(*a1, p_lin, Algorithm.SMITH_WATERMAN, False))
            np.asarray(score_batch_device(*a2, p_lin, Algorithm.SMITH_WATERMAN, False))
            t1, t2 = tmin(*a1), tmin(*a2)
            g = (b2 - b1) * m * n / max(t2 - t1, 1e-9) / 1e9
            print(f"  SW score {m}x{n}: marginal {g:.1f} GCUPS "
                  f"(t({b1})={t1*1e3:.1f}ms t({b2})={t2*1e3:.1f}ms)")

    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
