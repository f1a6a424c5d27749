#!/usr/bin/env python
"""Ad-hoc kernel lab: compiled correctness + traced-k marginals on the TPU.

Iteration harness for kernel work (NOT an artifact generator — tpu_check.py
is the auditable gate). Picks sections via argv: score, align, affine,
banded, e2e.
"""

import sys
import time

sys.path.insert(0, ".")
import numpy as np

sections = set(sys.argv[1:]) or {"align", "affine"}

import jax
import jax.numpy as jnp

print("platform:", jax.devices()[0].platform, flush=True)

from versalignlib_tpu.ops import gotoh, oracle
from versalignlib_tpu.params import AlignmentParameters
from versalignlib_tpu.types import Algorithm, TieBreak

rng = np.random.default_rng(123)
p_lin = AlignmentParameters()
p_aff = AlignmentParameters(score_match=2, score_mismatch=-1,
                            score_gap_read=-1, score_gap_ref=-1,
                            gap_open_read=-4, gap_open_ref=-4)


def same_alignments(got, want):
    return all(
        (g.read, g.ref, g.score, g.cigar) == (w.read, w.ref, w.score, w.cigar)
        for g, w in zip(got, want))


def kmarginal(exec_fn, cells_per_exec, k_hi=9, tries=3):
    @jax.jit
    def loop(k, tag):
        return jax.lax.fori_loop(
            0, k, lambda i, acc: acc + exec_fn(tag + i), jnp.int32(0))

    t0 = time.perf_counter()
    np.asarray(loop(1, 0))
    print(f"    (compile {time.perf_counter()-t0:.0f}s)", flush=True)

    def timed(k, tag0):
        best = float("inf")
        for i in range(tries):
            t0 = time.perf_counter()
            np.asarray(loop(k, 64 * (tag0 + i)))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(1, 1)
    tk = timed(k_hi, 9)
    return round((k_hi - 1) * cells_per_exec / max(tk - t1, 1e-9) / 1e9, 1)


if "align" in sections or "affine" in sections:
    from versalignlib_tpu.ops.pallas_align import (
        _affine_align_blocks, _align_blocks, _last_valid_pos, _pack_blocks,
        _pack_vec, pallas_align_affine_batch, pallas_align_batch)

    reads = rng.integers(0, 6, size=(64, 120)).astype(np.uint8)
    refs = rng.integers(0, 6, size=(64, 200)).astype(np.uint8)

if "align" in sections:
    print("== linear align: compiled correctness ==", flush=True)
    for alg in (Algorithm.SMITH_WATERMAN, Algorithm.NEEDLEMAN_WUNSCH):
        for tie in (TieBreak.DIAG_UP_LEFT, TieBreak.DIAG_LEFT_UP):
            got = pallas_align_batch(reads[:32], refs[:32], p_lin, alg, tie,
                                     interpret=False)
            want = oracle.compute_alignments(alg, reads[:32], refs[:32],
                                             p_lin, tie)
            ok = same_alignments(got, want)
            print(f"  {'PASS' if ok else 'FAIL'} {alg.name}/{tie.name}",
                  flush=True)
            assert ok
    # odd n
    got = pallas_align_batch(reads[:16], refs[:16, :119], p_lin,
                             Algorithm.SMITH_WATERMAN, interpret=False)
    want = oracle.compute_alignments(Algorithm.SMITH_WATERMAN, reads[:16],
                                     refs[:16, :119], p_lin,
                                     TieBreak.DIAG_UP_LEFT)
    ok = same_alignments(got, want)
    print(f"  {'PASS' if ok else 'FAIL'} odd-n", flush=True)
    assert ok

    print("== linear align fill perf ==", flush=True)

    def align_exec(n_, b_=4096):
        r = rng.integers(1, 5, size=(b_, 512)).astype(np.uint8)
        f = rng.integers(1, 5, size=(b_, n_)).astype(np.uint8)
        g = -(-b_ // 1024)
        mrp = _pack_vec(_last_valid_pos(r, TieBreak.DIAG_UP_LEFT), g)
        rb = jnp.asarray(_pack_blocks(r, g, 512))
        fb = jnp.asarray(_pack_blocks(f, g, n_))

        def fn(tag, rb=rb, fb=fb, mrp=mrp):
            rb2 = rb.at[0, 0, 0, 0].set(tag % 4 + 1)
            out = _align_blocks(rb2, fb, mrp, p_lin,
                                Algorithm.SMITH_WATERMAN,
                                TieBreak.DIAG_UP_LEFT, False)
            return jnp.sum(out[1])
        return fn

    g512 = kmarginal(align_exec(512), 4096 * 512 * 512, k_hi=25)
    print(f"  SW align fill 512x512: {g512} GCUPS", flush=True)
    g509 = kmarginal(align_exec(509), 4096 * 512 * 509, k_hi=25)
    print(f"  SW align fill 512x509: {g509} GCUPS", flush=True)

if "affine" in sections:
    print("== affine align: compiled correctness ==", flush=True)
    for alg in (Algorithm.SMITH_WATERMAN, Algorithm.NEEDLEMAN_WUNSCH):
        got = pallas_align_affine_batch(reads[:32], refs[:32], p_aff, alg,
                                        interpret=False)
        want = gotoh.compute_alignments_affine(alg, reads[:32], refs[:32],
                                               p_aff)
        ok = same_alignments(got, want)
        print(f"  {'PASS' if ok else 'FAIL'} {alg.name}", flush=True)
        assert ok
    got = pallas_align_affine_batch(reads[:32], refs[:32], p_aff,
                                    Algorithm.SMITH_WATERMAN,
                                    TieBreak.DIAG_LEFT_UP, interpret=False)
    want = gotoh.compute_alignments_affine(
        Algorithm.SMITH_WATERMAN, reads[:32], refs[:32], p_aff,
        TieBreak.DIAG_LEFT_UP)
    ok = same_alignments(got, want)
    print(f"  {'PASS' if ok else 'FAIL'} SSE flavor", flush=True)
    assert ok
    got = pallas_align_affine_batch(reads[:16], refs[:16, :119], p_aff,
                                    Algorithm.SMITH_WATERMAN,
                                    interpret=False)
    want = gotoh.compute_alignments_affine(
        Algorithm.SMITH_WATERMAN, reads[:16], refs[:16, :119], p_aff)
    ok = same_alignments(got, want)
    print(f"  {'PASS' if ok else 'FAIL'} odd-n", flush=True)
    assert ok

    print("== affine align fill perf ==", flush=True)

    def affine_align_exec(b_=4096):
        r = rng.integers(1, 5, size=(b_, 512)).astype(np.uint8)
        f = rng.integers(1, 5, size=(b_, 512)).astype(np.uint8)
        g = -(-b_ // 1024)
        mrp = _pack_vec(_last_valid_pos(r, TieBreak.DIAG_UP_LEFT), g)
        rb = jnp.asarray(_pack_blocks(r, g, 512))
        fb = jnp.asarray(_pack_blocks(f, g, 512))

        def fn(tag, rb=rb, fb=fb, mrp=mrp):
            rb2 = rb.at[0, 0, 0, 0].set(tag % 4 + 1)
            out = _affine_align_blocks(rb2, fb, mrp, p_aff,
                                       Algorithm.SMITH_WATERMAN,
                                       TieBreak.DIAG_UP_LEFT, False)
            return jnp.sum(out[1])
        return fn

    ga = kmarginal(affine_align_exec(), 4096 * 512 * 512, k_hi=25)
    print(f"  SW affine align fill 512x512: {ga} GCUPS", flush=True)

if "oddn" in sections:
    # Diagnose the odd-n align cliff: 384 = exactly 3 full runs (no tail),
    # 400 = 3 runs + 1 tail word, 496 = 3 runs + 7 tail words, 509 = the
    # odd shape (3 runs + 7 words + partial). Where does the time go?
    from versalignlib_tpu.ops.pallas_align import (
        _align_blocks, _last_valid_pos, _pack_blocks, _pack_vec)

    def align_exec_n(n_, b_=4096):
        r = rng.integers(1, 5, size=(b_, 512)).astype(np.uint8)
        f = rng.integers(1, 5, size=(b_, n_)).astype(np.uint8)
        g = -(-b_ // 1024)
        mrp = _pack_vec(_last_valid_pos(r, TieBreak.DIAG_UP_LEFT), g)
        rb = jnp.asarray(_pack_blocks(r, g, 512))
        fb = jnp.asarray(_pack_blocks(f, g, n_))

        def fn(tag, rb=rb, fb=fb, mrp=mrp):
            rb2 = rb.at[0, 0, 0, 0].set(tag % 4 + 1)
            out = _align_blocks(rb2, fb, mrp, p_lin,
                                Algorithm.SMITH_WATERMAN,
                                TieBreak.DIAG_UP_LEFT, False)
            return jnp.sum(out[1])
        return fn

    for n_ in (384, 400, 496, 508, 509):
        gv = kmarginal(align_exec_n(n_), 4096 * 512 * n_, k_hi=25)
        print(f"  SW align fill 512x{n_}: {gv} GCUPS", flush=True)

if "banded" in sections:
    from versalignlib_tpu.ops.banded import (_banded_align_blocks,
                                             band_offsets,
                                             banded_align_batch,
                                             banded_align_oracle)
    from versalignlib_tpu.ops.pallas_align import (_last_valid_pos,
                                                   _pack_blocks, _pack_vec)

    print("== banded align: compiled correctness ==", flush=True)
    m, n, band, tile = 300, 340, 64, 32
    reads_b = rng.integers(0, 6, size=(16, m)).astype(np.uint8)
    refs_b = rng.integers(0, 6, size=(16, n)).astype(np.uint8)
    m_pad = -(-m // tile) * tile
    offs = band_offsets(m_pad, m, n, band)
    for alg in (Algorithm.SMITH_WATERMAN, Algorithm.NEEDLEMAN_WUNSCH):
        for p, label in ((p_lin, "linear"), (p_aff, "affine")):
            got = banded_align_batch(reads_b[:8], refs_b[:8], p, alg,
                                     band=band, tile=tile, interpret=False)
            want = [banded_align_oracle(r, f, p, band, alg, offs)
                    for r, f in zip(reads_b[:8], refs_b[:8])]
            ok = same_alignments(got, want)
            print(f"  {'PASS' if ok else 'FAIL'} {label}/{alg.name}",
                  flush=True)
            assert ok
    for p, label in ((p_lin, "linear"), (p_aff, "affine")):
        got = banded_align_batch(reads_b[:8], refs_b[:8], p,
                                 Algorithm.SMITH_WATERMAN, band=band,
                                 tile=tile, interpret=False,
                                 tie=TieBreak.DIAG_LEFT_UP)
        want = [banded_align_oracle(r, f, p, band, Algorithm.SMITH_WATERMAN,
                                    offs, tie=TieBreak.DIAG_LEFT_UP)
                for r, f in zip(reads_b[:8], refs_b[:8])]
        ok = same_alignments(got, want)
        print(f"  {'PASS' if ok else 'FAIL'} {label}/SSE", flush=True)
        assert ok

    print("== banded align fill perf ==", flush=True)

    def banded_exec(p, aff):
        band_, tile_ = 512, 64
        m_ = n_ = 16384
        r = rng.integers(1, 5, size=(1024, m_)).astype(np.uint8)
        f = rng.integers(1, 5, size=(1024, n_)).astype(np.uint8)
        offs_ = band_offsets(m_, m_, n_, band_)
        d_max = max(int(np.diff(offs_).max(initial=1)), 1)
        ws = jnp.asarray(offs_[::tile_].copy())
        mrp = _pack_vec(_last_valid_pos(r, TieBreak.DIAG_UP_LEFT), 1)
        rb = jnp.asarray(_pack_blocks(r, 1, m_))
        fb = jnp.asarray(_pack_blocks(f, 1, n_))
        offs_j = jnp.asarray(offs_)

        def fn(tag, rb=rb, fb=fb):
            rb2 = rb.at[0, 0, 0, 0].set(tag % 4 + 1)
            out = _banded_align_blocks(rb2, fb, offs_j, ws, mrp, p,
                                       Algorithm.SMITH_WATERMAN, band_,
                                       tile_, d_max, canonical=True,
                                       interpret=False)
            return jnp.sum(out[1])
        return fn

    gb = kmarginal(banded_exec(p_lin, False), 16384 * 512 * 1024, k_hi=3)
    print(f"  SW banded align fill: {gb} GCUPS (band cells)", flush=True)
    gba = kmarginal(banded_exec(p_aff, True), 16384 * 512 * 1024, k_hi=3)
    print(f"  SW banded AFFINE align fill: {gba} GCUPS (band cells)",
          flush=True)

print("LAB DONE", flush=True)
