#!/usr/bin/env python
"""On-hardware verification + performance sweep, recorded as a JSON artifact.

Runs the COMPILED Pallas kernels on the real TPU against the golden-gated
numpy oracles (the pytest suite runs on a CPU mesh in interpreter mode; this
script is the hardware gate). Writes ``TPU_CHECK.json`` and a per-round copy
``TPU_CHECK_r{NN}.json`` at the repo root so compiled-kernel correctness is
an auditable artifact, not a claim. Exits nonzero on any mismatch.

Usage: python scripts/tpu_check.py [--quick] [--no-perf]
"""

import argparse
import glob
import json
import pathlib
import re
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import numpy as np


def _infer_round() -> int:
    rounds = [int(m.group(1)) for f in glob.glob(str(ROOT / "BENCH_r*.json"))
              if (m := re.search(r"BENCH_r(\d+)\.json$", f))]
    return (max(rounds) + 1) if rounds else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small sizes only")
    ap.add_argument("--no-perf", action="store_true", help="skip perf sweep")
    args = ap.parse_args()

    # Probe device init in a subprocess first: a down axon tunnel makes
    # jax.devices() block forever with no in-process recovery.
    import subprocess
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=240)
        reachable = probe.returncode == 0
    except subprocess.TimeoutExpired:
        reachable = False
    if not reachable:
        print("FATAL: device init hangs (TPU tunnel down?) — tpu_check "
              "needs the hardware; not falling back to CPU.",
              file=sys.stderr)
        return 2

    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    if platform != "tpu":
        print(f"WARNING: no TPU; compiled checks will run on {platform}")

    from versalignlib_tpu import AlignmentEngine
    from versalignlib_tpu.ops import gotoh, oracle
    from versalignlib_tpu.ops.banded import (band_offsets, banded_align_batch,
                                             banded_align_oracle,
                                             banded_score_batch,
                                             banded_score_oracle)
    from versalignlib_tpu.ops.pallas_align import (pallas_align_affine_batch,
                                                   pallas_align_batch)
    from versalignlib_tpu.ops.pallas_score import PallasScorer, score_batch_device
    from versalignlib_tpu.params import AlignmentParameters
    from versalignlib_tpu.types import Algorithm, TieBreak

    rng = np.random.default_rng(123)
    checks: dict[str, bool] = {}
    perf: dict[str, float] = {}

    def check(name, ok):
        checks[name] = bool(ok)
        print(f"  {'PASS' if ok else 'FAIL'}  {name}")

    def same_alignments(got, want):
        return all(
            (g.read, g.ref, g.score, g.cigar) == (w.read, w.ref, w.score, w.cigar)
            for g, w in zip(got, want)
        )

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
        check(f"score/linear/{alg.name}", np.array_equal(got, want))
        got = scorer(reads, refs, p_aff, alg)
        want = gotoh.score_alignments_affine(alg, reads, refs, p_aff)
        check(f"score/affine/{alg.name}", np.array_equal(got, want))

    print("== align kernels (compiled) ==")
    for alg in (Algorithm.SMITH_WATERMAN, Algorithm.NEEDLEMAN_WUNSCH):
        for tie in (TieBreak.DIAG_UP_LEFT, TieBreak.DIAG_LEFT_UP):
            got = pallas_align_batch(reads[:32], refs[:32], p_lin, alg, tie,
                                     interpret=False)
            want = oracle.compute_alignments(alg, reads[:32], refs[:32], p_lin, tie)
            check(f"align/linear/{alg.name}/{tie.name}", same_alignments(got, want))
        got = pallas_align_affine_batch(reads[:32], refs[:32], p_aff, alg,
                                        interpret=False)
        want = gotoh.compute_alignments_affine(alg, reads[:32], refs[:32], p_aff)
        check(f"align/affine/{alg.name}", same_alignments(got, want))
    # Affine SSE flavor (validity-gated DIAG > LEFT(E) > UP(F)).
    got = pallas_align_affine_batch(reads[:32], refs[:32], p_aff,
                                    Algorithm.SMITH_WATERMAN,
                                    TieBreak.DIAG_LEFT_UP, interpret=False)
    want = gotoh.compute_alignments_affine(
        Algorithm.SMITH_WATERMAN, reads[:32], refs[:32], p_aff,
        TieBreak.DIAG_LEFT_UP)
    check("align/affine/SMITH_WATERMAN/DIAG_LEFT_UP",
          same_alignments(got, want))
    # Odd ref length forces pack == 1 (caught a Mosaic relayout bug once).
    odd_refs = refs[:16, :119]
    got = pallas_align_affine_batch(reads[:16], odd_refs, p_aff,
                                    Algorithm.SMITH_WATERMAN, interpret=False)
    want = gotoh.compute_alignments_affine(Algorithm.SMITH_WATERMAN, reads[:16],
                                           odd_refs, p_aff)
    check("align/affine/odd-ref-len", same_alignments(got, want))

    print("== device-side traceback walk (compiled) ==")
    # Records path vs the SAME oracle wants as the align section — full
    # Alignment equality via same_alignments.
    for alg in (Algorithm.SMITH_WATERMAN, Algorithm.NEEDLEMAN_WUNSCH):
        got = pallas_align_batch(reads[:32], refs[:32], p_lin, alg,
                                 interpret=False, device_walk=True)
        want = oracle.compute_alignments(alg, reads[:32], refs[:32], p_lin,
                                         TieBreak.DIAG_UP_LEFT)
        check(f"walk/linear/{alg.name}", same_alignments(got, want))
        got = pallas_align_affine_batch(reads[:32], refs[:32], p_aff, alg,
                                        interpret=False, device_walk=True)
        want = gotoh.compute_alignments_affine(alg, reads[:32], refs[:32],
                                               p_aff)
        check(f"walk/affine/{alg.name}", same_alignments(got, want))
    got = pallas_align_batch(reads[:32], refs[:32], p_lin,
                             Algorithm.SMITH_WATERMAN,
                             TieBreak.DIAG_LEFT_UP, interpret=False,
                             device_walk=True)
    want = oracle.compute_alignments(Algorithm.SMITH_WATERMAN, reads[:32],
                                     refs[:32], p_lin, TieBreak.DIAG_LEFT_UP)
    check("walk/linear/SMITH_WATERMAN/DIAG_LEFT_UP",
          same_alignments(got, want))
    got = pallas_align_batch(reads[:16], refs[:16, :119], p_lin,
                             Algorithm.SMITH_WATERMAN, interpret=False,
                             device_walk=True)
    want = oracle.compute_alignments(Algorithm.SMITH_WATERMAN, reads[:16],
                                     refs[:16, :119], p_lin,
                                     TieBreak.DIAG_UP_LEFT)
    check("walk/odd-ref-len", same_alignments(got, want))

    print("== matrix mode (compiled) ==")
    mrng = np.random.default_rng(7)
    mm = mrng.integers(-4, 5, size=(6, 6))
    np.fill_diagonal(mm, 5)
    mm[0, :] = 0
    mm[:, 0] = 0
    p_mat = AlignmentParameters(score_gap_read=-3, score_gap_ref=-3,
                                matrix=tuple(tuple(int(v) for v in r) for r in mm))
    for alg in (Algorithm.SMITH_WATERMAN, Algorithm.NEEDLEMAN_WUNSCH):
        got = scorer(reads[:64], refs[:64], p_mat, alg)
        want = oracle.score_alignments(alg, reads[:64], refs[:64], p_mat)
        check(f"matrix/score/{alg.name}", np.array_equal(got, want))
    for tie in (TieBreak.DIAG_UP_LEFT, TieBreak.DIAG_LEFT_UP):
        got = pallas_align_batch(reads[:16], refs[:16], p_mat,
                                 Algorithm.SMITH_WATERMAN, tie,
                                 interpret=False)
        want = oracle.compute_alignments(Algorithm.SMITH_WATERMAN, reads[:16],
                                         refs[:16], p_mat, tie)
        label = "matrix/align/SMITH_WATERMAN" + (
            "" if tie == TieBreak.DIAG_UP_LEFT else "/DIAG_LEFT_UP")
        check(label, same_alignments(got, want))

    print("== search kernel (compiled one-vs-many) ==")
    from versalignlib_tpu.ops.pallas_search import cross_scores_device

    def cross_oracle(alg, rr, ff, p):
        r2 = np.repeat(rr, ff.shape[0], axis=0)
        f2 = np.tile(ff, (rr.shape[0], 1))
        fn = (gotoh.score_alignments_affine if p.affine
              else oracle.score_alignments)
        return fn(alg, r2, f2, p).reshape(rr.shape[0], ff.shape[0])

    sr = rng.integers(0, 6, size=(37, 96)).astype(np.uint8)
    sf = rng.integers(0, 6, size=(9, 120)).astype(np.uint8)
    for alg in (Algorithm.SMITH_WATERMAN, Algorithm.NEEDLEMAN_WUNSCH):
        # lanes=reads (B > R) and lanes=refs (R > B), linear + affine.
        got = np.asarray(cross_scores_device(sr, sf, p_lin, alg))
        check(f"search/lanes-reads/{alg.name}",
              np.array_equal(got, cross_oracle(alg, sr, sf, p_lin)))
        got = np.asarray(cross_scores_device(sf, sr, p_lin, alg))
        check(f"search/lanes-refs/{alg.name}",
              np.array_equal(got, cross_oracle(alg, sf, sr, p_lin)))
    got = np.asarray(cross_scores_device(sr, sf, p_aff,
                                         Algorithm.SMITH_WATERMAN))
    check("search/affine",
          np.array_equal(got, cross_oracle(Algorithm.SMITH_WATERMAN, sr, sf,
                                           p_aff)))
    got = np.asarray(cross_scores_device(sr[:8], sf, p_mat,
                                         Algorithm.SMITH_WATERMAN))
    check("search/matrix",
          np.array_equal(got, cross_oracle(Algorithm.SMITH_WATERMAN, sr[:8],
                                           sf, p_mat)))

    print("== pssm profile search (compiled SMEM-words kernel) ==")
    from versalignlib_tpu.ops.pssm import (pack_pssm, pssm_scores_device,
                                           score_profile_oracle)

    pssm = rng.integers(-4, 12, size=(24, 6)).astype(np.int32)
    pssm[:, 0] = 0
    pool = rng.integers(0, 7, size=(1100, 64)).astype(np.uint8)
    pw, pmeta = pack_pssm(pssm)
    for alg in (Algorithm.SMITH_WATERMAN, Algorithm.NEEDLEMAN_WUNSCH):
        got = np.asarray(pssm_scores_device(pw, pmeta, pool[:64], p_lin, alg))
        check(f"pssm/{alg.name}",
              np.array_equal(got, score_profile_oracle(pssm, pool[:64],
                                                       p_lin, alg)))
    got = np.asarray(pssm_scores_device(pw, pmeta, pool[:64], p_aff,
                                        Algorithm.SMITH_WATERMAN))
    check("pssm/affine",
          np.array_equal(got, score_profile_oracle(pssm, pool[:64], p_aff,
                                                   Algorithm.SMITH_WATERMAN)))
    from versalignlib_tpu.ops.pssm import pack_pssms

    pssm2 = rng.integers(-4, 12, size=(24, 6)).astype(np.int32)
    pssm2[:, 0] = 0
    pwm, pmm = pack_pssms([pssm, pssm2])
    gotm = np.asarray(pssm_scores_device(pwm, pmm, pool[:64], p_lin,
                                         Algorithm.SMITH_WATERMAN))
    check("pssm/multi-profile", all(
        np.array_equal(gotm[i], score_profile_oracle(pp, pool[:64], p_lin,
                                                     Algorithm.SMITH_WATERMAN))
        for i, pp in enumerate((pssm, pssm2))))
    # r5 coords fold (hit positions): device argmax == the oracle's
    # row-major strict-first-win scan, linear and affine.
    from versalignlib_tpu.ops.pssm import profile_argmax_oracle

    for p, label in ((p_lin, "linear"), (p_aff, "affine")):
        cs, cr, cc = pssm_scores_device(pw, pmeta, pool[:64], p,
                                        Algorithm.SMITH_WATERMAN,
                                        with_coords=True)
        so, ro, co = profile_argmax_oracle(pssm, pool[:64], p)
        check(f"pssm/coords/{label}",
              np.array_equal(np.asarray(cs), so)
              and np.array_equal(np.asarray(cr), ro)
              and np.array_equal(np.asarray(cc), co))

    print("== translated search (compiled affine+matrix one-vs-many) ==")
    try:
        from versalignlib_tpu.translate import (TRANSLATED_PARAMETERS,
                                                translated_search)

        tr_reads = ["C" + "ATGAAATGGCATCATGAAGAAAAGCTG" + "GT",
                    "ACGTACGTACGTACGTACGTACGTACG"]
        tr_panel = ["MKWHHEEKL", "WWYYFFPPHH"]
        th = translated_search(tr_reads, tr_panel)
        check("translated/frame+entry",
              int(th.index[0]) == 0 and int(th.frame[0]) == 2
              and int(th.score[0]) > 0)
    except Exception as exc:  # noqa: BLE001
        print(f"  FAIL  translated search raised: {exc}")
        checks["translated/frame+entry"] = False

    print("== banded kernels (compiled) ==")
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
        check(f"banded-score/{alg.name}", np.array_equal(got, want))
        for p, label in ((p_lin, "linear"), (p_aff, "affine")):
            got = banded_align_batch(reads_b[:8], refs_b[:8], p, alg,
                                     band=band, tile=tile, interpret=False,
                                     device_walk=False)
            want = [banded_align_oracle(r, f, p, band, alg, offs)
                    for r, f in zip(reads_b[:8], refs_b[:8])]
            check(f"banded-align/{label}/{alg.name}", same_alignments(got, want))
            got = banded_align_batch(reads_b[:8], refs_b[:8], p, alg,
                                     band=band, tile=tile, interpret=False,
                                     device_walk=True)
            check(f"banded-walk/{label}/{alg.name}", same_alignments(got, want))
    # Banded SSE flavor (compiled): linear + affine, SW.
    for p, label in ((p_lin, "linear"), (p_aff, "affine")):
        got = banded_align_batch(reads_b[:8], refs_b[:8], p,
                                 Algorithm.SMITH_WATERMAN, band=band,
                                 tile=tile, interpret=False,
                                 tie=TieBreak.DIAG_LEFT_UP)
        want = [banded_align_oracle(r, f, p, band, Algorithm.SMITH_WATERMAN,
                                    offs, tie=TieBreak.DIAG_LEFT_UP)
                for r, f in zip(reads_b[:8], refs_b[:8])]
        check(f"banded-align/{label}/SMITH_WATERMAN/DIAG_LEFT_UP",
              same_alignments(got, want))

    print("== mesh (compiled shard_map + pallas, 1 real device) ==")
    try:
        from versalignlib_tpu.parallel import make_mesh
        from versalignlib_tpu.parallel.distributed import distributed_score_batch

        mesh = make_mesh(1)
        s = distributed_score_batch(reads[:32], refs[:32], p_lin,
                                    Algorithm.SMITH_WATERMAN, mesh=mesh,
                                    impl="pallas")
        want = oracle.score_alignments(Algorithm.SMITH_WATERMAN, reads[:32],
                                       refs[:32], p_lin)
        check("mesh/score-pallas", np.array_equal(s, want))
        eng = AlignmentEngine(backend="pallas", mesh=mesh)
        got = eng.compute_alignments(Algorithm.NEEDLEMAN_WUNSCH, reads[:32], refs[:32])
        want = oracle.compute_alignments(Algorithm.NEEDLEMAN_WUNSCH, reads[:32],
                                         refs[:32], p_lin, TieBreak.DIAG_UP_LEFT)
        check("mesh/align-packed", same_alignments(got, want))
    except Exception as exc:  # noqa: BLE001
        print(f"  FAIL  mesh smoke raised: {exc}")
        checks["mesh/smoke"] = False

    if not args.quick and not args.no_perf:
        print("== performance (marginal rate; see BENCHMARKS.md) ==")

        def kmarginal(exec_fn, cells_per_exec, k_hi=9, tries=3):
            """Marginal over a TRACED execution count: one jitted dispatch
            runs ``exec_fn`` (tag -> scalar jnp value) k times on
            per-iteration-perturbed inputs inside a fori_loop and reduces
            to a scalar, so (t(k_hi) - t(1)) / (k_hi - 1) cancels every
            per-call constant (RTT, dispatch, the scalar D2H) EXACTLY and
            needs one compile. The r4 sweep replaced the old two-batch-size
            marginal, whose denominator swung +-30% run-to-run with tunnel
            jitter (align fill read 288 and 219 GCUPS an hour apart)."""
            @jax.jit
            def loop(k, tag):
                return jax.lax.fori_loop(
                    0, k, lambda i, acc: acc + exec_fn(tag + i),
                    jnp.int32(0))

            np.asarray(loop(1, 0))  # compile + warm

            def timed(k, tag0):
                best = float("inf")
                for i in range(tries):
                    t0 = time.perf_counter()
                    np.asarray(loop(k, 64 * (tag0 + i)))
                    best = min(best, time.perf_counter() - t0)
                return best

            t1 = timed(1, 1)
            tk = timed(k_hi, 9)
            return round(
                (k_hi - 1) * cells_per_exec / max(tk - t1, 1e-9) / 1e9, 1)

        B_SC = 16384

        def score_exec(n_, p_=p_lin):
            r = jnp.asarray(rng.integers(1, 5, size=(B_SC, 512)).astype(np.uint8))
            f = jnp.asarray(rng.integers(1, 5, size=(B_SC, n_)).astype(np.uint8))

            def fn(tag, r=r, f=f):
                r2 = r.at[0, 0].set(tag % 4 + 1)
                return jnp.sum(score_batch_device(
                    r2, f, p_, Algorithm.SMITH_WATERMAN, False))
            return fn

        perf["score_sw_512_gcups"] = kmarginal(score_exec(512),
                                               B_SC * 512 * 512)
        print(f"  SW score 512x512: {perf['score_sw_512_gcups']:.1f} GCUPS")

        # Odd ref length (prime 509): the r2 kernels dropped to unroll/pack
        # 1 here (16x pointer bytes); the statically-shaped remainder chunk
        # must keep this within ~1.5x of n=512.
        perf["score_sw_509_gcups"] = kmarginal(score_exec(509),
                                               B_SC * 512 * 509)
        print(f"  SW score 512x509 (odd n): "
              f"{perf['score_sw_509_gcups']:.1f} GCUPS")

        # Matrix-mode scoring (bit-packed lookup, make_sub_fn): BLOSUM62
        # S=25 protein — the large-alphabet throughput story.
        from versalignlib_tpu.alphabet import blosum62

        p_blo = AlignmentParameters(score_gap_read=-1, score_gap_ref=-1,
                                    matrix=blosum62())
        S_blo = len(p_blo.matrix)

        def blosum_exec():
            r = jnp.asarray(rng.integers(1, S_blo, size=(8192, 512)).astype(np.uint8))
            f = jnp.asarray(rng.integers(1, S_blo, size=(8192, 512)).astype(np.uint8))

            def fn(tag, r=r, f=f):
                r2 = r.at[0, 0].set(tag % 4 + 1)
                return jnp.sum(score_batch_device(
                    r2, f, p_blo, Algorithm.SMITH_WATERMAN, False))
            return fn

        perf["score_blosum62_gcups"] = kmarginal(blosum_exec(),
                                                 8192 * 512 * 512)
        print(f"  BLOSUM62 (S=25) score 512x512: "
              f"{perf['score_blosum62_gcups']:.1f} GCUPS")

        # One-vs-many search kernel at the refmap shape: 64 reads resident,
        # 16k-window pool in lanes (on-device reduction; tiny transfer).
        sreads = jnp.asarray(rng.integers(1, 5, size=(64, 128)).astype(np.uint8))
        spool = jnp.asarray(rng.integers(1, 5, size=(16384, 512)).astype(np.uint8))

        def search_exec(tag):
            f2 = spool.at[0, 0].set(tag % 4 + 1)
            return jnp.sum(cross_scores_device(
                sreads, f2, p_lin, Algorithm.SMITH_WATERMAN, False))

        # 64 x 16384 pairs of 128 x 512 cells = 68.7G cells per execution:
        # keep k_hi small, the single-exec time already dwarfs jitter.
        perf["search_sw_gcups"] = kmarginal(search_exec,
                                            64 * 16384 * 128 * 512, k_hi=3)
        print(f"  SW one-vs-many search 64x128 vs 16k 512bp windows: "
              f"{perf['search_sw_gcups']:.1f} GCUPS")

        # PSSM motif scan: 24-position profile vs a 64k x 512bp pool
        # (runtime SMEM word tables; same one-vs-many streaming).
        pw_j = jnp.asarray(pw)
        ppool = jnp.asarray(rng.integers(1, 5, size=(65536, 512)).astype(np.uint8))

        def pssm_exec(tag):
            f2 = ppool.at[0, 0].set(tag % 4 + 1)
            return jnp.sum(pssm_scores_device(
                pw_j, pmeta, f2, p_lin, Algorithm.SMITH_WATERMAN))

        # Small per-execution time (~3ms): deepen the loop so the marginal
        # dwarfs timer jitter (the k=9 variant read 285-546 across runs).
        perf["pssm_sw_gcups"] = kmarginal(pssm_exec, 24 * 512 * 65536,
                                          k_hi=33)
        print(f"  SW pssm scan 24pos vs 64k x 512bp pool: "
              f"{perf['pssm_sw_gcups']:.1f} GCUPS")

        from versalignlib_tpu.ops.pallas_align import (_align_blocks,
                                                       _last_valid_pos,
                                                       _pack_blocks, _pack_vec)

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

        perf["align_sw_512_gcups"] = kmarginal(align_exec(512),
                                               4096 * 512 * 512, k_hi=25)
        print(f"  SW align fill 512x512: {perf['align_sw_512_gcups']:.1f} GCUPS")

        # Odd ref length align fill (see score_sw_509 above): pointer words
        # stay fully packed (ceil(509/16) words + one partial).
        perf["align_sw_509_gcups"] = kmarginal(align_exec(509),
                                               4096 * 512 * 509, k_hi=25)
        print(f"  SW align fill 512x509 (odd n): "
              f"{perf['align_sw_509_gcups']:.1f} GCUPS")

        # Affine (Gotoh) align fill: 4-bit codes, packed-prio hptr.
        from versalignlib_tpu.ops.pallas_align import _affine_align_blocks

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

        perf["align_affine_sw_gcups"] = kmarginal(affine_align_exec(),
                                                  4096 * 512 * 512, k_hi=25)
        print(f"  SW affine align fill 512x512: "
              f"{perf['align_affine_sw_gcups']:.1f} GCUPS")

        # e2e alignment pipeline at the short-read shape (fill + transfer +
        # decode to the raw column store), pointer-D2H vs device-walk.
        # Wall time of a fixed batch, not a marginal: this is a pipeline
        # number dominated by link bytes on this tunnel.
        er = rng.integers(1, 5, size=(16384, 128)).astype(np.uint8)
        ef = rng.integers(1, 5, size=(16384, 128)).astype(np.uint8)
        for dw, key in ((False, "e2e_align_ptr_alns_per_s"),
                        (True, "e2e_align_walk_alns_per_s")):
            pallas_align_batch(er[:2048], ef[:2048], p_lin,
                               Algorithm.SMITH_WATERMAN, interpret=False,
                               raw=True, device_walk=dw)  # warm
            t0 = time.perf_counter()
            pallas_align_batch(er, ef, p_lin, Algorithm.SMITH_WATERMAN,
                               interpret=False, raw=True, device_walk=dw)
            perf[key] = round(16384 / (time.perf_counter() - t0))
        print(f"  e2e 128x128 SW align (raw): pointer-D2H "
              f"{perf['e2e_align_ptr_alns_per_s']} alns/s, device-walk "
              f"{perf['e2e_align_walk_alns_per_s']} alns/s (tunnel)")

        from versalignlib_tpu.ops.banded import _banded_align_blocks

        def banded_exec(p):
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

        # Banded SCORE fill (r5: context streams + 64-col runs + scalar
        # band predicates; the r2-era number was 104-107).
        from versalignlib_tpu.ops.banded import _banded_score_blocks

        def banded_score_exec():
            band_, tile_ = 512, 256
            m_ = n_ = 16384
            r = rng.integers(1, 5, size=(1024, m_)).astype(np.uint8)
            f = rng.integers(1, 5, size=(1024, n_)).astype(np.uint8)
            offs_ = band_offsets(m_, m_, n_, band_)
            d_max = max(int(np.diff(offs_).max(initial=1)), 1)
            rb = jnp.asarray(_pack_blocks(r, 1, m_))
            fb = jnp.asarray(_pack_blocks(f, 1, n_))
            offs_j = jnp.asarray(offs_)

            def fn(tag, rb=rb, fb=fb):
                rb2 = rb.at[0, 0, 0, 0].set(tag % 4 + 1)
                return jnp.sum(_banded_score_blocks(
                    rb2, fb, offs_j, p_lin, Algorithm.SMITH_WATERMAN,
                    band_, tile_, d_max, False))
            return fn

        perf["banded_score_sw_gcups"] = kmarginal(
            banded_score_exec(), 16384 * 512 * 1024, k_hi=3)
        print(f"  SW banded score fill (band cells): "
              f"{perf['banded_score_sw_gcups']:.1f} GCUPS")

        perf["banded_align_sw_gcups"] = kmarginal(
            banded_exec(p_lin), 16384 * 512 * 1024, k_hi=3)
        print(f"  SW banded align fill (band cells): "
              f"{perf['banded_align_sw_gcups']:.1f} GCUPS")

        perf["banded_align_affine_gcups"] = kmarginal(
            banded_exec(p_aff), 16384 * 512 * 1024, k_hi=3)
        print(f"  SW banded AFFINE align fill (band cells): "
              f"{perf['banded_align_affine_gcups']:.1f} GCUPS")

        # e2e banded pipeline at a long-read shape (fill + link + decode),
        # pointer-D2H vs device walk. Wall time of a fixed batch: the ptr
        # path ships ~win/2 bytes/row/pair, the walk 4B/row/pair (~72x).
        eb, em = 64, 4096
        ber = rng.integers(1, 5, size=(eb, em)).astype(np.uint8)
        bef = rng.integers(1, 5, size=(eb, em)).astype(np.uint8)
        for dw, key in ((False, "e2e_banded_ptr_alns_per_s"),
                        (True, "e2e_banded_walk_alns_per_s")):
            banded_align_batch(ber[:8], bef[:8], p_lin,
                               Algorithm.SMITH_WATERMAN, band=512, tile=64,
                               interpret=False, device_walk=dw)  # warm
            t0 = time.perf_counter()
            banded_align_batch(ber, bef, p_lin, Algorithm.SMITH_WATERMAN,
                               band=512, tile=64, interpret=False,
                               device_walk=dw)
            perf[key] = round(eb / (time.perf_counter() - t0), 2)
        print(f"  e2e 4k x 4k banded SW align: pointer-D2H "
              f"{perf['e2e_banded_ptr_alns_per_s']} alns/s, device-walk "
              f"{perf['e2e_banded_walk_alns_per_s']} alns/s (tunnel)")

    failures = sum(1 for ok in checks.values() if not ok)
    rnd = _infer_round()
    if not perf:
        # --quick / --no-perf runs keep the last full run's perf numbers so
        # a correctness-only re-check never clobbers the round artifact.
        try:
            perf = json.loads((ROOT / "TPU_CHECK.json").read_text()).get(
                "perf", {})
        except (OSError, ValueError):
            perf = {}
    artifact = {
        "round": rnd,
        "platform": platform,
        "device_kind": getattr(jax.devices()[0], "device_kind", platform),
        "quick": args.quick,
        "checks": checks,
        "perf": perf,
        "failures": failures,
    }
    for name in ("TPU_CHECK.json", f"TPU_CHECK_r{rnd:02d}.json"):
        (ROOT / name).write_text(json.dumps(artifact, indent=2) + "\n")
    print(f"\n{failures} failures — wrote TPU_CHECK_r{rnd:02d}.json")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
