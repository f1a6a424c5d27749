"""Database search (one-vs-many): cross-product scoring + best-hit align.

Additive over the reference's strict 1:1 pairwise API
(/root/reference/include/AlignmentKernel.h:34-44); semantics defined by the
pairwise oracle applied to every (read, panel[j]) pair.
"""

import numpy as np
import pytest

from tests.conftest import random_codes
from versalignlib_tpu import best_hits, score_matrix
from versalignlib_tpu.ops import gotoh, oracle
from versalignlib_tpu.params import AlignmentParameters
from versalignlib_tpu.types import Algorithm, TieBreak


def _oracle_matrix(reads, panel, p, algorithm):
    if p.affine:
        fn = (gotoh.sw_score_affine
              if algorithm == Algorithm.SMITH_WATERMAN else gotoh.nw_score_affine)
    else:
        fn = oracle.sw_score if algorithm == Algorithm.SMITH_WATERMAN else oracle.nw_score
    return np.array([[fn(r, f, p) for f in panel] for r in reads],
                    dtype=np.int32)


@pytest.mark.parametrize("algorithm", [Algorithm.SMITH_WATERMAN,
                                       Algorithm.NEEDLEMAN_WUNSCH])
def test_score_matrix_matches_oracle(rng, default_params, algorithm):
    reads = random_codes(rng, 5, 12, padded=True, n_prob=0.1)
    panel = random_codes(rng, 7, 16, padded=True, n_prob=0.1)
    got = score_matrix(reads, panel, default_params, algorithm)
    want = _oracle_matrix(reads, panel, default_params, algorithm)
    np.testing.assert_array_equal(got, want)


def test_score_matrix_chunking_invariant(rng, default_params):
    reads = random_codes(rng, 4, 10)
    panel = random_codes(rng, 9, 14)
    full = score_matrix(reads, panel, default_params)
    # max_pairs tiny -> panel streams in 1-ref chunks; result identical.
    chunked = score_matrix(reads, panel, default_params, max_pairs=4)
    np.testing.assert_array_equal(full, chunked)


def test_score_matrix_affine(rng):
    p = AlignmentParameters(score_match=2, score_mismatch=-1,
                            score_gap_read=-1, score_gap_ref=-1,
                            gap_open_read=-4, gap_open_ref=-4)
    reads = random_codes(rng, 3, 10, padded=True)
    panel = random_codes(rng, 5, 12, padded=True)
    got = score_matrix(reads, panel, p, Algorithm.SMITH_WATERMAN)
    want = _oracle_matrix(reads, panel, p, Algorithm.SMITH_WATERMAN)
    np.testing.assert_array_equal(got, want)


def test_best_hits_argmax_and_alignments(rng, default_params):
    reads = random_codes(rng, 6, 12, padded=True)
    panel = random_codes(rng, 11, 15, padded=True)
    mat = _oracle_matrix(reads, panel, default_params, Algorithm.SMITH_WATERMAN)
    arg, best, alns = best_hits(reads, panel, default_params,
                                Algorithm.SMITH_WATERMAN, backend="oracle",
                                max_pairs=16)  # force multi-chunk fold
    np.testing.assert_array_equal(best, mat.max(axis=1))
    np.testing.assert_array_equal(arg, mat.argmax(axis=1))  # first-win ties
    want = oracle.compute_alignments(
        Algorithm.SMITH_WATERMAN, reads, panel[arg], default_params,
        TieBreak.DIAG_UP_LEFT)
    for g, w in zip(alns, want):
        assert (g.read, g.ref, g.score, g.cigar) == (w.read, w.ref, w.score, w.cigar)
    assert all(int(b) == a.score for b, a in zip(best, alns))


def test_best_hits_tie_prefers_lowest_index(rng, default_params):
    read = random_codes(rng, 1, 10)
    ref = random_codes(rng, 1, 12)
    panel = np.concatenate([ref, ref, ref])  # identical refs: tie everywhere
    arg, best, alns = best_hits(read, panel, default_params,
                                Algorithm.SMITH_WATERMAN, backend="oracle",
                                max_pairs=1)  # one ref per chunk
    assert arg[0] == 0
    assert alns[0].score == int(best[0])


def test_best_hits_align_false_and_empty(rng, default_params):
    reads = random_codes(rng, 3, 8)
    panel = random_codes(rng, 4, 8)
    arg, best, alns = best_hits(reads, panel, default_params, align=False)
    assert alns is None and arg.shape == (3,)
    arg, best, alns = best_hits(np.zeros((0, 8), np.uint8), panel,
                                default_params)
    assert arg.size == 0 and best.size == 0 and alns == []
    # Empty panel: no fabricated hit 0 — index -1 and int32-min scores.
    arg, best, alns = best_hits(reads, np.zeros((0, 8), np.uint8),
                                default_params)
    assert (arg == -1).all() and (best == np.iinfo(np.int32).min).all()


def test_search_mesh_matches_single(rng, default_params):
    from versalignlib_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    reads = random_codes(rng, 10, 12, padded=True)  # B % 8 != 0: pad path
    panel = random_codes(rng, 6, 15, padded=True)
    single = score_matrix(reads, panel, default_params)
    sharded = score_matrix(reads, panel, default_params, mesh=mesh,
                           max_pairs=32)
    np.testing.assert_array_equal(sharded, single)
    arg, best, alns = best_hits(reads, panel, default_params, mesh=mesh)
    arg1, best1, alns1 = best_hits(reads, panel, default_params,
                                   backend="oracle")
    np.testing.assert_array_equal(arg, arg1)
    np.testing.assert_array_equal(best, best1)
    # Panel-axis sharding: the many side shards, device-local top-k folds.
    psharded = score_matrix(reads, panel, default_params, mesh=mesh,
                            max_pairs=32, panel_axis="panel")
    np.testing.assert_array_equal(psharded, single)
    arg_p, best_p, _ = best_hits(reads, panel, default_params, mesh=mesh,
                                 align=False, panel_axis="panel",
                                 max_pairs=32)
    np.testing.assert_array_equal(arg_p, arg1)
    np.testing.assert_array_equal(best_p, best1)
    for g, w in zip(alns, alns1):
        assert (g.read, g.ref, g.score, g.cigar) == (w.read, w.ref, w.score, w.cigar)


def test_cli_panel_mode(tmp_path, rng):
    from versalignlib_tpu.cli import main
    from versalignlib_tpu.io.fasta import write_fasta
    from versalignlib_tpu.io.fastq import write_fastq

    bases = np.array(list("ACGT"))
    panel = ["".join(rng.choice(bases, size=40)) for _ in range(5)]
    # Reads copied from panel entries (with a mutation) -> known best hits.
    reads = [panel[3][:30], panel[1][5:35], "T" + panel[4][1:30]]
    rq = tmp_path / "reads.fastq"
    pf = tmp_path / "panel.fasta"
    write_fastq(rq, reads)
    write_fasta(pf, panel, names=[f"p{i}" for i in range(5)])
    rc = main(["--reads", str(rq), "--panel", str(pf),
               "--outdir", str(tmp_path), "--backend", "oracle", "--sam"])
    assert rc == 0
    hits = [l.split("\t") for l in
            (tmp_path / "hits_smith_waterman.tsv").read_text().splitlines()[1:]]
    assert [h[1] for h in hits] == ["p3", "p1", "p4"]
    assert int(hits[0][4]) == 60  # 30 exact matches at +2
    assert all(h[3] == "+" for h in hits)
    sam = (tmp_path / "alignments_smith_waterman.sam").read_text()
    assert "@SQ\tSN:p3\tLN:40" in sam
    assert len([l for l in sam.splitlines() if not l.startswith("@")]) == 3


def test_reverse_complement_codes_padding_aware(rng):
    from versalignlib_tpu.alphabet import (encode, reverse_complement,
                                           reverse_complement_codes)

    codes = encode("ACGTN")
    np.testing.assert_array_equal(reverse_complement_codes(codes),
                                  encode("NACGT"))
    # Padding stays trailing.
    batch = np.array([[1, 2, 3, 0, 0], [4, 4, 4, 4, 1]], dtype=np.uint8)
    rc = reverse_complement_codes(batch)
    np.testing.assert_array_equal(rc[0], [4, 1, 2, 0, 0])  # rc(ATC)=GAT
    np.testing.assert_array_equal(rc[1], [2, 3, 3, 3, 3])  # rc(GGGGA)=TCCCC
    assert reverse_complement("AcGTn") == "nACgT"
    with pytest.raises(ValueError, match="DNA"):
        reverse_complement_codes(np.array([7], dtype=np.uint8))


def test_map_reads_both_strands(rng, default_params):
    from versalignlib_tpu import map_reads
    from versalignlib_tpu.alphabet import encode, pad_and_encode, reverse_complement

    panel = ["ACGTACGTACGTACGTACGT", "TTTTTTTTTTGGGGGGGGGG"]
    fwd_read = panel[0][2:14]                      # maps forward to p0
    rev_read = reverse_complement(panel[1][4:16])  # maps reverse to p1
    hits = map_reads([fwd_read, rev_read], panel, default_params,
                     backend="oracle")
    np.testing.assert_array_equal(hits.index, [0, 1])
    np.testing.assert_array_equal(hits.strand, [0, 1])
    assert int(hits.score[0]) == 2 * len(fwd_read)
    assert int(hits.score[1]) == 2 * len(rev_read)
    # Reverse-strand alignment is in revcomp read coordinates.
    assert hits.alignments[1].read == reverse_complement(rev_read)
    assert hits.alignments[1].score == int(hits.score[1])
    # Forward-only mapping misses the reverse read.
    fwd_only = map_reads([fwd_read, rev_read], panel, default_params,
                         backend="oracle", both_strands=False)
    assert int(fwd_only.score[1]) < int(hits.score[1])
    assert fwd_only.strand[1] == 0

    # Strict-> merge: forward wins exact ties (palindromic read).
    pal = "ACGT" * 3  # revcomp(ACGTACGTACGT) == itself
    h = map_reads([pal], [pal], default_params, backend="oracle")
    assert h.strand[0] == 0
    # Palindrome: reverse orientation ties the winner -> ambiguous, MAPQ 0.
    assert int(h.mapq[0]) == 0


def test_map_reads_mapq(rng, default_params):
    from versalignlib_tpu import map_reads

    panel = ["ACGTACGTACGTACGTACGT", "TTTTCCCCAAAAGGGGTTCC"]
    read = panel[0][:12]
    # Duplicate best entries -> exact tie -> MAPQ 0.
    h = map_reads([read], [panel[0], panel[0]], default_params,
                  backend="oracle", both_strands=False)
    assert int(h.mapq[0]) == 0
    # Distinct entries: gap-scaled MAPQ, min(60, 6*gap/match).
    h = map_reads([read], panel, default_params, backend="oracle",
                  both_strands=False, max_pairs=1)  # cross-chunk top-2 merge
    gap = 2 * 12 - int(
        map_reads([read], [panel[1]], default_params, backend="oracle",
                  both_strands=False).score[0])
    assert int(h.mapq[0]) == min(60, 6 * gap // 2)
    # Single-entry panel: no second candidate -> 60.
    h = map_reads([read], [panel[0]], default_params, backend="oracle",
                  both_strands=False)
    assert int(h.mapq[0]) == 60

    # matrix mode + both_strands is rejected (no DNA complement).
    from versalignlib_tpu import map_reads as _mr
    from versalignlib_tpu.alphabet import encode, pad_and_encode

    mat = AlignmentParameters(score_gap_read=-3, score_gap_ref=-3,
                              matrix=((0, 0), (0, 3)))
    with pytest.raises(ValueError, match="DNA-only"):
        _mr(pad_and_encode(["ACGT"]), np.array([encode("A")]), mat)


def test_cli_panel_both_strands(tmp_path, rng):
    from versalignlib_tpu.alphabet import reverse_complement
    from versalignlib_tpu.cli import main
    from versalignlib_tpu.io.fasta import write_fasta

    bases = np.array(list("ACGT"))
    panel = ["".join(rng.choice(bases, size=40)) for _ in range(3)]
    reads = [panel[0][:24], reverse_complement(panel[2][8:32])]
    rf = tmp_path / "reads.fasta"
    pf = tmp_path / "panel.fasta"
    write_fasta(rf, reads)
    write_fasta(pf, panel, names=["p0", "p1", "p2"])
    rc = main(["--reads", str(rf), "--panel", str(pf), "--both-strands",
               "--outdir", str(tmp_path), "--backend", "oracle", "--sam"])
    assert rc == 0
    hits = [l.split("\t") for l in
            (tmp_path / "hits_smith_waterman.tsv").read_text().splitlines()[1:]]
    assert [(h[1], h[3]) for h in hits] == [("p0", "+"), ("p2", "-")]
    recs = [l.split("\t") for l in
            (tmp_path / "alignments_smith_waterman.sam").read_text().splitlines()
            if not l.startswith("@")]
    assert recs[0][1] == "0" and recs[1][1] == "16"
    # Reverse record's SEQ is the revcomp'd read (alignment orientation).
    assert recs[1][9] == reverse_complement(reads[1])


def test_cli_panel_fastq_names_and_quals(tmp_path, rng):
    from versalignlib_tpu.alphabet import reverse_complement
    from versalignlib_tpu.cli import main
    from versalignlib_tpu.io.fasta import write_fasta
    from versalignlib_tpu.io.fastq import write_fastq

    bases = np.array(list("ACGT"))
    panel = ["".join(rng.choice(bases, size=40)) for _ in range(2)]
    reads = [panel[0][:24], reverse_complement(panel[1][8:32])]
    quals = ["".join(chr(33 + int(q)) for q in rng.integers(2, 41, size=24))
             for _ in reads]
    rf = tmp_path / "reads.fastq"
    pf = tmp_path / "panel.fasta"
    write_fastq(rf, reads, names=["readA", "readB"], qualities=quals)
    write_fasta(pf, panel, names=["p0", "p1"])
    rc = main(["--reads", str(rf), "--panel", str(pf), "--both-strands",
               "--outdir", str(tmp_path), "--backend", "oracle", "--sam"])
    assert rc == 0
    hits = [l.split("\t") for l in
            (tmp_path / "hits_smith_waterman.tsv").read_text().splitlines()[1:]]
    # FASTQ names flow into the hits TSV.
    assert [h[0] for h in hits] == ["readA", "readB"]
    recs = {l.split("\t")[0]: l.split("\t") for l in
            (tmp_path / "alignments_smith_waterman.sam").read_text().splitlines()
            if not l.startswith("@")}
    assert set(recs) == {"readA", "readB"}
    # Forward record: QUAL verbatim; reverse record: QUAL reversed.
    assert recs["readA"][10] == quals[0]
    assert recs["readB"][1] == "16" and recs["readB"][10] == quals[1][::-1]
    # Perfect matches: NM 0 and a pure-match MD.
    assert "NM:i:0" in recs["readA"] and "MD:Z:24" in recs["readA"]


def test_map_read_pairs_layouts(rng, default_params):
    from versalignlib_tpu import map_read_pairs, map_reads
    from versalignlib_tpu.alphabet import reverse_complement

    bases = np.array(list("ACGT"))
    panel = ["".join(rng.choice(bases, size=60)) for _ in range(3)]
    frag1 = panel[1][5:45]
    frag2 = panel[2][10:50]
    # Pair 0: FR layout onto entry 1; pair 1: RF layout onto entry 2.
    reads1 = [frag1[:18], reverse_complement(frag2[:18])]
    reads2 = [reverse_complement(frag1[22:]), frag2[22:]]
    h = map_read_pairs(reads1, reads2, panel, default_params,
                       backend="oracle")
    assert list(h.index) == [1, 2]
    assert list(h.orient) == [0, 1]
    assert list(h.strand1) == [0, 1] and list(h.strand2) == [1, 0]
    # Combined score == sum of the two mates' own best-vs-that-entry scores.
    s1 = map_reads(reads1[:1], [panel[1]], default_params, backend="oracle",
                   align=False).score[0]
    s2 = map_reads(reads2[:1], [panel[1]], default_params, backend="oracle",
                   align=False).score[0]
    assert int(h.score[0]) == int(s1) + int(s2)
    assert h.mapq[0] > 0
    # Tracebacks are of the ORIENTED mates vs the winning entry.
    assert h.alignments1[0].cigar == "18M"
    assert h.alignments2[0].cigar == "18M"
    assert h.alignments2[0].ref_start == 27  # frag1[22:] sits at 5+22
    assert h.alignments1[1].cigar == "18M"   # RF mate1 aligns as revcomp


def test_map_read_pairs_joint_entry_choice(rng, default_params):
    """The pair maps where the COMBINED score wins, even when mate 1
    alone prefers a different entry."""
    from versalignlib_tpu import map_read_pairs, map_reads
    from versalignlib_tpu.alphabet import reverse_complement

    bases = np.array(list("ACGT"))
    r1 = "".join(rng.choice(bases, size=20))
    r2rc = "".join(rng.choice(bases, size=20))
    filler = lambda n: "".join(rng.choice(bases, size=n))
    # Entry A: exact R1, no R2. Entry B: R1 with 2 mismatches, exact R2.
    r1_mm = list(r1)
    r1_mm[5] = {"A": "C", "C": "A", "G": "T", "T": "G"}[r1_mm[5]]
    r1_mm[12] = {"A": "C", "C": "A", "G": "T", "T": "G"}[r1_mm[12]]
    entry_a = filler(10) + r1 + filler(30)
    entry_b = filler(10) + "".join(r1_mm) + filler(5) + r2rc + filler(5)
    panel = [entry_a, entry_b]
    h = map_read_pairs([r1], [reverse_complement(r2rc)], panel,
                       default_params, backend="oracle", align=False)
    # Mate 1 alone prefers A...
    solo = map_reads([r1], panel, default_params, backend="oracle",
                     align=False, both_strands=False)
    assert solo.index[0] == 0
    # ...but the pair lands on B (34 + 40 beats 40 + noise).
    assert h.index[0] == 1 and h.orient[0] == 0


def test_map_read_pairs_validation(default_params):
    from versalignlib_tpu import map_read_pairs
    from versalignlib_tpu.params import AlignmentParameters

    with pytest.raises(ValueError, match="mate counts"):
        map_read_pairs(["AC"], [], ["ACGT"], default_params)
    mat = AlignmentParameters(score_gap_read=-3, score_gap_ref=-3,
                              matrix=((0, 0), (0, 3)))
    with pytest.raises(ValueError, match="DNA-only"):
        map_read_pairs(["AC"], ["GT"], ["ACGT"], mat)
    h = map_read_pairs(["AC"], ["GT"], [], default_params)
    assert len(h) == 1 and h.index[0] == -1
    # Empty panel still yields index-aligned placeholder alignments that
    # SAM-serialize as unmapped records.
    from versalignlib_tpu.io.sam import sam_record

    assert len(h.alignments1) == len(h.alignments2) == 1
    rec = sam_record(h.alignments1[0], "AC", "r", "c").split("\t")
    assert rec[1] == "4" and rec[5] == "*"


def test_write_sam_paired_flags_and_tlen(rng, default_params):
    import io as _io

    from versalignlib_tpu import map_read_pairs
    from versalignlib_tpu.alphabet import reverse_complement
    from versalignlib_tpu.io.sam import write_sam_paired

    bases = np.array(list("ACGT"))
    panel = ["".join(rng.choice(bases, size=60))]
    frag = panel[0][5:45]                      # fragment spans ref [5, 45)
    reads1 = [frag[:18]]
    reads2 = [reverse_complement(frag[22:])]
    h = map_read_pairs(reads1, reads2, panel, default_params,
                       backend="oracle")
    o1 = [reverse_complement(r) if s else r
          for r, s in zip(reads1, h.strand1)]
    o2 = [reverse_complement(r) if s else r
          for r, s in zip(reads2, h.strand2)]
    buf = _io.StringIO()
    write_sam_paired(buf, h.alignments1, h.alignments2, o1, o2,
                     [panel[j] for j in h.index], read_names=["frag0"],
                     ref_names=["chr1"], strands1=h.strand1,
                     strands2=h.strand2, mapqs=h.mapq)
    recs = [l.split("\t") for l in buf.getvalue().splitlines()
            if not l.startswith("@")]
    assert len(recs) == 2
    r1, r2 = recs
    # Canonical proper FR pair: 99 (paired+proper+mate-rev+first) and
    # 147 (paired+proper+rev+second).
    assert int(r1[1]) == 0x1 | 0x2 | 0x20 | 0x40 == 99
    assert int(r2[1]) == 0x1 | 0x2 | 0x10 | 0x80 == 147
    assert r1[0] == r2[0] == "frag0"
    # POS/PNEXT cross-link; TLEN is the signed outer fragment span.
    assert r1[3] == "6" and r2[3] == "28"      # 1-based 5 and 27
    assert r1[6] == "=" and r2[6] == "="
    assert r1[7] == r2[3] and r2[7] == r1[3]
    assert int(r1[8]) == 40 and int(r2[8]) == -40
    assert r1[5] == "18M" and r2[5] == "18M"


def test_map_read_pairs_mesh_matches_single(rng, default_params):
    from versalignlib_tpu import map_read_pairs
    from versalignlib_tpu.alphabet import reverse_complement
    from versalignlib_tpu.parallel import make_mesh

    bases = np.array(list("ACGT"))
    panel = ["".join(rng.choice(bases, size=48)) for _ in range(3)]
    frags = [panel[i % 3][4:40] for i in range(9)]
    reads1 = [f[:16] for f in frags]
    reads2 = [reverse_complement(f[20:]) for f in frags]
    single = map_read_pairs(reads1, reads2, panel, default_params,
                            backend="oracle")
    mesh = make_mesh(8)
    sharded = map_read_pairs(reads1, reads2, panel, default_params,
                             mesh=mesh)
    assert np.array_equal(single.index, sharded.index)
    assert np.array_equal(single.score, sharded.score)
    assert np.array_equal(single.orient, sharded.orient)
    assert np.array_equal(single.mapq, sharded.mapq)
    for a, b in zip(single.alignments1, sharded.alignments1):
        assert (a.read, a.ref, a.score, a.cigar) == (b.read, b.ref, b.score,
                                                     b.cigar)


def test_cli_paired_panel(tmp_path, rng):
    from versalignlib_tpu.alphabet import reverse_complement
    from versalignlib_tpu.cli import main
    from versalignlib_tpu.io.fasta import write_fasta
    from versalignlib_tpu.io.fastq import write_fastq

    bases = np.array(list("ACGT"))
    panel = ["".join(rng.choice(bases, size=60)) for _ in range(2)]
    frag = panel[1][5:45]
    reads1 = [frag[:18]]
    reads2 = [reverse_complement(frag[22:])]
    q1 = ["".join(chr(33 + int(q)) for q in rng.integers(2, 41, size=18))]
    q2 = ["".join(chr(33 + int(q)) for q in rng.integers(2, 41, size=18))]
    r1f = tmp_path / "r1.fastq"
    r2f = tmp_path / "r2.fastq"
    pf = tmp_path / "panel.fasta"
    write_fastq(r1f, reads1, names=["frag0"], qualities=q1)
    write_fastq(r2f, reads2, names=["frag0"], qualities=q2)
    write_fasta(pf, panel, names=["p0", "p1"])
    rc = main(["--reads", str(r1f), "--reads2", str(r2f), "--panel",
               str(pf), "--outdir", str(tmp_path), "--backend", "oracle",
               "--sam"])
    assert rc == 0
    hits = [l.split("\t") for l in
            (tmp_path / "hits_smith_waterman.tsv").read_text().splitlines()]
    assert hits[0][:4] == ["fragment", "hit", "hit_index", "orient"]
    assert hits[1][:4] == ["frag0", "p1", "1", "FR"]
    recs = [l.split("\t") for l in
            (tmp_path / "alignments_smith_waterman.sam").read_text().splitlines()
            if not l.startswith("@")]
    assert [int(r[1]) for r in recs] == [99, 147]
    # Mate 2 is reverse: SEQ revcomp'd, QUAL reversed.
    assert recs[1][9] == reverse_complement(reads2[0])
    assert recs[0][10] == q1[0] and recs[1][10] == q2[0][::-1]
    # Validation: --reads2 without --panel is an argparse error.
    with pytest.raises(SystemExit):
        main(["--reads", str(r1f), "--reads2", str(r2f), "--refs", str(pf)])


def test_search_accepts_strings(default_params):
    arg, best, alns = best_hits(
        ["ACGTACGT"], ["TTTTTTTT", "CCACGTACGTCC"], default_params,
        backend="oracle")
    assert arg[0] == 1
    assert alns[0].cigar == "8M"
    assert int(best[0]) == 16
