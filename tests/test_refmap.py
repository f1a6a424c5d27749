"""Whole-reference mapping: window tiling, top-k fold, global coordinates."""

import numpy as np
import pytest

from versalignlib_tpu import map_to_reference, tile_references
from versalignlib_tpu.alphabet import reverse_complement
from versalignlib_tpu.params import AlignmentParameters


@pytest.fixture
def default_params():
    return AlignmentParameters()


def _rand_seq(rng, n):
    return "".join(np.random.default_rng(rng).choice(list("ACGT"), size=n)
                   ) if isinstance(rng, int) else "".join(
        rng.choice(np.array(list("ACGT")), size=n))


def test_tile_references_coverage(rng):
    ref = _rand_seq(rng, 1000)
    idx = tile_references([ref], window=256, stride=128)
    # Every window starts at a stride multiple; the last covers the tail.
    assert list(idx.start) == list(range(0, 768 + 1, 128))
    assert int(idx.start[-1]) + 256 >= 1000
    assert idx.windows.shape == (len(idx), 256)
    # Window content matches the reference slice (0-padded tail).
    from versalignlib_tpu.alphabet import pad_and_encode

    enc = pad_and_encode([ref])[0]
    for w in (0, 3, len(idx) - 1):
        lo = int(idx.start[w])
        span = min(256, 1000 - lo)
        assert np.array_equal(idx.windows[w, :span], enc[lo : lo + span])
        assert not idx.windows[w, span:].any()
    # Multi-reference: windows never span references.
    idx2 = tile_references([ref[:300], ref[300:]], window=256, stride=128)
    assert list(np.unique(idx2.ref_id)) == [0, 1]
    assert int(idx2.start[np.argmax(idx2.ref_id == 1)]) == 0
    # Short reference still gets one (padded) window.
    idx3 = tile_references(["ACGT"], window=64, stride=32)
    assert len(idx3) == 1 and idx3.windows[0, :4].any()
    with pytest.raises(ValueError, match="stride"):
        tile_references([ref], window=64, stride=65)


def test_map_to_reference_planted_reads(rng, default_params):
    bases = np.array(list("ACGT"))
    ref = "".join(rng.choice(bases, size=5000))
    m = 40
    # Positions hitting window interiors AND stride boundaries (the
    # straddle case the overlap guarantees exactness for): window will be
    # 4*40 -> 160, stride 80; pos 70..110 straddles the first boundary.
    positions = [0, 70, 123, 1500, 2040, 3333, 4960 - m]
    reads, strands = [], []
    for i, p in enumerate(positions):
        s = ref[p : p + m]
        if i % 2:
            s = reverse_complement(s)
        reads.append(s)
        strands.append(i % 2)
    hits = map_to_reference(reads, [ref], default_params, backend="oracle")
    assert list(hits.ref_id) == [0] * len(reads)
    assert list(hits.strand) == strands
    assert [int(s) for s in hits.score] == [2 * m] * len(reads)  # exact
    for i, p in enumerate(positions):
        # Global alignment coordinates recover the planted locus exactly.
        assert hits.alignments[i].ref_start == p, (i, p)
        assert hits.alignments[i].ref_end == p + m
        assert hits.alignments[i].cigar == f"{m}M"
        assert hits.mapq[i] > 0  # unique locus in random sequence


def test_map_to_reference_multichrom_and_repeats(rng, default_params):
    bases = np.array(list("ACGT"))
    chr1 = "".join(rng.choice(bases, size=1200))
    chr2 = "".join(rng.choice(bases, size=800))
    m = 40
    # Unique read on chr2; repeated locus: chr1 carries two copies.
    uniq = chr2[500 : 500 + m]
    rep = chr1[100 : 100 + m]
    chr1 = chr1[:900] + rep + chr1[900 + m :]
    hits = map_to_reference([uniq, rep], [chr1, chr2], default_params,
                            backend="oracle")
    assert int(hits.ref_id[0]) == 1
    assert hits.alignments[0].ref_start == 500
    assert hits.mapq[0] > 0
    # The repeat maps to the first copy (scan order) with MAPQ 0.
    assert int(hits.ref_id[1]) == 0
    assert hits.alignments[1].ref_start == 100
    assert int(hits.mapq[1]) == 0


def test_window_index_save_load(tmp_path, rng, default_params):
    bases = np.array(list("ACGT"))
    refs = ["".join(rng.choice(bases, size=500)),
            "".join(rng.choice(bases, size=300))]
    idx = tile_references(refs, window=128, stride=64)
    idx.save(tmp_path / "idx.npz")
    from versalignlib_tpu.refmap import WindowIndex

    idx2 = WindowIndex.load(tmp_path / "idx.npz")
    assert np.array_equal(idx.windows, idx2.windows)
    assert np.array_equal(idx.start, idx2.start)
    assert (idx.window, idx.stride, idx.ref_lengths) == (
        idx2.window, idx2.stride, idx2.ref_lengths)
    read = refs[1][100:140]
    h1 = map_to_reference([read], idx, default_params, backend="oracle")
    h2 = map_to_reference([read], idx2, default_params, backend="oracle")
    assert int(h1.pos[0]) == int(h2.pos[0]) and int(h1.ref_id[0]) == 1


def test_mapq_distinct_locus_rules(rng, default_params):
    bases = np.array(list("ACGT"))
    refA = "".join(rng.choice(bases, size=120))
    read = refA[40:80]
    # Duplicate REFERENCE: the equal hit lives on another ref whose single
    # window is globally adjacent — different ref = different locus, MAPQ 0.
    h = map_to_reference([read], [refA, refA], default_params,
                         backend="oracle", window=128, stride=64)
    assert int(h.score[0]) == 80 and int(h.mapq[0]) == 0
    # Same duplicate within ONE reference, far apart: also MAPQ 0.
    refdup = refA + "".join(rng.choice(bases, size=400)) + refA[30:90]
    h = map_to_reference([read], [refdup], default_params,
                         backend="oracle", window=128, stride=64)
    assert int(h.mapq[0]) == 0
    # Unique read with an aggressive small stride: every nearby window
    # sees the same locus; MAPQ must NOT collapse (distance threshold
    # scales as ceil(window/stride)).
    ref = "".join(rng.choice(bases, size=2000))
    uread = ref[900:940]
    h = map_to_reference([uread], [ref], default_params, backend="oracle",
                         window=256, stride=32)
    assert int(h.score[0]) == 80 and int(h.mapq[0]) > 0


def test_topk_tie_prefers_lowest_window(rng, default_params):
    """A motif repeated across many tied windows must map to the FIRST
    full-score window (scan order), not an arbitrary tied one."""
    bases = np.array(list("ACGT"))
    prefix = "".join(rng.choice(bases, size=640))
    motif = "".join(rng.choice(bases, size=64))
    ref = prefix + motif * 40
    read = motif[:40]
    h = map_to_reference([read], [ref], default_params, backend="oracle",
                         window=128, stride=64, both_strands=False)
    # First window fully containing the motif start (pos 640) is window 10
    # ([640, 768)); every later motif copy ties, and some earlier window
    # may already contain a full copy — the reported window must be the
    # MINIMUM index achieving the max score.
    from versalignlib_tpu.search import score_matrix
    from versalignlib_tpu.refmap import tile_references

    idx = tile_references([ref], 128, 64)
    mat = score_matrix([read], idx.windows, default_params,
                       impl="xla")[0]
    want = int(np.flatnonzero(mat == mat.max())[0])
    assert int(h.pos[0]) == int(idx.start[want])
    assert int(h.mapq[0]) == 0  # repeats: ambiguous


def test_map_to_reference_window_index_reuse(rng, default_params):
    bases = np.array(list("ACGT"))
    ref = "".join(rng.choice(bases, size=1000))
    idx = tile_references([ref], window=160, stride=80)
    read = ref[300:340]
    h1 = map_to_reference([read], idx, default_params, backend="oracle")
    h2 = map_to_reference([read], [ref], default_params, backend="oracle",
                          window=160, stride=80)
    assert int(h1.pos[0]) == int(h2.pos[0])
    assert h1.alignments[0].ref_start == h2.alignments[0].ref_start == 300
    # Forward-only mode skips the reverse sweep.
    h3 = map_to_reference([read], idx, default_params, backend="oracle",
                          both_strands=False)
    assert int(h3.strand[0]) == 0 and int(h3.score[0]) == 80
    # Empty edges.
    h4 = map_to_reference([], idx, default_params)
    assert len(h4) == 0 and h4.alignments == []
    h5 = map_to_reference([read], tile_references([], 64, 32),
                          default_params)
    assert int(h5.ref_id[0]) == -1


def test_map_to_reference_mesh_matches_single(rng, default_params):
    from versalignlib_tpu.parallel import make_mesh

    bases = np.array(list("ACGT"))
    ref = "".join(rng.choice(bases, size=3000))
    reads = [ref[p : p + 40] for p in (55, 700, 1500, 2900)]
    reads[1] = reverse_complement(reads[1])
    single = map_to_reference(reads, [ref], default_params,
                              backend="oracle")
    sharded = map_to_reference(reads, [ref], default_params,
                               mesh=make_mesh(8))
    assert np.array_equal(single.pos, sharded.pos)
    assert np.array_equal(single.score, sharded.score)
    assert np.array_equal(single.strand, sharded.strand)
    assert np.array_equal(single.mapq, sharded.mapq)
    for a, b in zip(single.alignments, sharded.alignments):
        assert (a.ref_start, a.cigar, a.score) == (b.ref_start, b.cigar,
                                                   b.score)
    # Window-axis sharding (the many side shards; reads replicate).
    psharded = map_to_reference(reads, [ref], default_params,
                                mesh=make_mesh(8), panel_axis="panel")
    assert np.array_equal(single.pos, psharded.pos)
    assert np.array_equal(single.score, psharded.score)
    assert np.array_equal(single.strand, psharded.strand)
    assert np.array_equal(single.mapq, psharded.mapq)
    for a, b in zip(single.alignments, psharded.alignments):
        assert (a.ref_start, a.cigar, a.score) == (b.ref_start, b.cigar,
                                                   b.score)


def test_map_to_reference_overlap_warning(rng, default_params):
    bases = np.array(list("ACGT"))
    ref = "".join(rng.choice(bases, size=600))
    read = ref[100:200]  # 100bp read, window 128/stride 120 -> overlap 8
    with pytest.warns(UserWarning, match="straddle"):
        map_to_reference([read], [ref], default_params, backend="oracle",
                         window=128, stride=120, align=False)


def test_cli_reference_mode(tmp_path, rng):
    from versalignlib_tpu.cli import main
    from versalignlib_tpu.io.fasta import write_fasta
    from versalignlib_tpu.io.fastq import write_fastq

    bases = np.array(list("ACGT"))
    chrom = "".join(rng.choice(bases, size=2000))
    reads = [chrom[777 : 777 + 50], reverse_complement(chrom[1400 : 1450])]
    quals = ["".join(chr(33 + int(q)) for q in rng.integers(2, 41, size=50))
             for _ in reads]
    rf = tmp_path / "reads.fastq"
    ff = tmp_path / "genome.fasta"
    write_fastq(rf, reads, names=["rA", "rB"], qualities=quals)
    write_fasta(ff, [chrom], names=["chrTest"])
    rc = main(["--reads", str(rf), "--reference", str(ff), "--outdir",
               str(tmp_path), "--backend", "oracle", "--sam"])
    assert rc == 0
    hits = [l.split("\t") for l in
            (tmp_path / "hits_smith_waterman.tsv").read_text().splitlines()]
    assert hits[0] == ["read", "ref", "ref_id", "pos", "strand", "score",
                       "mapq"]
    assert hits[1][0] == "rA" and hits[1][1] == "chrTest"
    assert hits[1][4] == "+" and hits[2][4] == "-"
    sam = (tmp_path / "alignments_smith_waterman.sam").read_text()
    lines = sam.splitlines()
    assert f"@SQ\tSN:chrTest\tLN:2000" in lines
    recs = [l.split("\t") for l in lines if not l.startswith("@")]
    # Global 1-based POS of the planted loci.
    assert recs[0][3] == "778" and recs[1][3] == "1401"
    assert recs[0][5] == "50M" and recs[1][1] == "16"
    assert recs[0][10] == quals[0] and recs[1][10] == quals[1][::-1]
    # Mode exclusivity is an argparse error.
    with pytest.raises(SystemExit):
        main(["--reads", str(rf), "--reference", str(ff), "--panel",
              str(ff)])
    with pytest.raises(SystemExit):
        main(["--reads", str(rf), "--refs", str(ff), "--window", "64"])
    # Empty reference/panel files exit cleanly (no IndexError on -1 hits).
    empty = tmp_path / "empty.fa"
    empty.write_text("")
    assert main(["--reads", str(rf), "--reference", str(empty),
                 "--outdir", str(tmp_path)]) == 1
    assert main(["--reads", str(rf), "--panel", str(empty),
                 "--outdir", str(tmp_path)]) == 1
