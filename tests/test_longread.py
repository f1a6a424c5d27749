"""Seed-chain-extend long-read mapping: minimizers, chaining, extension."""

import numpy as np
import pytest

from versalignlib_tpu.alphabet import reverse_complement
from versalignlib_tpu.longread import find_chains, map_long_reads
from versalignlib_tpu.params import AlignmentParameters
from versalignlib_tpu.seed import MinimizerIndex, build_index, minimizers


@pytest.fixture
def default_params():
    return AlignmentParameters()


def _mutate(rng, s, sub=0.04, ind=0.008):
    bases = np.array(list("ACGT"))
    out = []
    for ch in s:
        r = rng.random()
        if r < ind / 2:
            continue
        if r < ind:
            out.append(str(rng.choice(bases)))
        out.append(str(rng.choice(bases)) if rng.random() < sub else ch)
    return "".join(out)


def test_minimizer_invariants(rng):
    bases = np.array(list("ACGT"))
    seq = "".join(rng.choice(bases, size=20_000))
    pos, h, s = minimizers(seq, k=15, w=10)
    # Density ~ 2/(w+1); positions strictly increasing; windows covered.
    assert 0.15 < pos.size / len(seq) < 0.22
    assert np.all(np.diff(pos) > 0)
    assert np.all(np.diff(pos) <= 10 + 15)
    # Canonical hashing: the reverse complement yields the same hash set.
    _, h2, _ = minimizers(reverse_complement(seq), k=15, w=10)
    assert set(map(int, h)) == set(map(int, h2))
    # N poisoning: no minimizer k-mer covers an N.
    seqN = seq[:300] + "N" * 5 + seq[305:600]
    posN, _, _ = minimizers(seqN, k=15, w=10)
    assert all("N" not in seqN[p : p + 15] for p in posN)


def test_index_build_chunked_and_save(tmp_path, rng):
    bases = np.array(list("ACGT"))
    refs = ["".join(rng.choice(bases, size=30_000)),
            "".join(rng.choice(bases, size=7_000))]
    idx = build_index(refs, k=15, w=10, chunk=4096)
    whole = build_index(refs, k=15, w=10)  # default chunk >> lengths
    assert len(idx) == len(whole)
    assert np.array_equal(np.sort(idx.pos[idx.ref_id == 0]),
                          np.sort(whole.pos[whole.ref_id == 0]))
    idx.save(tmp_path / "mi.npz")
    idx2 = MinimizerIndex.load(tmp_path / "mi.npz")
    assert np.array_equal(idx.hashes, idx2.hashes)
    assert idx2.ref_lengths == (30_000, 7_000)


def test_find_chains_locates_and_strands(rng, default_params):
    bases = np.array(list("ACGT"))
    genome = "".join(rng.choice(bases, size=20_000))
    idx = build_index([genome], k=15, w=10)
    read = _mutate(rng, genome[8_000:8_400])
    chains = find_chains(read, idx)
    assert chains and chains[0].strand == 0
    assert abs(chains[0].r_lo - 8_000) < 100
    rc_chains = find_chains(reverse_complement(read), idx)
    assert rc_chains and rc_chains[0].strand == 1
    assert abs(rc_chains[0].r_lo - 8_000) < 100
    # Junk read: no chains.
    assert find_chains("".join(rng.choice(bases, size=300)), idx,
                       min_anchors=3) == []


def test_map_long_reads_end_to_end(rng, default_params):
    bases = np.array(list("ACGT"))
    genome = "".join(rng.choice(bases, size=20_000))
    positions = [2_000, 11_000]
    reads = [_mutate(rng, genome[p : p + 350]) for p in positions]
    reads[1] = reverse_complement(reads[1])
    reads.append("".join(rng.choice(bases, size=300)))  # unmapped junk
    hits = map_long_reads(reads, [genome], default_params)
    for i, p in enumerate(positions):
        a = hits.alignments[i]
        assert a is not None and abs(a.ref_start - p) < 40, (i, a.ref_start)
        assert a.read_end - a.read_start > 300   # covers most of the read
        assert int(hits.strand[i]) == i
        assert int(hits.mapq[i]) > 0
        assert int(hits.pos[i]) == a.ref_start
    assert int(hits.ref_id[2]) == -1 and hits.alignments[2] is None


def test_map_long_reads_repeat_mapq_and_index_reuse(rng, default_params):
    bases = np.array(list("ACGT"))
    unit = "".join(rng.choice(bases, size=600))
    # Two copies of the same unit far apart: ambiguous locus -> low MAPQ.
    genome = (unit + "".join(rng.choice(bases, size=8_000)) + unit
              + "".join(rng.choice(bases, size=2_000)))
    idx = build_index([genome], k=15, w=10)
    read = _mutate(rng, unit[100:450], sub=0.02, ind=0.0)
    hits = map_long_reads([read], (idx, [genome]), default_params)
    assert int(hits.ref_id[0]) == 0
    assert int(hits.mapq[0]) < 10          # secondary chain ~ primary
    # A unique read through the same prebuilt index gets high MAPQ.
    uniq = _mutate(rng, genome[3_000:3_350], sub=0.02, ind=0.0)
    hits2 = map_long_reads([uniq], (idx, [genome]), default_params)
    assert int(hits2.mapq[0]) >= 30
    assert abs(int(hits2.pos[0]) - 3_000) < 40


def test_cli_long_mode(tmp_path, rng):
    from versalignlib_tpu.cli import main
    from versalignlib_tpu.io.fasta import write_fasta
    from versalignlib_tpu.io.fastq import write_fastq

    bases = np.array(list("ACGT"))
    genome = "".join(rng.choice(bases, size=12_000))
    reads = [_mutate(rng, genome[4_000:4_300]),
             "".join(rng.choice(bases, size=250))]   # second: junk
    quals = ["".join(chr(33 + int(q))
                     for q in rng.integers(2, 41, size=len(r)))
             for r in reads]
    rf = tmp_path / "reads.fastq"
    gf = tmp_path / "genome.fa"
    write_fastq(rf, reads, names=["good", "junk"], qualities=quals)
    write_fasta(gf, [genome], names=["chrL"])
    rc = main(["--reads", str(rf), "--reference", str(gf), "--long",
               "--outdir", str(tmp_path), "--sam"])
    assert rc == 0
    hits = [l.split("\t") for l in
            (tmp_path / "hits_long.tsv").read_text().splitlines()]
    assert hits[0][:3] == ["read", "ref", "ref_id"]
    assert hits[1][0] == "good" and hits[1][1] == "chrL"
    assert abs(int(hits[1][3]) - 4_000) < 40
    assert hits[2][1] == "*" and hits[2][2] == "-1"
    sam = (tmp_path / "alignments_long.sam").read_text()
    lines = sam.splitlines()
    assert "@SQ\tSN:chrL\tLN:12000" in lines
    assert not any(l.startswith("@SQ\tSN:*") for l in lines)
    recs = {l.split("\t")[0]: l.split("\t") for l in lines
            if not l.startswith("@")}
    assert recs["good"][2] == "chrL" and recs["good"][10] == quals[0]
    assert recs["junk"][1] == "4" and recs["junk"][2] == "*"
    # Flag guards.
    with pytest.raises(SystemExit):
        main(["--reads", str(rf), "--refs", str(gf), "--long"])
    with pytest.raises(SystemExit):
        main(["--reads", str(rf), "--reference", str(gf), "--long",
              "--window", "256"])


def test_map_long_reads_multichrom(rng, default_params):
    bases = np.array(list("ACGT"))
    chr1 = "".join(rng.choice(bases, size=6_000))
    chr2 = "".join(rng.choice(bases, size=9_000))
    read = _mutate(rng, chr2[4_000:4_350], sub=0.03, ind=0.005)
    hits = map_long_reads([read], [chr1, chr2], default_params)
    assert int(hits.ref_id[0]) == 1
    assert abs(int(hits.pos[0]) - 4_000) < 40
    # DNA-only guard.
    with pytest.raises(ValueError, match="DNA-only"):
        map_long_reads([read], [chr1],
                       AlignmentParameters(score_gap_read=-3,
                                           score_gap_ref=-3,
                                           matrix=((0, 0), (0, 2))))