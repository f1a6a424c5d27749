"""Six-frame translation + translated search (translate.py).

Translation is gated against hand-checked codons and strand/frame
identities; the search end-to-end plants reverse-translated peptides in
DNA (forward and reverse-complement frames) and must recover the panel
entry, the frame, and a score equal to scoring the translation directly.
"""

import numpy as np
import pytest

from versalignlib_tpu.alphabet import PROTEIN_ALPHABET, encode_custom, pad_and_encode
from versalignlib_tpu.translate import (FRAMES, GENETIC_CODE,
                                        TRANSLATED_PARAMETERS,
                                        translate_codes,
                                        translate_six_frames,
                                        translated_search)
from versalignlib_tpu.types import Algorithm

#: one codon per amino acid for reverse translation in tests
_REV = {}
for _codon, _aa in GENETIC_CODE.items():
    _REV.setdefault(_aa, _codon)


def _rc(s: str) -> str:
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


def test_known_codons_and_stops():
    frames = dict(translate_six_frames("ATGAAATAG"))
    assert frames[1] == "MK*"
    assert frames[2] == "*N"    # TGA AAT AG -> * N
    assert frames[3] == "EI"    # GAA ATA G  -> E I
    # Reverse frames read the reverse complement: revcomp = CTATTTCAT.
    assert frames[-1] == "LFH"   # CTA TTT CAT
    assert frames[-2] == "YF"    # TAT TTC
    assert frames[-3] == "IS"    # ATT TCA


def test_ambiguous_and_padding_codons():
    frames = dict(translate_six_frames("ATGNAATAG"))
    assert frames[1] == "MX*"   # NAA -> X
    codes = pad_and_encode(["ATGAAA", "ATG"])  # second padded with 0s
    assert translate_codes(codes[1], 1) == "MX"  # A A A? no: ATG + pad pad pad
    assert translate_codes(codes[0], 1) == "MK"


def test_every_codon_translates():
    for codon, aa in GENETIC_CODE.items():
        assert dict(translate_six_frames(codon))[1] == aa


def test_translated_search_recovers_frame_and_entry(rng):
    peptides = ["MKTAYIAKQRQISFVKSHFSRQ", "GAVLIMFWPSTCYNQDEKRH",
                "WWHHEEKKLLNNAA"]
    panel = peptides + ["MNDEKRHWWYYFFPP"]  # decoy

    def dna_for(pep):
        return "".join(_REV[a] for a in pep)

    reads, want = [], []
    # Forward frame 2: one junk base, then the codons.
    reads.append("C" + dna_for(peptides[0]) + "GG")
    want.append((0, 2))
    # Reverse frame -1: reverse-complement of the coding strand.
    reads.append(_rc(dna_for(peptides[1])))
    want.append((1, -1))
    # Forward frame 3 with junk flanks.
    reads.append("AC" + dna_for(peptides[2]) + "T")
    want.append((2, 3))
    hits = translated_search(reads, panel)
    for i, (widx, wframe) in enumerate(want):
        assert hits.index[i] == widx, (i, hits.index[i], hits.frame[i])
        assert hits.frame[i] == wframe, (i, hits.frame[i])
        # The best score equals directly scoring that frame's translation.
        from versalignlib_tpu.search import score_matrix

        q = encode_custom([hits.proteins[i][FRAMES.index(wframe)]],
                          PROTEIN_ALPHABET)
        p = encode_custom([panel[widx]], PROTEIN_ALPHABET)
        direct = score_matrix(q, p, TRANSLATED_PARAMETERS,
                              Algorithm.SMITH_WATERMAN)[0, 0]
        assert hits.score[i] == direct


def test_translated_search_requires_matrix():
    from versalignlib_tpu.params import AlignmentParameters

    with pytest.raises(ValueError, match="matrix"):
        translated_search(["ACGT"], ["MK"], params=AlignmentParameters())


def test_cli_translated_mode(tmp_path):
    """--translated end-to-end: DNA reads vs protein panel, frame column."""
    from versalignlib_tpu.cli import main

    coding = "".join(_REV[a] for a in "MKWHHEEKLLNN")
    with open(tmp_path / "reads.fa", "w") as f:
        f.write(f">r0\nC{coding}GT\n")          # frame +2
        f.write(f">r1\n{_rc(coding)}\n")        # reverse frame
    with open(tmp_path / "panel.fa", "w") as f:
        f.write(">target\nMKWHHEEKLLNN\n>decoy\nWWYYFFPPCCGG\n")
    rc = main(["--translated", "--reads", str(tmp_path / "reads.fa"),
               "--panel", str(tmp_path / "panel.fa"),
               "--outdir", str(tmp_path)])
    assert rc == 0
    lines = (tmp_path / "hits_translated.tsv").read_text().splitlines()
    assert lines[0].startswith(
        "read\tpanel_index\tpanel_name\tframe\tscore\tdna_start")
    r0 = lines[1].split("\t")
    r1 = lines[2].split("\t")
    assert r0[1] == "0" and r0[3] == "+2"
    assert r1[1] == "0" and r1[3].startswith("-")
    # coordinates: the +2 hit starts at read offset 1 (after the 'C' pad)
    # and spans whole codons on the forward strand
    assert int(r0[5]) == 1 and r0[7] == "+"
    assert (int(r0[6]) - int(r0[5]) + 1) % 3 == 0
    assert r1[7] == "-"


# ---------------------------------------------------------------------------
# Winning-frame alignments + DNA coordinate mapping (round-5 parity)
# ---------------------------------------------------------------------------

def test_translated_alignments_roundtrip():
    """alignments=True: the reported DNA range translates back (through the
    reported frame) to exactly the aligned protein residues, both strands."""
    from versalignlib_tpu.alphabet import encode
    from versalignlib_tpu.translate import translate_codes, translated_search

    coding = "".join(_REV[a] for a in "MKWHHEEKLLNN")
    dna = "C" + coding + "GT"
    reads = [dna, _rc(dna)]
    panel = ["MKWHHEEKLLNN", "WWYYFFPPCCGG"]
    th = translated_search(reads, panel, alignments=True)
    for i, read in enumerate(reads):
        ds, de = int(th.dna_start[i]), int(th.dna_end[i])
        assert 0 <= ds <= de < len(read)
        sub = read[ds:de + 1]
        if th.strand[i] == "-":
            sub = _rc(sub)
        back = translate_codes(encode(sub), 1)
        assert back == th.alignments[i].read.replace("-", "")
        assert th.alignments[i].score == int(th.score[i])


def test_translated_dna_cigar_scaling():
    from versalignlib_tpu.translate import _scale_cigar_dna

    assert _scale_cigar_dna("9M") == "27M"
    assert _scale_cigar_dna("2M1I3M1D4M") == "6M3I9M3D12M"


def test_map_protein_to_dna_inverse():
    """Forward/reverse frame coordinate maps are mutually consistent."""
    from versalignlib_tpu.translate import map_protein_to_dna

    L = 31
    for f in (1, 2, 3):
        s, e, st = map_protein_to_dna(f, L, 2, 5)
        assert st == "+" and s == (f - 1) + 6 and e == (f - 1) + 17
        sm, em, stm = map_protein_to_dna(-f, L, 2, 5)
        assert stm == "-"
        # the '-' range is the forward range reflected through L-1
        assert sm == L - 1 - e and em == L - 1 - s


def test_translated_evalue_orders_hits():
    """calibrate_translated E-values: the planted hit gets a (much) smaller
    E-value than a random read's best hit."""
    from versalignlib_tpu.translate import (calibrate_translated,
                                            translated_search)

    coding = "".join(_REV[a] for a in "MKWHHEEKLLNN")
    reads = ["C" + coding + "GT", "ACGTACGTACGTACGTACGTACGTACGTAC"]
    panel = ["MKWHHEEKLLNN", "WWYYFFPPCCGG"]
    cal = calibrate_translated(panel, read_len=32, samples=48)
    th = translated_search(reads, panel, alignments=True, calibration=cal)
    assert th.evalue is not None and th.bitscore is not None
    assert th.evalue[0] < th.evalue[1]
    assert th.bitscore[0] > th.bitscore[1]


def test_translated_panel_chunk_fold_matches_unchunked(rng):
    """panel_chunk streaming fold == the full-tensor fold, including ties
    (lexicographic score / frame order / panel index)."""
    from versalignlib_tpu.translate import translated_search

    reads = ["".join(rng.choice(list("ACGT"), size=45)) for _ in range(6)]
    # small alphabet panel to force score ties across entries; the XLA impl
    # keeps the per-chunk-shape compile cost trivial on the CPU mesh
    panel = ["".join(rng.choice(list("MKWH"), size=12)) for _ in range(23)]
    full = translated_search(reads, panel, impl="xla")
    for chunk in (4, 7, 23):
        part = translated_search(reads, panel, panel_chunk=chunk, impl="xla")
        assert np.array_equal(part.index, full.index), chunk
        assert np.array_equal(part.frame, full.frame), chunk
        assert np.array_equal(part.score, full.score), chunk
        assert part.scores is None


def test_translated_mixed_length_reverse_coords():
    """Mixed-length batches: trailing padding must NOT leak into reverse
    frames (it reverse-complements to LEADING 'X's and shifts every
    reverse-frame coordinate). Regression for the r5 negative-dna_start."""
    from versalignlib_tpu.alphabet import encode
    from versalignlib_tpu.translate import translate_codes, translated_search

    coding = "".join(_REV[a] for a in "MKWHHE")
    rc = _rc(coding)
    reads = ["C" + coding + "GT", rc]           # 21 and 18 bases
    panel = ["MKWHHE", "WWYYFFPP"]
    th = translated_search(reads, panel, alignments=True)
    assert int(th.frame[1]) < 0 and th.strand[1] == "-"
    ds, de = int(th.dna_start[1]), int(th.dna_end[1])
    assert 0 <= ds <= de < len(rc), (ds, de)
    sub = _rc(rc[ds:de + 1])
    assert translate_codes(encode(sub), 1) == \
        th.alignments[1].read.replace("-", "")
    # no padding-born 'X' in any of the shorter read's frame translations
    assert all("X" not in p for p in th.proteins[1])
