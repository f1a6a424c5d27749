"""BAM output: BGZF container + binary records, validated by round trip.

The encoder converts SAM text; the decoder (read_bam) was written
independently against the spec, so encoder->decoder reproducing the SAM
byte-for-byte is a meaningful check. BGZF is additionally validated with
stdlib gzip (every BGZF stream is a conformant multi-member gzip stream).
"""

import gzip
import io

import numpy as np
import pytest

from versalignlib_tpu.io.bam import (BGZF_EOF, bgzf_compress, read_bam,
                                     reg2bin, sam_to_bam, write_bam)


def test_bgzf_is_valid_gzip(rng):
    data = rng.integers(0, 256, size=200_000).astype(np.uint8).tobytes()
    blob = bgzf_compress(data)
    assert gzip.decompress(blob) == data       # multi-member gzip stream
    assert blob.endswith(BGZF_EOF)             # spec EOF marker
    assert bgzf_compress(b"") == BGZF_EOF      # empty stream = just EOF
    # >64KB payloads must split into multiple members: count gzip headers.
    assert blob.count(b"\x1f\x8b\x08\x04") >= 4


def test_reg2bin_spec_values():
    # SAM spec 4.2.1 anchor values.
    assert reg2bin(0, 1) == 4681
    assert reg2bin(0, 1 << 14) == 4681
    assert reg2bin(1 << 14, (1 << 14) + 1) == 4682
    assert reg2bin(0, (1 << 14) + 1) == 585
    assert reg2bin(0, 1 << 29) == 0


def _roundtrip(sam_text: str) -> str:
    return read_bam(sam_to_bam(sam_text))


def test_bam_roundtrip_single_end(rng, default_params):
    from versalignlib_tpu import AlignmentEngine, map_reads
    from versalignlib_tpu.alphabet import reverse_complement
    from versalignlib_tpu.io.sam import write_sam
    from versalignlib_tpu.types import Algorithm

    bases = np.array(list("ACGT"))
    panel = ["".join(rng.choice(bases, size=40)) for _ in range(3)]
    reads = [panel[0][5:25], reverse_complement(panel[2][10:30]),
             "GGGGGGGGGG"]  # third read: likely unmapped vs panel[1]
    hits = map_reads(reads, panel, default_params, backend="oracle")
    quals = ["".join(chr(33 + int(q)) for q in rng.integers(0, 60, size=20))
             for _ in range(2)] + ["I" * 10]
    oriented = [reverse_complement(r) if s else r
                for r, s in zip(reads, hits.strand)]
    oq = [q[::-1] if s else q for q, s in zip(quals, hits.strand)]
    buf = io.StringIO()
    write_sam(buf, hits.alignments, oriented, [panel[j] for j in hits.index],
              ref_names=[f"p{j}" for j in hits.index], strands=hits.strand,
              mapqs=hits.mapq, quals=oq)
    sam = buf.getvalue()
    assert _roundtrip(sam) == sam


def test_bam_roundtrip_paired_and_unmapped(rng, default_params):
    from versalignlib_tpu import map_read_pairs
    from versalignlib_tpu.alphabet import reverse_complement
    from versalignlib_tpu.io.sam import write_sam, write_sam_paired
    from versalignlib_tpu.types import Alignment

    bases = np.array(list("ACGT"))
    panel = ["".join(rng.choice(bases, size=60))]
    frag = panel[0][5:45]
    h = map_read_pairs([frag[:18]], [reverse_complement(frag[22:])], panel,
                       default_params, backend="oracle")
    o1 = [frag[:18]]
    o2 = [frag[22:]]
    buf = io.StringIO()
    write_sam_paired(buf, h.alignments1, h.alignments2, o1, o2, panel,
                     ref_names=["chr1"], strands1=h.strand1,
                     strands2=h.strand2, mapqs=h.mapq)
    sam = buf.getvalue()
    assert _roundtrip(sam) == sam
    # Unmapped record (empty alignment) round-trips too.
    buf = io.StringIO()
    write_sam(buf, [Alignment("", "", 0, "", -1, -1, -1, -1)], ["ACGT"],
              ["TTTT"], ref_names=["c"])
    sam = buf.getvalue()
    assert _roundtrip(sam) == sam


def test_cli_bam_flag(tmp_path, rng):
    from versalignlib_tpu.cli import main
    from versalignlib_tpu.io.fasta import write_fasta

    bases = np.array(list("ACGT"))
    panel = ["".join(rng.choice(bases, size=40)) for _ in range(2)]
    reads = [panel[1][4:28]]
    rf, pf = tmp_path / "r.fa", tmp_path / "p.fa"
    write_fasta(rf, reads)
    write_fasta(pf, panel, names=["pA", "pB"])
    rc = main(["--reads", str(rf), "--panel", str(pf), "--outdir",
               str(tmp_path), "--backend", "oracle", "--sam", "--bam"])
    assert rc == 0
    sam_path = tmp_path / "alignments_smith_waterman.sam"
    bam_path = tmp_path / "alignments_smith_waterman.bam"
    assert bam_path.exists()
    assert read_bam(bam_path) == sam_path.read_text()
    # --bam without --sam is an argparse error.
    with pytest.raises(SystemExit):
        main(["--reads", str(rf), "--panel", str(pf), "--bam"])


def test_write_bam_file_and_bad_input(tmp_path):
    sam = ("@HD\tVN:1.6\tSO:unknown\n@SQ\tSN:c\tLN:8\n"
           "@PG\tID:x\tPN:x\n"
           "r0\t0\tc\t1\t60\t4M\t*\t0\t0\tACGT\tIIII\tAS:i:8\tNM:i:0\t"
           "MD:Z:4\n")
    p = tmp_path / "x.bam"
    write_bam(p, sam)
    assert read_bam(p) == sam
    with pytest.raises(ValueError, match="not a BAM"):
        read_bam(gzip.compress(b"nope"))