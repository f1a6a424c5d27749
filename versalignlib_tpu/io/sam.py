"""SAM output for alignment results (production interop surface).

The reference emits only its own two-gapped-strings text format
(/root/reference/src/impl/main.cpp:146-155); downstream genomics tooling
expects SAM. This maps :class:`~versalignlib_tpu.types.Alignment` results
(local or semi-global) onto single-end SAM records: the aligned window
becomes POS/CIGAR with the unaligned read flanks soft-clipped, the raw read
is SEQ, and the DP score rides the standard ``AS:i`` tag. CIGAR convention
matches SAM: M consumes read+ref, D consumes ref only (read deletion), I
consumes read only.
"""

from __future__ import annotations

import pathlib
import re
from typing import Iterable, Sequence

from versalignlib_tpu.types import Alignment

_CIG_RE = re.compile(r"(\d+)([MID])")


def _nm_md(read_g: str, ref_g: str) -> tuple[int, str]:
    """NM (edit distance) and MD string over an aligned gapped window.

    Inputs are the gapped read/ref strings of the EMITTED alignment window
    (edge non-M runs already trimmed). NM counts mismatched M columns plus
    every inserted read base and deleted ref base; MD follows the samtools
    convention — match-run lengths (0 allowed) separating mismatched ref
    bases and ``^``-prefixed deletion runs, insertions invisible.
    """
    nm = 0
    md: list[str] = []
    run = 0
    i = 0
    n_cols = len(read_g)
    while i < n_cols:
        r, f = read_g[i], ref_g[i]
        if r != "-" and f != "-":
            if r.upper() == f.upper():
                run += 1
            else:
                md.append(f"{run}{f.upper()}")
                run = 0
                nm += 1
            i += 1
        elif f == "-":           # insertion: consumes read only, MD-invisible
            nm += 1
            i += 1
        else:                    # deletion run: '-' in read, ref bases deleted
            dele = []
            while i < n_cols and read_g[i] == "-":
                dele.append(ref_g[i].upper())
                nm += 1
                i += 1
            md.append(f"{run}^{''.join(dele)}")
            run = 0
    md.append(str(run))
    return nm, "".join(md)


def sam_record(
    aln: Alignment,
    read_seq: str,
    read_name: str,
    ref_name: str,
    reverse: bool = False,
    mapq: int = 255,
    qual: str | None = None,
) -> str:
    """One SAM line (no trailing newline) for an alignment of ``read_seq``.

    ``reverse``: the alignment is of the reverse-complemented read — sets
    FLAG 16; pass ``read_seq`` (and ``qual``) already in alignment
    (reverse-complement / reversed) orientation, per the SAM convention.

    ``qual``: Phred+33 base-quality string for ``read_seq`` (FASTQ input);
    ``None`` emits ``*``.

    Mapped records carry ``AS:i`` (DP score), ``NM:i`` (edit distance over
    the emitted window), and ``MD:Z`` (samtools-convention mismatch/deletion
    string), so downstream tools can reconstruct the reference bases without
    the FASTA.

    SAM validators reject CIGARs whose first/last non-clip op is a
    deletion (and frown on edge insertions), which semi-global tracebacks
    can legitimately produce (the walk may stop on a LEFT step). Edge ops
    are normalized: a leading D advances POS, a trailing D is dropped,
    and edge I runs fold into the soft clips — so the emitted CIGAR always
    starts and ends with M between its clips. NM/MD are computed over the
    same trimmed window, consistent with the emitted CIGAR/POS.
    """
    if qual is not None and len(qual) != len(read_seq):
        raise ValueError(
            f"quality length {len(qual)} != read length {len(read_seq)} "
            f"for {read_name!r}")
    unmapped = not aln.cigar or aln.read_start < 0 or aln.read_end <= aln.read_start
    if not unmapped:
        lead = aln.read_start
        tail = len(read_seq) - aln.read_end
        pos = aln.ref_start
        lead_cols = tail_cols = 0    # gapped-string columns trimmed off
        items = [(int(n), op) for n, op in _CIG_RE.findall(aln.cigar)]
        while items and items[0][1] != "M":
            n, op = items.pop(0)
            lead_cols += n
            if op == "D":
                pos += n        # leading deletion: alignment starts later
            else:
                lead += n       # leading insertion: more soft-clipped read
        while items and items[-1][1] != "M":
            n, op = items.pop()
            tail_cols += n
            if op == "I":
                tail += n
        unmapped = not items    # no aligned (M) bases survive
    if unmapped:
        return "\t".join([
            read_name, "4", "*", "0", "0", "*", "*", "0", "0",
            read_seq or "*", qual or "*", f"AS:i:{aln.score}",
        ])
    cigar = (
        (f"{lead}S" if lead else "")
        + "".join(f"{n}{op}" for n, op in items)
        + (f"{tail}S" if tail else "")
    )
    nm, md = _nm_md(aln.read[lead_cols : len(aln.read) - tail_cols],
                    aln.ref[lead_cols : len(aln.ref) - tail_cols])
    return "\t".join([
        read_name,
        "16" if reverse else "0",
        ref_name,
        str(pos + 1),            # SAM POS is 1-based
        str(int(mapq)),          # 255 = unavailable (pairwise mode)
        cigar,
        "*", "0", "0",
        read_seq,
        qual or "*",
        f"AS:i:{aln.score}",
        f"NM:i:{nm}",
        f"MD:Z:{md}",
    ])


def write_sam(
    path,
    alignments: Sequence[Alignment],
    reads: Sequence[str],
    refs: Sequence[str],
    read_names: Iterable[str] | None = None,
    ref_names: Iterable[str] | None = None,
    strands=None,
    mapqs=None,
    quals: Sequence[str | None] | None = None,
) -> None:
    """Write single-end SAM: one record per (read, ref) pair.

    ``reads``/``refs`` are the ORIGINAL (ungapped) sequences the batch was
    aligned from — for reverse-strand records (``strands[i]`` truthy) pass
    the read already reverse-complemented (and its quality string already
    reversed), the orientation it was aligned in. Names default to
    ``read<i>`` / ``ref<i>``; ``quals`` entries may be ``None`` (``*``).
    Each pair's ref becomes its own @SQ entry (deduplicated by name).
    """
    read_names = list(read_names) if read_names is not None else [
        f"read{i}" for i in range(len(reads))]
    ref_names = list(ref_names) if ref_names is not None else [
        f"ref{i}" for i in range(len(refs))]
    strands = ([0] * len(reads) if strands is None else
               [int(s) for s in strands])
    mapqs = ([255] * len(reads) if mapqs is None else
             [int(q) for q in mapqs])
    quals = list(quals) if quals is not None else [None] * len(reads)
    if not (len(alignments) == len(reads) == len(refs)
            == len(read_names) == len(ref_names) == len(strands)
            == len(mapqs) == len(quals)):
        raise ValueError("alignments/reads/refs/names/strands/mapqs/quals "
                         "length mismatch")

    def emit(f):
        f.write("@HD\tVN:1.6\tSO:unknown\n")
        seen = set()
        for name, seq in zip(ref_names, refs):
            if name not in seen:
                seen.add(name)
                f.write(f"@SQ\tSN:{name}\tLN:{len(seq)}\n")
        f.write("@PG\tID:versalignlib_tpu\tPN:versalignlib_tpu\n")
        for aln, seq, rn, fn, st, mq, q in zip(alignments, reads, read_names,
                                               ref_names, strands, mapqs,
                                               quals):
            f.write(sam_record(aln, seq, rn, fn, reverse=bool(st), mapq=mq,
                               qual=q) + "\n")

    if isinstance(path, (str, pathlib.Path)):
        with open(path, "w") as f:
            emit(f)
    else:
        emit(path)
