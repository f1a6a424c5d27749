"""Result types and algorithm enums.

The ``Alignment`` dataclass is the TPU-native analogue of the reference's
``Alignment`` struct (/root/reference/include/AlignmentKernel.h:12-24): two
gapped strings plus start/end indices. We additionally carry the score, a
CIGAR string, and true sequence coordinates (the reference's ``readEnd`` /
``refEnd`` are buffer indices, always ``aln_length - 1``,
DefaultKernel.cpp:450-451 — kept here as the ``buffer_*`` compat fields).
"""

from __future__ import annotations

import dataclasses
import enum


class Algorithm(enum.IntEnum):
    """DP algorithm selector.

    Values match the reference's ``opt & 0xF`` switch
    (/root/reference/include/AlignmentKernel.h:26-32): 0 = Smith-Waterman
    (local), 1 = "Needleman-Wunsch" (actually semi-global / overlap — free
    leading+trailing gaps in the score path, see SURVEY.md §2.2).
    """

    SMITH_WATERMAN = 0
    NEEDLEMAN_WUNSCH = 1


class TieBreak(enum.IntEnum):
    """Traceback pointer flavor (priority on ties + backend-specific rules).

    The reference backends disagree (scores agree, tracebacks on ties may
    not). Each enum value selects the complete pointer semantics of a
    reference backend family:

    - ``DIAG_UP_LEFT`` (canonical; Default + OpenCL backends): priority
      DIAG > UP > LEFT, SW cells equal to 0 get START
      (DefaultKernel.cpp:240-248, alignment_kernels.cl:106-112), and N bases
      count as *valid* for the NW end-cell tracking (``char_to_score != 0``,
      DefaultKernel.cpp:308,348).
    - ``DIAG_LEFT_UP`` (SSE/AVX backends): priority DIAG > LEFT > UP via
      max-of-codes, DIAG only when both bases are A/C/G/T, no START force at
      zero SW cells, and N counts as *invalid* for NW end-cell tracking
      (SSEKernel.cpp:364-379,515-527,597-611).
    """

    DIAG_UP_LEFT = 0  # canonical (Default + OpenCL backends)
    DIAG_LEFT_UP = 1  # SSE / AVX backends


class Trace(enum.IntEnum):
    """Pointer codes in traceback matrices (2 bits each when packed)."""

    START = 0
    UP = 1     # consume read base against a gap in ref (cost score_gap_ref)
    LEFT = 2   # consume ref base against a gap in read (cost score_gap_read)
    DIAG = 3   # consume both (cost match/mismatch)


class AlignMode(enum.Enum):
    """Score-only vs full traceback (the two AlignmentKernel virtuals,
    /root/reference/include/AlignmentKernel.h:40-43)."""

    SCORE = "score"
    ALIGN = "align"


@dataclasses.dataclass
class Alignment:
    """One pairwise alignment result.

    ``read`` / ``ref`` are the gapped strings ('-' for gaps), covering only
    the aligned window — the meaningful segment of the reference's
    ``aln_length``-sized buffers between ``readStart`` and the end
    (DefaultKernel.cpp:441-451).
    """

    read: str
    ref: str
    score: int
    cigar: str
    # True 0-based sequence coordinates of the aligned window: the alignment
    # covers read[read_start:read_end] and ref[ref_start:ref_end] (half-open).
    read_start: int
    read_end: int
    ref_start: int
    ref_end: int
    # Reference-compat buffer indices (Alignment struct semantics):
    # buffer_start == readStart == refStart (first used index in the
    # aln_length buffer); buffer_end == aln_length - 1.
    buffer_start: int = 0
    buffer_end: int = 0

    def __len__(self) -> int:
        return len(self.read)


def cigar_from_gapped(read_gapped: str, ref_gapped: str) -> str:
    """Derive a CIGAR string (M/I/D run-length) from two gapped strings.

    I = insertion to reference (gap in ref, consumes read) — the UP pointer;
    D = deletion from reference (gap in read, consumes ref) — the LEFT pointer.
    """
    if len(read_gapped) != len(ref_gapped):
        raise ValueError("gapped strings must have equal length")
    ops = []
    for rc, fc in zip(read_gapped, ref_gapped):
        if rc == "-":
            op = "D"
        elif fc == "-":
            op = "I"
        else:
            op = "M"
        if ops and ops[-1][0] == op:
            ops[-1][1] += 1
        else:
            ops.append([op, 1])
    return "".join(f"{n}{op}" for op, n in ops)
