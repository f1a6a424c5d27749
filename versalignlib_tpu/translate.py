"""Six-frame translation + translated protein search (blastx-style).

ADDITIVE over the reference (DNA-only, /root/reference/src/Kernels/default/
DefaultKernel.h:43-60): translate DNA reads in all six reading frames
(three forward, three reverse-complement), score every translation against
a protein panel with a substitution matrix (BLOSUM62 by default) through
the framework's matrix-mode kernels, and report each read's best
(frame, panel entry) — the classic blastx workflow.

Conventions follow NCBI: stop codons translate to ``'*'`` (strongly
negative vs everything in BLOSUM62, +1 vs itself), codons containing any
non-ACGT base (N, padding) translate to ``'X'`` (mildly negative). Frames
are labeled +1/+2/+3 and -1/-2/-3; a reverse frame's protein reads along
the reverse complement, so a hit in frame -f starts near the READ's 3'
end. The compute path is the standard one-vs-many machinery
(search.score_matrix) — on TPU the translations ride the SMEM-broadcast
search kernel with bit-packed BLOSUM62 rows; nothing here is
translation-specific below the Python orchestration.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from versalignlib_tpu.alphabet import PROTEIN_ALPHABET, blosum62, encode_custom
from versalignlib_tpu.params import AlignmentParameters
from versalignlib_tpu.types import Algorithm

#: Standard genetic code, codon (DNA letters) -> amino acid letter.
GENETIC_CODE = {
    "TTT": "F", "TTC": "F", "TTA": "L", "TTG": "L",
    "CTT": "L", "CTC": "L", "CTA": "L", "CTG": "L",
    "ATT": "I", "ATC": "I", "ATA": "I", "ATG": "M",
    "GTT": "V", "GTC": "V", "GTA": "V", "GTG": "V",
    "TCT": "S", "TCC": "S", "TCA": "S", "TCG": "S",
    "CCT": "P", "CCC": "P", "CCA": "P", "CCG": "P",
    "ACT": "T", "ACC": "T", "ACA": "T", "ACG": "T",
    "GCT": "A", "GCC": "A", "GCA": "A", "GCG": "A",
    "TAT": "Y", "TAC": "Y", "TAA": "*", "TAG": "*",
    "CAT": "H", "CAC": "H", "CAA": "Q", "CAG": "Q",
    "AAT": "N", "AAC": "N", "AAA": "K", "AAG": "K",
    "GAT": "D", "GAC": "D", "GAA": "E", "GAG": "E",
    "TGT": "C", "TGC": "C", "TGA": "*", "TGG": "W",
    "CGT": "R", "CGC": "R", "CGA": "R", "CGG": "R",
    "AGT": "S", "AGC": "S", "AGA": "R", "AGG": "R",
    "GGT": "G", "GGC": "G", "GGA": "G", "GGG": "G",
}

# DNA code layout (alphabet.py): A=1, T=2, C=3, G=4; N=5; pad/other=0.
_CODE_BASE = "\0ATCGN"
#: (6, 6, 6) codon-code -> amino letter; any non-ACGT component -> 'X'.
_CODON_AA = np.full((6, 6, 6), "X", dtype="U1")
for _c1 in range(1, 5):
    for _c2 in range(1, 5):
        for _c3 in range(1, 5):
            _CODON_AA[_c1, _c2, _c3] = GENETIC_CODE[
                _CODE_BASE[_c1] + _CODE_BASE[_c2] + _CODE_BASE[_c3]]

#: complement in code space: A(1)<->T(2), C(3)<->G(4); N/pad fixed.
_COMPLEMENT = np.array([0, 2, 1, 4, 3, 5], dtype=np.uint8)

FRAMES = (1, 2, 3, -1, -2, -3)


def translate_codes(codes: np.ndarray, frame: int) -> str:
    """Translate one encoded DNA sequence in one frame -> protein string.

    ``frame``: +1/+2/+3 read forward from offset frame-1; -1/-2/-3 read the
    reverse complement from offset |frame|-1. Trailing bases short of a
    full codon are dropped (NCBI convention).
    """
    codes = np.asarray(codes, dtype=np.uint8)
    if frame < 0:
        codes = _COMPLEMENT[codes[::-1]]
    off = abs(frame) - 1
    usable = (codes.size - off) // 3
    if usable <= 0:
        return ""
    c = codes[off:off + usable * 3].reshape(usable, 3)
    return "".join(_CODON_AA[c[:, 0], c[:, 1], c[:, 2]])


def translate_six_frames(seq) -> list[tuple[int, str]]:
    """DNA string or (L,) code array -> [(frame, protein), ...] for all 6."""
    if isinstance(seq, str):
        from versalignlib_tpu.alphabet import encode

        codes = encode(seq)
    else:
        codes = np.asarray(seq, dtype=np.uint8)
    return [(f, translate_codes(codes, f)) for f in FRAMES]


#: blastx-flavor defaults: BLOSUM62 with affine gaps (open 10, extend 1).
TRANSLATED_PARAMETERS = AlignmentParameters(
    score_gap_read=-1, score_gap_ref=-1,
    gap_open_read=-10, gap_open_ref=-10,
    matrix=blosum62(),
)


@dataclasses.dataclass
class TranslatedHits:
    """Per-read best translated hit. ``scores`` is the full (B, 6, R)
    score tensor (frames in :data:`FRAMES` order) for downstream ranking.
    """

    index: np.ndarray    # (B,) best panel entry
    frame: np.ndarray    # (B,) best reading frame (+-1/2/3)
    score: np.ndarray    # (B,) int32 best score
    scores: np.ndarray   # (B, 6, R) int32
    proteins: list[list[str]]  # per read, the 6 frame translations

    def __len__(self) -> int:
        return self.index.shape[0]


def translated_search(
    reads,
    panel,
    params: AlignmentParameters | None = None,
    algorithm: Algorithm = Algorithm.SMITH_WATERMAN,
    impl: str = "auto",
) -> TranslatedHits:
    """Score DNA reads against a PROTEIN panel in all six reading frames.

    ``reads``: DNA strings or (B, L) uint8 code array; ``panel``: protein
    strings or a pre-encoded (R, n) uint8 code array (PROTEIN_ALPHABET).
    All 6*B translations are scored against the panel in one
    :func:`~versalignlib_tpu.search.score_matrix` sweep (the one-vs-many
    kernel on TPU); ties on the fold keep the earlier frame in
    :data:`FRAMES` order, then the lower panel index (scan order, like
    best_hits).
    """
    from versalignlib_tpu.search import score_matrix

    params = TRANSLATED_PARAMETERS if params is None else params
    if params.matrix is None:
        raise ValueError(
            "translated_search needs a protein substitution matrix "
            "(params.matrix); default TRANSLATED_PARAMETERS uses BLOSUM62")
    if isinstance(reads, np.ndarray) and reads.ndim == 2:
        read_codes = reads.astype(np.uint8)
    else:
        from versalignlib_tpu.alphabet import pad_and_encode

        read_codes = pad_and_encode(list(reads))
    b = read_codes.shape[0]
    proteins = [[translate_codes(read_codes[i], f) for f in FRAMES]
                for i in range(b)]
    flat = [p for per_read in proteins for p in per_read]
    queries = encode_custom(flat, PROTEIN_ALPHABET)
    if isinstance(panel, np.ndarray) and panel.ndim == 2:
        panel_codes = panel.astype(np.uint8)
    else:
        panel_codes = encode_custom(list(panel), PROTEIN_ALPHABET)
    scores = score_matrix(queries, panel_codes, params, algorithm, impl=impl)
    scores = np.asarray(scores, dtype=np.int32).reshape(
        b, len(FRAMES), panel_codes.shape[0])
    # Fold: best panel entry per (read, frame), then best frame — argmax
    # keeps the FIRST maximum, giving FRAMES-order then scan-order ties.
    best_j = scores.argmax(axis=2)                        # (B, 6)
    best_per_frame = np.take_along_axis(
        scores, best_j[:, :, None], axis=2)[:, :, 0]      # (B, 6)
    best_f = best_per_frame.argmax(axis=1)                # (B,)
    idx = best_j[np.arange(b), best_f]
    return TranslatedHits(
        index=idx.astype(np.int32),
        frame=np.array([FRAMES[f] for f in best_f], dtype=np.int32),
        score=best_per_frame[np.arange(b), best_f].astype(np.int32),
        scores=scores,
        proteins=proteins,
    )
