"""Translated search (blastx-style): DNA reads vs a protein panel.

Each read is translated in all six reading frames (standard genetic code,
stops '*', ambiguous codons 'X') and every translation is scored against
the protein panel with BLOSUM62 + affine gaps in one matrix-mode sweep.
"""

from versalignlib_tpu import translate_six_frames, translated_search

# A short coding sequence for the peptide MKWHHE, with a junk base in
# front so it sits in reading frame +2, and its reverse complement.
coding = "ATGAAATGGCATCATGAA"
reads = ["C" + coding + "GT",
         (coding[::-1].translate(str.maketrans("ACGT", "TGCA")))]
panel = ["MKWHHE", "WWYYFFPP"]

for frame, prot in translate_six_frames(reads[0]):
    print(f"frame {frame:+d}: {prot}")

hits = translated_search(reads, panel)
for i in range(len(hits)):
    print(f"read {i}: best panel entry {int(hits.index[i])} "
          f"({panel[int(hits.index[i])]}) in frame {int(hits.frame[i]):+d}, "
          f"score {int(hits.score[i])}")
assert int(hits.index[0]) == 0 and int(hits.frame[0]) == 2
assert int(hits.index[1]) == 0 and int(hits.frame[1]) < 0
