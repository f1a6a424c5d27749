"""Sequence I/O: FASTA/FASTQ parsing/writing, batch padding, device staging,
SAM output."""

from versalignlib_tpu.io.fasta import parse_fasta, write_fasta
from versalignlib_tpu.io.fastq import (parse_fastq, parse_sequences,
                                       sniff_format, write_fastq)
from versalignlib_tpu.io.sam import write_sam
from versalignlib_tpu.io.staging import prefetch_to_device

__all__ = [
    "parse_fasta", "write_fasta", "parse_fastq", "write_fastq",
    "parse_sequences", "sniff_format", "write_sam", "prefetch_to_device",
]
