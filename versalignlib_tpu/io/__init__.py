"""Sequence I/O: FASTA parsing/writing and batch padding."""

from versalignlib_tpu.io.fasta import parse_fasta, write_fasta

__all__ = ["parse_fasta", "write_fasta"]
