"""Sequence I/O: FASTA parsing/writing, batch padding, device staging, SAM."""

from versalignlib_tpu.io.fasta import parse_fasta, write_fasta
from versalignlib_tpu.io.sam import write_sam
from versalignlib_tpu.io.staging import prefetch_to_device

__all__ = ["parse_fasta", "write_fasta", "write_sam", "prefetch_to_device"]
