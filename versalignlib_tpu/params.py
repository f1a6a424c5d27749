"""Alignment scoring parameters.

TPU-native analogue of the reference's ``AlignmentParameters`` key->int plugin
interface (/root/reference/include/AlignmentParameters.h:11-22) and its
concrete ``CustomParameters`` (/root/reference/src/impl/CustomParameters.h:6-59).

Instead of a mutable global injected into each shared object through an
exported C symbol, parameters are a frozen, hashable dataclass: they become
part of the ``jax.jit`` static cache key, which is the XLA equivalent of the
reference OpenCL backend freezing scores/lengths into ``-D`` compile-time
defines (/root/reference/src/Kernels/OpenCL/OpenCLKernel.cpp:401-411).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator


@dataclasses.dataclass(frozen=True)
class AlignmentParameters:
    """Linear / affine gap scoring configuration.

    Field names mirror the reference's seven parameter keys
    (/root/reference/src/impl/CustomParameters.h:9-33): ``score_match``,
    ``score_mismatch``, ``score_gap_read``, ``score_gap_ref`` (lengths and
    thread counts are not parameters here: lengths come from the input
    arrays, and threading is XLA's job).

    ``score_gap_read`` penalizes consuming a ref base against a gap in the
    read (pointer LEFT); ``score_gap_ref`` penalizes consuming a read base
    against a gap in the ref (pointer UP) — matching the reference recurrence
    (/root/reference/src/Kernels/default/DefaultKernel.cpp:102-108).

    ``gap_open_*`` enable affine (Gotoh) gaps, an additive capability over the
    linear-gap-only reference: total penalty for a gap of length L is
    ``gap_open + L * score_gap``. ``gap_open_* = 0`` (default) is exactly the
    reference's linear model.
    """

    score_match: int = 2
    score_mismatch: int = -1
    score_gap_read: int = -3
    score_gap_ref: int = -3
    gap_open_read: int = 0
    gap_open_ref: int = 0
    #: Optional S x S substitution matrix indexed by code (ADDITIVE over the
    #: reference, whose only alphabet is the 6x6 DNA table,
    #: DefaultKernel.h:83-96). Code 0 is the padding sentinel: row 0 and
    #: column 0 must be all-zero so the tail-batch '\0' fill-up semantics
    #: stay exact. When set, ``score_match``/``score_mismatch`` are ignored
    #: for substitution (gap penalties still apply) and input codes must be
    #: < S (codes >= S score 0, like padding). Stored as a tuple of tuples —
    #: hashable, so it participates in the jit static key like every other
    #: field. See ``alphabet.encode_custom`` / ``alphabet.blosum62``.
    matrix: tuple | None = None

    def __post_init__(self) -> None:
        for name in ("score_gap_read", "score_gap_ref"):
            if getattr(self, name) > 0:
                raise ValueError(f"{name} must be <= 0, got {getattr(self, name)}")
        for name in ("gap_open_read", "gap_open_ref"):
            if getattr(self, name) > 0:
                raise ValueError(f"{name} must be <= 0, got {getattr(self, name)}")
        if self.matrix is not None:
            m = tuple(tuple(int(v) for v in row) for row in self.matrix)
            object.__setattr__(self, "matrix", m)
            s = len(m)
            if s < 2 or any(len(row) != s for row in m):
                raise ValueError(f"matrix must be square with S >= 2, got {m!r}")
            if any(m[0][j] != 0 for j in range(s)) or any(m[i][0] != 0 for i in range(s)):
                raise ValueError(
                    "matrix row 0 and column 0 must be zero (code 0 is the "
                    "padding sentinel; nonzero padding scores would break "
                    "tail-batch fill-up semantics)"
                )

    @property
    def affine(self) -> bool:
        return self.gap_open_read != 0 or self.gap_open_ref != 0

    @property
    def sub_size(self) -> int:
        """Alphabet size S of the substitution model (6 = reference table)."""
        return 6 if self.matrix is None else len(self.matrix)

    # -- reference-compatible key/value view ---------------------------------
    # (mirrors AlignmentParameters::param_int / has_key,
    #  /root/reference/include/AlignmentParameters.h:14-15)

    def param_int(self, key: str) -> int:
        if not self.has_key(key):
            raise KeyError(f"Unknown parameter key: {key}")
        return int(getattr(self, key))

    def has_key(self, key: str) -> bool:
        return key in {f.name for f in dataclasses.fields(self)}

    def keys(self) -> Iterator[str]:
        return iter(f.name for f in dataclasses.fields(self))

    def replace(self, **kw) -> "AlignmentParameters":
        return dataclasses.replace(self, **kw)


#: The reference driver's default scoring (CustomParameters.h:55-58).
DEFAULT_PARAMETERS = AlignmentParameters(
    score_match=2, score_mismatch=-1, score_gap_read=-3, score_gap_ref=-3
)
