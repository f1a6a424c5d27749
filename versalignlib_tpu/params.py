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

    def __post_init__(self) -> None:
        for name in ("score_gap_read", "score_gap_ref"):
            if getattr(self, name) > 0:
                raise ValueError(f"{name} must be <= 0, got {getattr(self, name)}")
        for name in ("gap_open_read", "gap_open_ref"):
            if getattr(self, name) > 0:
                raise ValueError(f"{name} must be <= 0, got {getattr(self, name)}")

    @property
    def affine(self) -> bool:
        return self.gap_open_read != 0 or self.gap_open_ref != 0

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
