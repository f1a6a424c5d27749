"""Data-parallel batched alignment over a device mesh.

Replaces the reference's OpenMP ``parallel for`` over pairs
(DefaultKernel.cpp:45-48) at pod scale: the pair batch shards over the
``data`` mesh axis via ``shard_map``, every device runs the local kernel
(Pallas on TPU, the XLA scan kernel elsewhere), and results are either left
sharded (for streaming pipelines) or gathered. The only collective is the
trailing all-gather of (B,)-shaped scores / pointer tensors, which rides ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from versalignlib_tpu.parallel.mesh import DATA_AXIS, make_mesh
from versalignlib_tpu.params import AlignmentParameters
from versalignlib_tpu.types import Algorithm, TieBreak


def _local_score_fn(impl: str, params, algorithm, interpret: bool):
    if impl == "pallas":
        from versalignlib_tpu.ops.pallas_score import score_batch_device

        return lambda r, f: score_batch_device(r, f, params, algorithm, interpret)
    from versalignlib_tpu.ops.xla import score_batch

    return lambda r, f: score_batch(r, f, params, algorithm)


@functools.partial(
    jax.jit,
    static_argnames=("params", "algorithm", "mesh", "impl", "interpret"),
)
def _distributed_score(reads, refs, params: AlignmentParameters,
                       algorithm: Algorithm, mesh: Mesh, impl: str,
                       interpret: bool):
    fn = _local_score_fn(impl, params, algorithm, interpret)
    mapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        out_specs=P(DATA_AXIS),
        check_vma=False,  # scan carries start unvarying; per-shard DP is pure
    )
    return mapped(reads, refs)


def distributed_score_batch(
    reads,
    refs,
    params: AlignmentParameters,
    algorithm: Algorithm,
    mesh: Mesh | None = None,
    impl: str = "auto",
    interpret: bool = False,
) -> np.ndarray:
    """Score a (B, m) x (B, n) batch sharded over ``mesh``'s data axis.

    B is padded to a multiple of the axis size with all-invalid pairs
    (score 0), the reference's tail-batch semantics, so any batch size works.
    """
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    if impl == "auto":
        impl = "pallas" if mesh.devices.flat[0].platform == "tpu" else "xla"

    b = reads.shape[0]
    b_pad = -(-b // n_dev) * n_dev
    reads = jnp.asarray(np.pad(np.asarray(reads), ((0, b_pad - b), (0, 0))))
    refs = jnp.asarray(np.pad(np.asarray(refs), ((0, b_pad - b), (0, 0))))
    sharding = NamedSharding(mesh, P(DATA_AXIS, None))
    reads = jax.device_put(reads, sharding)
    refs = jax.device_put(refs, sharding)
    out = _distributed_score(reads, refs, params, Algorithm(algorithm), mesh,
                             impl, interpret)
    return np.asarray(out)[:b].astype(np.int32)


@functools.partial(
    jax.jit,
    static_argnames=("params", "algorithm", "tie", "mesh"),
)
def distributed_align_device(reads, refs, params: AlignmentParameters,
                             algorithm: Algorithm, tie: TieBreak, mesh: Mesh):
    """Sharded pointer-matrix fill (device part of compute_alignments).

    Returns sharded (ptr, start_read, start_ref, best) — callers stream the
    pointer tensors shard-by-shard to the host decoder.
    """
    from versalignlib_tpu.ops.xla import align_batch

    mapped = jax.shard_map(
        lambda r, f: align_batch(r, f, params, algorithm, tie),
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        out_specs=(P(DATA_AXIS, None, None), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        check_vma=False,
    )
    return mapped(reads, refs)
