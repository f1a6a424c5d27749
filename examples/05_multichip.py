"""Multi-chip data parallelism over a jax.sharding.Mesh.

The batch shards over the mesh's data axis; the only collective is the
trailing result gather (the DP fill has zero inter-device communication).
On a CPU host this demonstrates the same code path over virtual devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/05_multichip.py
"""

import jax
import numpy as np

from versalignlib_tpu import Algorithm, AlignmentEngine
from versalignlib_tpu.parallel import make_mesh

n_dev = len(jax.devices())
mesh = make_mesh(n_dev)
print(f"{n_dev} device(s): mesh {mesh.shape}")

rng = np.random.default_rng(0)
bases = np.array(list("ACGT"))
reads = ["".join(rng.choice(bases, size=100)) for _ in range(64)]
refs = ["".join(rng.choice(bases, size=120)) for _ in range(64)]

engine = AlignmentEngine(mesh=mesh)
scores = engine.score_alignments(Algorithm.SMITH_WATERMAN, reads, refs)
single = AlignmentEngine(backend="oracle").score_alignments(
    Algorithm.SMITH_WATERMAN, reads, refs)
print("sharded == single-host oracle:", bool(np.array_equal(scores, single)))
