#!/usr/bin/env python
"""Benchmark: batched 512x512 Smith-Waterman scoring on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = GCUPS (1e9 DP cell updates/sec); vs_baseline = value / 50, the
north-star target from BASELINE.json (the reference publishes no numbers of
its own — BASELINE.md).

Correctness is asserted before timing: a random subset of the scored batch
must match the golden-gated numpy oracle bit-for-bit.
"""

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from versalignlib_tpu.ops import oracle
    from versalignlib_tpu.ops.pallas_score import score_batch_device
    from versalignlib_tpu.ops.xla import score_batch as xla_score_batch
    from versalignlib_tpu.params import AlignmentParameters
    from versalignlib_tpu.types import Algorithm

    on_tpu = jax.devices()[0].platform == "tpu"
    p = AlignmentParameters()
    B, m, n = 4096, 512, 512
    rng = np.random.default_rng(42)
    reads = rng.integers(1, 5, size=(B, m)).astype(np.uint8)
    refs = rng.integers(1, 5, size=(B, n)).astype(np.uint8)
    r, f = jnp.asarray(reads), jnp.asarray(refs)

    if on_tpu:
        fn = lambda: score_batch_device(r, f, p, Algorithm.SMITH_WATERMAN, False)
    else:
        # CPU fallback so the harness still emits a number off-TPU.
        fn = lambda: xla_score_batch(r, f, p, Algorithm.SMITH_WATERMAN)

    out = fn()
    out.block_until_ready()

    # Correctness gate (bit-exact vs golden-gated oracle on a subset).
    sub = rng.integers(0, B, size=32)
    want = oracle.score_alignments(Algorithm.SMITH_WATERMAN, reads[sub], refs[sub], p)
    got = np.asarray(out)[sub]
    if not np.array_equal(got, want):
        print("FATAL: score mismatch vs oracle", file=sys.stderr)
        print(json.dumps({"metric": "sw_512x512_score_gcups", "value": 0.0,
                          "unit": "GCUPS", "vs_baseline": 0.0}))
        return 1

    iters = 10 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    cells = B * m * n
    gcups = cells / dt / 1e9
    print(
        f"[bench] platform={jax.devices()[0].platform} B={B} {m}x{n} SW "
        f"time/call={dt*1e3:.2f}ms GCUPS={gcups:.2f}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "sw_512x512_score_gcups",
        "value": round(gcups, 2),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / 50.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
