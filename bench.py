#!/usr/bin/env python
"""Benchmark: batched 512x512 Smith-Waterman scoring on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = GCUPS (1e9 DP cell updates/sec); vs_baseline = value / 50, the
north-star target from BASELINE.json (the reference publishes no numbers of
its own — BASELINE.md).

Methodology: this environment reaches the TPU through a tunnel with ~25ms
of fixed per-call RTT and an async dispatch whose block_until_ready is
unreliable, so each call is timed to full host materialization and the
device throughput is taken as the MARGINAL rate between two batch sizes
(slope of time vs batch), which cancels constant per-call overheads:

    GCUPS = (B2 - B1) * m * n / (t(B2) - t(B1)) / 1e9

Correctness is asserted before timing: a random subset of the scored batch
must match the golden-gated numpy oracle bit-for-bit.
"""

import json
import sys
import time

import numpy as np


def _time_call(fn, reps: int = 8, tag0: int = 0) -> float:
    """Min-of-reps wall time of fn(tag) with full materialization.

    Each rep gets a distinct tag: fn perturbs one input element per tag so
    no two executions see identical buffers — the tunnel serves repeated
    identical executions from a cache, which would collapse the timing to
    pure RTT (CLAUDE.md)."""
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(tag0 + i))
        best = min(best, time.perf_counter() - t0)
    return best


def _device_probe_ok(timeout_s: float = 180.0) -> bool:
    """Probe device init in a SUBPROCESS: when the axon tunnel is down,
    ``jax.devices()`` blocks indefinitely with no in-process recovery —
    probing out-of-process lets us fall back to CPU and still emit the
    JSON line instead of hanging the driver."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s)
        return r.returncode == 0 and "tpu" in r.stdout
    except Exception:
        return False


def main() -> int:
    if not _device_probe_ok():
        print("[bench] TPU unreachable; falling back to CPU (xla backend)",
              file=sys.stderr)
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from versalignlib_tpu.ops import oracle
    from versalignlib_tpu.ops.pallas_score import score_batch_device
    from versalignlib_tpu.ops.xla import score_batch as xla_score_batch
    from versalignlib_tpu.params import AlignmentParameters
    from versalignlib_tpu.types import Algorithm

    on_tpu = jax.devices()[0].platform == "tpu"
    p = AlignmentParameters()
    m, n = 512, 512
    # Wide spread: the marginal's denominator (t2-t1) must dwarf the
    # tunnel's per-call RTT jitter (~2ms) or the rate swings +-20%.
    b1, b2 = (4096, 32768) if on_tpu else (64, 256)
    rng = np.random.default_rng(42)

    def make(b):
        reads = rng.integers(1, 5, size=(b, m)).astype(np.uint8)
        refs = rng.integers(1, 5, size=(b, n)).astype(np.uint8)
        return reads, refs, jnp.asarray(reads), jnp.asarray(refs)

    reads1, refs1, r1, f1 = make(b1)
    _, _, r2, f2 = make(b2)

    kern = (
        (lambda r, f: score_batch_device(r, f, p, Algorithm.SMITH_WATERMAN, False))
        if on_tpu else
        (lambda r, f: xla_score_batch(r, f, p, Algorithm.SMITH_WATERMAN))
    )
    # tag=0 keeps element [0,0] at its original value mod-pattern; the
    # correctness gate below scores the UNperturbed batch.
    fn1 = lambda tag: kern(r1.at[0, 0].set(tag % 4 + 1), f1)
    fn2 = lambda tag: kern(r2.at[0, 0].set(tag % 4 + 1), f2)

    out1 = np.asarray(kern(r1, f1))  # compile + warm, unperturbed
    np.asarray(kern(r2, f2))

    # Correctness gate (bit-exact vs golden-gated oracle on a subset).
    sub = rng.integers(0, b1, size=24)
    want = oracle.score_alignments(Algorithm.SMITH_WATERMAN, reads1[sub], refs1[sub], p)
    if not np.array_equal(out1[sub], want):
        print("FATAL: score mismatch vs oracle", file=sys.stderr)
        print(json.dumps({"metric": "sw_512x512_score_gcups", "value": 0.0,
                          "unit": "GCUPS", "vs_baseline": 0.0}))
        return 1

    t1 = _time_call(fn1)
    t2 = _time_call(fn2, tag0=8)
    if t2 <= t1:  # degenerate timing; fall back to the large-batch rate
        gcups = b2 * m * n / t2 / 1e9
    else:
        gcups = (b2 - b1) * m * n / (t2 - t1) / 1e9
    print(
        f"[bench] platform={jax.devices()[0].platform} {m}x{n} SW "
        f"t({b1})={t1*1e3:.1f}ms t({b2})={t2*1e3:.1f}ms "
        f"marginal GCUPS={gcups:.2f}",
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
