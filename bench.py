#!/usr/bin/env python
"""Benchmark: batched 512x512 Smith-Waterman scoring on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = GCUPS (1e9 DP cell updates/sec); vs_baseline = value / 50, the
north-star target from BASELINE.json (the reference publishes no numbers of
its own — BASELINE.md).

Robustness layout (the round-3 driver run was killed by its timeout with
nothing printed — never again):

  parent (this process, never touches a device)
    ├─ child `--child`        TPU measurement, subprocess w/ timeout
    └─ child `--child --cpu`  CPU fallback if the TPU child fails/times out

so a parseable JSON line is emitted no matter what the axon tunnel does,
within BENCH_BUDGET_S (default 540s) wall.

Methodology: this environment reaches the TPU through a tunnel with ~25ms
of fixed per-call RTT, slow D2H, and an async dispatch whose
block_until_ready is unreliable. Each timed call materializes a reduced
scalar, and the kernel time is the MARGINAL between a k=1-execution call
and a k=K-execution call of the SAME jitted function (the execution count
is a traced `lax.fori_loop` bound):

    GCUPS = (K - 1) * B * m * n / (t(K) - t(1)) / 1e9

This cancels every per-call constant (RTT, dispatch, D2H of the reduced
scalar) exactly, and needs only ONE remote compile — the round-3 timeout
was two cold 512-row Pallas compiles (30-170s each) stacked on a slow
tunnel. Inputs are generated ON DEVICE (no multi-MB H2D over the tunnel);
each loop iteration perturbs one element so no two executions see
identical buffers (the tunnel serves repeated identical dispatches from a
cache — CLAUDE.md).

Correctness is asserted before timing: the same jitted function also
returns the unperturbed batch's scores, and a random subset must match
the golden-gated numpy oracle bit-for-bit.
"""

import json
import os
import subprocess
import sys
import time

FALLBACK = {"metric": "sw_512x512_score_gcups", "value": 0.0,
            "unit": "GCUPS", "vs_baseline": 0.0}


def _run_child(args, timeout_s):
    """Run a child bench process; return its parsed JSON line or None."""
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__)] + args,
                           capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        print(f"[bench] child {args} timed out after {timeout_s:.0f}s",
              file=sys.stderr)
        return None
    for line in r.stderr.splitlines()[-6:]:
        print(line, file=sys.stderr)
    if r.returncode != 0:
        print(f"[bench] child {args} rc={r.returncode}", file=sys.stderr)
        return None
    for line in reversed(r.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                return None
    return None


def parent() -> int:
    budget = float(os.environ.get("BENCH_BUDGET_S", "540"))
    t0 = time.monotonic()
    left = lambda: budget - (time.monotonic() - t0)

    out = _run_child(["--child"], timeout_s=max(30.0, left() - 110.0))
    if out is None:
        print("[bench] TPU child failed; CPU fallback", file=sys.stderr)
        out = _run_child(["--child", "--cpu"], timeout_s=max(20.0, left() - 5.0))
        if out is not None:
            out["note"] = "tpu unreachable; cpu-xla fallback measurement"
    if out is None:
        out = dict(FALLBACK, note="both tpu and cpu children failed")
    print(json.dumps(out))
    return 0 if out.get("value", 0.0) > 0 else 1


def child(cpu: bool) -> int:
    import numpy as np
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    from versalignlib_tpu.ops import oracle
    from versalignlib_tpu.ops.pallas_score import score_batch_device
    from versalignlib_tpu.ops.xla import score_batch as xla_score_batch
    from versalignlib_tpu.params import AlignmentParameters
    from versalignlib_tpu.types import Algorithm

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    if cpu and on_tpu:  # forced-cpu child must not touch the tunnel
        raise RuntimeError("cpu child resolved to tpu platform")
    p = AlignmentParameters()
    m, n = 512, 512
    b, k_hi = (16384, 9) if on_tpu else (192, 4)

    kern = (lambda r, f: score_batch_device(r, f, p, Algorithm.SMITH_WATERMAN,
                                            False)) if on_tpu else \
           (lambda r, f: xla_score_batch(r, f, p, Algorithm.SMITH_WATERMAN))

    @jax.jit
    def bench_fn(reads, refs, k, tag):
        s0 = kern(reads, refs)  # unperturbed: the correctness-gate output

        def body(i, acc):
            r = reads.at[0, 0].set((tag + i) % 4 + 1)
            return acc + jnp.sum(kern(r, refs))

        return s0, lax.fori_loop(0, k, body, jnp.int32(0))

    key = jax.random.PRNGKey(42)
    kr, kf = jax.random.split(key)
    reads = jax.random.randint(kr, (b, m), 1, 5, dtype=jnp.int32)
    refs = jax.random.randint(kf, (b, n), 1, 5, dtype=jnp.int32)

    # Compile + warm + correctness gate (bit-exact vs golden-gated oracle).
    s0, _ = bench_fn(reads, refs, 1, 0)
    rng = np.random.default_rng(7)
    sub = rng.integers(0, b, size=24)
    reads_sub = np.asarray(reads[sub]).astype(np.uint8)
    refs_sub = np.asarray(refs[sub]).astype(np.uint8)
    got = np.asarray(s0)[sub]
    want = oracle.score_alignments(Algorithm.SMITH_WATERMAN, reads_sub,
                                   refs_sub, p)
    if not np.array_equal(got, want):
        print("FATAL: score mismatch vs oracle", file=sys.stderr)
        print(json.dumps(FALLBACK))
        return 1

    def timed(k, tag0):
        best = float("inf")
        for i in range(4):
            t0 = time.perf_counter()
            np.asarray(bench_fn(reads, refs, k, 4 * (tag0 + i))[1])
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(1, 1)
    tk = timed(k_hi, 64)
    if tk <= t1:  # degenerate timing; fall back to the k-loop absolute rate
        gcups = k_hi * b * m * n / tk / 1e9
    else:
        gcups = (k_hi - 1) * b * m * n / (tk - t1) / 1e9
    print(
        f"[bench] platform={platform} {m}x{n} SW B={b} "
        f"t(k=1)={t1*1e3:.1f}ms t(k={k_hi})={tk*1e3:.1f}ms "
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
    if "--child" in sys.argv:
        sys.exit(child(cpu="--cpu" in sys.argv))
    sys.exit(parent())
