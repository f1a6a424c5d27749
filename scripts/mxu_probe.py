#!/usr/bin/env python
"""MXU probe: one-hot matmul substitution lookup vs the bit-packed selects.

Settles VERDICT-r4 weak #4 / TODO §4 with a measurement artifact
(MXU_PROBE.json, SWAR_PROBE.json's template): can the MXU (systolic array)
beat the VPU bit-packed select path for S x S substitution scoring?

The only MXU-expressible formulation of the lane-local double lookup
``sub[b, i, j] = M[read[b, i], ref[b, j]]`` is the one-hot contraction

    plane[b] = onehot(read[b]) @ M @ onehot(ref[b])^T      (m x S)(S x S)(S x n)

because a systolic matmul needs a SHARED contraction axis: inside the DP
kernel both indices vary per lane (per pair), so there is nothing for the
MXU to contract over — per-cell lookup is irreducibly a VPU select/extract
problem. The contraction above is real MXU work, but it materializes the
(m, n) plane per pair through HBM: 4*m*n bytes/pair = 8 bytes/cell of HBM
traffic (vs ~0 for the in-kernel lookup whose operands stay in registers),
so the comparison is MXU-FLOPs+HBM vs pure-VPU ALU.

Measured quantities (traced-k marginal, k inside one jit):
  - select path:  score_batch_device with params.matrix (bit-packed selects)
  - mxu path:     XLA einsum plane + a plane-consuming DP (lax.scan rows,
                  the standard XLA formulation — no Pallas, XLA fuses what
                  it can)
  - plane-only:   the einsum alone (isolates MXU+HBM cost from the DP)
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from versalignlib_tpu.alphabet import blosum62
from versalignlib_tpu.ops.pallas_score import score_batch_device
from versalignlib_tpu.params import AlignmentParameters
from versalignlib_tpu.types import Algorithm

ROOT = pathlib.Path(__file__).resolve().parent.parent


def kmarginal(exec_fn, k_hi=9, tries=3):
    @jax.jit
    def loop(k, tag):
        return jax.lax.fori_loop(
            0, k, lambda i, acc: acc + exec_fn(tag + i), jnp.int32(0))

    t0 = time.perf_counter()
    np.asarray(loop(1, 0))
    compile_s = time.perf_counter() - t0

    def timed(k, tag0):
        best = float("inf")
        for i in range(tries):
            t0 = time.perf_counter()
            np.asarray(loop(k, 64 * (tag0 + i)))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(1, 1)
    tk = timed(k_hi, 9)
    return (tk - t1) / (k_hi - 1), compile_s


def sw_plane_scan(plane, gap_read, gap_ref):
    """SW best score from a (B, m, n) substitution plane — lax.scan over
    rows, prefix-max row solve for the left dependency (ops/xla.py scheme).
    """
    b, m, n = plane.shape
    neg = jnp.int32(-(2 ** 30))

    def row_step(carry, sub_row):
        prev, best = carry     # prev: (B, n+1) H row
        t = jnp.maximum(prev[:, :-1] + sub_row, prev[:, 1:] + gap_ref)
        t = jnp.maximum(t, 0)
        # left dependency: H[j] = max(T[j], H[j-1] + gap_read) via prefix max
        j = jnp.arange(n, dtype=jnp.int32)
        shifted = jax.lax.associative_scan(
            jnp.maximum, t - gap_read * j, axis=1)
        row = shifted + gap_read * j
        row = jnp.maximum(row, 0)
        best = jnp.maximum(best, row.max(axis=1))
        full = jnp.concatenate(
            [jnp.zeros((b, 1), jnp.int32), row], axis=1)
        return (full, best), None

    init = (jnp.zeros((b, n + 1), jnp.int32), jnp.zeros((b,), jnp.int32))
    (_, best), _ = jax.lax.scan(row_step, init, jnp.swapaxes(plane, 0, 1))
    return best


def main() -> int:
    # Device probe in a subprocess (a down tunnel hangs forever in-process).
    import subprocess
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=240)
        if probe.returncode != 0 or "tpu" not in probe.stdout:
            print("FATAL: TPU unavailable", file=sys.stderr)
            return 2
    except subprocess.TimeoutExpired:
        print("FATAL: device init hangs (tunnel down?)", file=sys.stderr)
        return 2

    rng = np.random.default_rng(42)
    results = {"platform": jax.devices()[0].platform,
               "method": "traced-k marginal (see bench.py)", "cases": {}}

    mm = rng.integers(-4, 6, size=(6, 6))
    np.fill_diagonal(mm, 5)
    mm[0, :] = 0
    mm[:, 0] = 0
    cases = {
        "S6": (AlignmentParameters(
            score_gap_read=-3, score_gap_ref=-3,
            matrix=tuple(tuple(int(v) for v in r) for r in mm)), 6),
        "S25_blosum62": (AlignmentParameters(
            score_gap_read=-1, score_gap_ref=-1, matrix=blosum62()), 25),
    }
    B, m, n = 8192, 512, 512
    cells = B * m * n

    for name, (params, S) in cases.items():
        reads = rng.integers(1, S, size=(B, m)).astype(np.uint8)
        refs = rng.integers(1, S, size=(B, n)).astype(np.uint8)
        r_dev = jnp.asarray(reads)
        f_dev = jnp.asarray(refs)
        M = jnp.asarray(np.array(params.matrix, dtype=np.int8))

        def select_exec(tag, r=r_dev, f=f_dev, p=params):
            r2 = r.at[0, 0].set(tag % 4 + 1)
            return jnp.sum(score_batch_device(
                r2, f, p, Algorithm.SMITH_WATERMAN, False))

        gap_read = jnp.int32(params.score_gap_read)
        gap_ref = jnp.int32(params.score_gap_ref)

        def plane_of(r, f):
            # int8 one-hot MXU contraction -> int32 plane
            oh_r = jax.nn.one_hot(r, S, dtype=jnp.int8)          # (B, m, S)
            oh_f = jax.nn.one_hot(f, S, dtype=jnp.int8)          # (B, n, S)
            rowt = jax.lax.dot_general(
                oh_r, M, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)                # (B, m, S)
            return jax.lax.dot_general(
                rowt, oh_f, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)                # (B, m, n)

        def mxu_exec(tag, r=r_dev, f=f_dev):
            r2 = r.at[0, 0].set(tag % 4 + 1)
            plane = plane_of(r2, f)
            return jnp.sum(sw_plane_scan(plane, gap_read, gap_ref))

        def plane_only_exec(tag, r=r_dev, f=f_dev):
            r2 = r.at[0, 0].set(tag % 4 + 1)
            return jnp.sum(plane_of(r2, f) & 1)   # cheap fold, keeps plane

        case = {}
        for key, fn, k_hi in (("select_pallas", select_exec, 9),
                              ("mxu_plane_dp", mxu_exec, 3),
                              ("mxu_plane_only", plane_only_exec, 3)):
            try:
                sec, comp = kmarginal(fn, k_hi=k_hi)
                case[key] = {"gcups": round(cells / sec / 1e9, 1),
                             "sec_per_exec": round(sec, 4),
                             "compile_s": round(comp, 1)}
                print(f"{name}/{key}: {case[key]['gcups']} GCUPS "
                      f"({sec*1e3:.1f} ms/exec)", flush=True)
            except Exception as exc:  # noqa: BLE001
                case[key] = {"error": str(exc)[:300]}
                print(f"{name}/{key}: ERROR {exc}", flush=True)
        results["cases"][name] = case

    sel = results["cases"]["S25_blosum62"].get("select_pallas", {})
    mxu = results["cases"]["S25_blosum62"].get("mxu_plane_dp", {})
    if "gcups" in sel and "gcups" in mxu:
        win = mxu["gcups"] > sel["gcups"]
        results["verdict"] = (
            ("ADOPT: one-hot MXU plane beats bit-packed selects at S=25"
             if win else
             "REJECT: bit-packed VPU selects beat the MXU plane formulation")
            + " — the in-kernel lookup has no shared contraction axis for "
              "the systolic array (both indices are lane-local), so the "
              "only MXU formulation materializes the (m, n) plane through "
              "HBM at 8 bytes/cell; measured numbers above.")
        results["adopt"] = bool(win)
    out = ROOT / "MXU_PROBE.json"
    out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
