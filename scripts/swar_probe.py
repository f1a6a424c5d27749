#!/usr/bin/env python
"""SWAR int16 feasibility probe (VERDICT r2 item 2) — measured verdict.

Every reference backend computes DP cells in int16 lanes
(/root/reference/src/Kernels/AVX-SSE/SSEKernel.h:24,
/root/reference/src/Kernels/OpenCL/opencl_definitions.cl:47) for 2x the
lanes per vector op. On this Mosaic stack packed int16 ALU ops do not
lower (vector<8x128x2xi16> maxsi/cmpi fail — re-probed here), so the only
int16 route is SWAR: two biased 15-bit fields per int32 lane.

This probe measures the actual VPU cost of the two candidate inner loops:

  int32:  cur = max(max(diag + s, up + g), max(left + g, 0)); best |> max
          -> 3 adds + 4 maxes per CELL
  SWAR:   same recurrence on 2 packed cells; each field-wise max needs
          guard-bit compare + mask-smear + blend:
            d = (a | 0x80008000) - b            (fields 15-bit, guards 0)
            m = ((d >> 15) & 0x00010001) * 0xFFFF
            out = b ^ ((a ^ b) & m)
          -> 6 ops per max (or + sub + shift + and + mul + xor + and + xor
          = 8 when the blend can't reuse terms); 3 adds + 4 maxes becomes
          3 + 4*8 = 35 ops per WORD = 17.5 per cell vs 7 per cell, BEFORE
          the field-wise substitution lookup (equality per field adds ~6
          more vs 4). Break-even needs SWAR <= 2x int32 time per op-mix
          iteration; the math predicts ~2.5x. This script measures it.

Writes SWAR_PROBE.json. Run on the real TPU (tunnel must be up).
"""

import functools
import json
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import numpy as np


def main() -> int:
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=240)
        if probe.returncode != 0 or "tpu" not in probe.stdout:
            print("TPU unreachable; SWAR probe needs hardware", file=sys.stderr)
            return 2
    except subprocess.TimeoutExpired:
        print("device init hangs (tunnel down)", file=sys.stderr)
        return 2

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out = {}

    # --- 1) native packed int16: does Mosaic lower it yet? -----------------
    def i16_kernel(x_ref, o_ref):
        a = x_ref[...]
        o_ref[...] = jnp.maximum(a, a + jnp.int16(1))

    x16 = jnp.zeros((8, 128, 2), jnp.int16)
    try:
        pl.pallas_call(
            i16_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128, 2), jnp.int16),
        )(x16).block_until_ready()
        out["mosaic_packed_int16"] = "OK — revisit a native int16 kernel!"
    except Exception as e:  # noqa: BLE001 — record the lowering failure
        out["mosaic_packed_int16"] = f"FAILS: {str(e)[:200]}"

    # --- 2) op-mix microbench: K iterations of the DP cell update ----------
    K = 1 << 21

    def swar_max(a, b):
        guard = jnp.full((), 0x80008000 - (1 << 32), jnp.int32)
        d = (a | guard) - b
        m = ((d >> 15) & jnp.full((), 0x00010001, jnp.int32)) \
            * jnp.full((), 0xFFFF, jnp.int32)
        return b ^ ((a ^ b) & m)

    # CH independent dependency chains of register-resident (8, 128) vregs:
    # ALU-throughput-bound like the real wavefront kernel (which runs near
    # VPU peak at ~360 GCUPS x 11 ops/cell), NOT VMEM- or latency-bound. A
    # first cut with a (256, 8, 128) VMEM-carried loop was bandwidth-bound
    # and flattered SWAR (ratio 1.29); registers tell the true ALU story.
    CH = 8

    def mix_kernel(x_ref, o_ref, *, swar: bool, k_iters: int):
        mx = swar_max if swar else jnp.maximum
        g = jnp.int32(3)

        def body(_, carry):
            new = []
            for diag, up, left, best in carry:
                # the linear SW recurrence shape: 3 adds + 4 maxes
                cur = mx(mx(diag + g, up + g),
                         mx(left + g, jnp.zeros_like(left)))
                best = mx(best, cur)
                new.append((up, cur, cur, best))
            return tuple(new)

        z = x_ref[...]
        chains = tuple((z + c, z + c, z + c, z + c) for c in range(CH))
        res = jax.lax.fori_loop(0, k_iters, body, chains)
        acc = res[0][3]
        for c in range(1, CH):
            acc = acc + res[c][3]
        o_ref[...] = acc

    x = jnp.zeros((8, 128), jnp.int32)
    times = {}
    for name, swar in (("int32", False), ("swar", True)):
        ts = {}
        for k_iters in (K, 4 * K):
            run = pl.pallas_call(
                functools.partial(mix_kernel, swar=swar, k_iters=k_iters),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            )
            jitted = jax.jit(run)
            np.asarray(jitted(x))  # compile+warm
            best = float("inf")
            for rep in range(6):
                xi = x.at[0, 0].set(rep)  # defeat the result cache
                t0 = time.perf_counter()
                np.asarray(jnp.sum(jitted(xi)))
                best = min(best, time.perf_counter() - t0)
            ts[k_iters] = best
        # marginal between K and 4K cancels the tunnel RTT
        times[name] = (ts[4 * K] - ts[K]) / (3 * K)
        cells = 8 * 128 * CH * (2 if swar else 1)
        out[f"{name}_gcells_per_s"] = round(cells / times[name] / 1e9, 1)
    out["swar_vs_int32_time_ratio"] = round(times["swar"] / times["int32"], 2)
    out["verdict"] = (
        "SWAR WINS (ratio < 2: two cells per lane pay off)"
        if times["swar"] / times["int32"] < 2.0
        else "SWAR LOSES (field-max blend overhead eats the 2x lane gain; "
             "int32 cells stay the ceiling until Mosaic lowers packed i16)")

    (ROOT / "SWAR_PROBE.json").write_text(json.dumps(out, indent=2) + "\n")
    for k, v in out.items():
        print(f"{k}: {v}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
