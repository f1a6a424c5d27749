#!/usr/bin/env python
"""Banded record-replay budget bench (CPU-only) — VERDICT-r4 weak #6.

The banded device-walk pipeline ships ONE int32 record per read row per
pair (``left_count*4 | exit_code``, ops/walk.py) and replays it host-side
with the shared native records decoder. At long-read shapes this script
answers: is the banded e2e pipeline LINK-bound or DECODE-bound on a real
host, and at what alns/s?

Synthesizes realistic banded-walk records (mostly-DIAG exits with short
LEFT runs, full-length paths — the worst case for the replay, which is
O(path)), times the native replay alone, and prints the budget table:
records bytes/pair, replay alns/s, and the ceilings for PCIe (~16 GB/s),
a 10 GbE fabric, and this workspace's tunnel (~5-65 MB/s).

Usage: python scripts/bench_banded_replay.py [--pairs 4096] [--len 16384]
"""

import argparse
import json
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import numpy as np


def synth_records(b: int, m: int, n: int, seed: int = 0):
    """Records + starts shaped like a real banded SW walk: the path starts
    near (m-1, ~n-1), exits rows mostly by DIAG (1 column) with occasional
    UP (0 columns) and LEFT runs (1-3 columns), and STARTs near row 0."""
    rng = np.random.default_rng(seed)
    # exit codes: 1 UP (8%), 3 DIAG (92%); left counts 0-3 biased to 0
    exits = rng.choice(np.array([1, 3], np.int32), size=(b, m), p=[0.08, 0.92])
    lefts = rng.choice(np.arange(4, dtype=np.int32), size=(b, m),
                       p=[0.82, 0.10, 0.05, 0.03])
    records = lefts * 4 + exits
    # terminate each walk close to row 0 (full-length paths)
    stop_rows = rng.integers(0, 8, size=b)
    for i in range(b):
        records[i, stop_rows[i]] = 0  # START exit, left_count 0
    start_r = np.full(b, m - 1, np.int32)
    start_f = (n - 1 - rng.integers(0, 16, size=b)).astype(np.int32)
    scores = rng.integers(100, 2 * m, size=b).astype(np.int32)
    return records, start_r, start_f, scores


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=4096)
    ap.add_argument("--len", type=int, dest="length", default=16384)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--threads", type=int, default=None)
    args = ap.parse_args()

    from versalignlib_tpu.native import replay_records_native
    from versalignlib_tpu.params import AlignmentParameters
    from versalignlib_tpu.types import Algorithm

    b, m = args.pairs, args.length
    n = m
    records, start_r, start_f, scores = synth_records(b, m, n)
    rng = np.random.default_rng(1)
    reads = rng.integers(1, 5, size=(b, m)).astype(np.uint8)
    refs = rng.integers(1, 5, size=(b, n)).astype(np.uint8)
    params = AlignmentParameters()

    results = {}
    for label, kw in (("raw_gapped", dict(raw=True, gapped=True)),
                      ("raw_cigar_only", dict(raw=True, gapped=False))):
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = replay_records_native(
                records, reads, refs, start_r, start_f, scores, params,
                Algorithm.SMITH_WATERMAN, n_threads=args.threads, **kw)
            best = min(best, time.perf_counter() - t0)
        rate = b / best
        results[label] = round(rate, 1)
        print(f"[banded replay] {label}: {rate:,.0f} alns/s "
              f"({best*1e3:.0f} ms for {b} pairs of {m} rows)", flush=True)

    rec_bytes = 4 * m            # one int32 record per read row
    results.update({
        "pairs": b, "rows_per_pair": m, "record_bytes_per_pair": rec_bytes,
        "ptr_bytes_per_pair_band512": (512 // 4) * m,  # 2 bits x win cols
    })
    print(f"\nbudget per pair at m={m}, band 512:")
    print(f"  records: {rec_bytes/1024:.0f} KB/pair   "
          f"(pointer-D2H path would ship ~{(512//4)*m/1048576:.1f} MB/pair)")
    for link, bw in (("PCIe gen3 x16 (~16 GB/s)", 16e9),
                     ("10 GbE (~1.2 GB/s)", 1.2e9),
                     ("this tunnel (~30 MB/s)", 30e6)):
        print(f"  {link}: link ceiling {bw/rec_bytes:,.0f} alns/s"
              f"{' <- binding' if bw/rec_bytes < results['raw_cigar_only'] else ''}")
    print(f"  decode ceiling (this {__import__('os').cpu_count()}-core host):"
          f" {results['raw_cigar_only']:,.0f} alns/s")
    out = ROOT / "BANDED_REPLAY.json"
    out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
