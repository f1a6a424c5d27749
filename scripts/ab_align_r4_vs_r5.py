#!/usr/bin/env python
"""Same-process A/B: r4 vs r5 dense align kernels (honest-comparison tool).

Absolute align-fill GCUPS drift +-30% BETWEEN processes on this tunnel even
at deep k, so kernel-vs-kernel claims need BOTH kernels timed in ONE
process (this script measured the r5 context-streams + deep-unroll rewrite
at +6% linear / +2% affine over the r4 kernel — after shallow-k
cross-process readings had suggested 2x).

Pattern for future rounds: load the old kernel module from git
(`git show <commit>:versalignlib_tpu/ops/pallas_align.py`) via importlib,
time both with the traced-k marginal at (k-1)*t_exec >= ~50ms.
"""

import sys, time, importlib.util
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
print("platform:", jax.devices()[0].platform, flush=True)

import pathlib, subprocess
OLD_COMMIT = "36d07d3"   # last commit with the r4 align kernels
old_src = subprocess.run(
    ["git", "show", f"{OLD_COMMIT}:versalignlib_tpu/ops/pallas_align.py"],
    capture_output=True, text=True, check=True,
    cwd=pathlib.Path(__file__).resolve().parent.parent).stdout
old_path = "/tmp/old_pallas_align.py"
pathlib.Path(old_path).write_text(old_src)
spec = importlib.util.spec_from_file_location("old_pallas_align", old_path)
old = importlib.util.module_from_spec(spec)
sys.modules["old_pallas_align"] = old
spec.loader.exec_module(old)

from versalignlib_tpu.ops import pallas_align as new
from versalignlib_tpu.params import AlignmentParameters
from versalignlib_tpu.types import Algorithm, TieBreak

rng = np.random.default_rng(123)
p_lin = AlignmentParameters()
p_aff = AlignmentParameters(score_match=2, score_mismatch=-1, score_gap_read=-1,
                            score_gap_ref=-1, gap_open_read=-4, gap_open_ref=-4)

def kmarginal(exec_fn, cells, k_hi=25, tries=3):
    @jax.jit
    def loop(k, tag):
        return jax.lax.fori_loop(0, k, lambda i, a: a + exec_fn(tag + i), jnp.int32(0))
    np.asarray(loop(1, 0))
    def timed(k, t0g):
        best = float("inf")
        for i in range(tries):
            t0 = time.perf_counter(); np.asarray(loop(k, 64 * (t0g + i)))
            best = min(best, time.perf_counter() - t0)
        return best
    t1 = timed(1, 1); tk = timed(k_hi, 9)
    return round((k_hi - 1) * cells / max(tk - t1, 1e-9) / 1e9, 1)

def make_exec(mod, affine):
    b_, n_ = 4096, 512
    r = rng.integers(1, 5, size=(b_, 512)).astype(np.uint8)
    f = rng.integers(1, 5, size=(b_, n_)).astype(np.uint8)
    g = -(-b_ // 1024)
    mrp = mod._pack_vec(mod._last_valid_pos(r, TieBreak.DIAG_UP_LEFT), g)
    rb = jnp.asarray(mod._pack_blocks(r, g, 512))
    fb = jnp.asarray(mod._pack_blocks(f, g, n_))
    blocks = mod._affine_align_blocks if affine else mod._align_blocks
    p = p_aff if affine else p_lin
    def fn(tag, rb=rb, fb=fb, mrp=mrp):
        rb2 = rb.at[0, 0, 0, 0].set(tag % 4 + 1)
        out = blocks(rb2, fb, mrp, p, Algorithm.SMITH_WATERMAN,
                     TieBreak.DIAG_UP_LEFT, False)
        return jnp.sum(out[1])
    return fn

cells = 4096 * 512 * 512
for label, mod in (("r4", old), ("r5", new)):
    print(f"{label} linear: {kmarginal(make_exec(mod, False), cells)} GCUPS", flush=True)
    print(f"{label} affine: {kmarginal(make_exec(mod, True), cells)} GCUPS", flush=True)
