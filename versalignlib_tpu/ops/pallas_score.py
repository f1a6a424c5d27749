"""Pallas TPU score kernels — the production hot path.

Design ("interpair" kernel): the TPU generalization of the reference's
inter-pair SIMD (8 int16 lanes per SSE instruction, SSEKernel.h:24; 16 per
AVX2/OpenCL work item). Here every VPU op processes a (8, 128) int32 register
tile = **1024 independent pairs at once**:

- pairs are packed along the (sublane, lane) dims: block b holds pairs
  ``b*1024 + s*128 + l`` at ``[s, l]``;
- the DP runs the reference's row-major cell order (DefaultKernel.cpp:93-128)
  sequentially *per pair* but vectorized *across pairs*, so no wavefront
  reordering is needed — the recurrence's data dependencies live entirely
  within a lane;
- the rolling H row (the reference's 2-row matrix, SCORING_ROWS=2,
  SSEKernel.cpp:14) lives in VMEM scratch as (n+1, 8, 128) int32 and is
  updated in place: reading H[j] before overwriting yields the "up" value,
  register carries provide "left" and "diag" — one VMEM load + one store per
  cell;
- the inner loop is unrolled ``unroll`` columns per iteration with chunked
  VMEM loads/stores, keeping the scalar core far ahead of the VPU;
- the grid dimension streams pair blocks; tail pairs are padded with
  all-zero (invalid) sequences, which score 0 — the same fill-up semantics
  as the reference's tail batches (SSEKernel.cpp:84-128).

Semantics are bit-identical to the reference kernels (same recurrence,
clamping, and NW overlap-score bookkeeping as the golden-gated oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from versalignlib_tpu.params import AlignmentParameters
from versalignlib_tpu.types import Algorithm

#: pairs per grid block: one full (sublane, lane) int32 register tile
BLOCK_SUBLANES = 8
BLOCK_LANES = 128
BLOCK_PAIRS = BLOCK_SUBLANES * BLOCK_LANES


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _pick_unroll(n: int) -> int:
    """Largest unroll factor dividing n (no ref padding: it would change NW
    overlap scores, whose per-row bookkeeping reads the LAST column)."""
    for u in (8, 4, 2):
        if n % u == 0:
            return u
    return 1


#: -inf stand-in safe against int32 adds
NEG_INF_I32 = -(2**30)


def _score_kernel(reads_ref, refs_ref, out_ref, h_ref, f_ref, *, m, n, unroll,
                  params: AlignmentParameters, local: bool):
    """One pair-block: reads (1, m, 8, 128), refs (1, n, 8, 128) int32 codes.

    h_ref: (n+1, 8, 128) int32 VMEM scratch (rolling H row).
    f_ref: (n, 8, 128) int32 scratch (rolling Gotoh F row; affine only, else
    a (1, 8, 128) placeholder).
    out_ref: (1, 8, 128) int32 best scores per pair.

    The main loop is a **2-row wavefront**: rows i and i+1 advance together
    with row i+1 one column behind, so row i lives entirely in registers —
    the scratch row is read once (row i-1) and written once (row i+1) per
    column pair. This halves VMEM traffic and loop overhead per cell vs the
    naive rolling row (measured 1.5x on v5e). Odd-m tails run a single-row
    pass. Affine (Gotoh) mode threads E as a register carry per row and the
    F row through the same 2-row scheme (see ops/gotoh.py for the model).
    """
    match = jnp.int32(params.score_match)
    mismatch = jnp.int32(params.score_mismatch)
    gap_read = jnp.int32(params.score_gap_read)
    gap_ref = jnp.int32(params.score_gap_ref)
    affine = params.affine
    open_read = jnp.int32(params.gap_open_read)
    open_ref = jnp.int32(params.gap_open_ref)
    zero = jnp.zeros((BLOCK_SUBLANES, BLOCK_LANES), jnp.int32)
    neg_inf = jnp.full((BLOCK_SUBLANES, BLOCK_LANES), NEG_INF_I32, jnp.int32)
    n_chunks = n // unroll

    # Fresh rows per grid step (scratch persists across grid iterations).
    h_ref[...] = jnp.zeros((n + 1, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32)
    if affine:
        f_ref[...] = jnp.full((n, BLOCK_SUBLANES, BLOCK_LANES), NEG_INF_I32, jnp.int32)

    def sub_of(read_col, read_valid, ref_col):
        valid = read_valid & (ref_col >= 1) & (ref_col <= 4)
        return jnp.where(valid, jnp.where(read_col == ref_col, match, mismatch), 0)

    def lin_cell(sub, diag, up, left, best):
        cur = jnp.maximum(jnp.maximum(diag + sub, up + gap_ref),
                          left + gap_read)
        if local:
            cur = jnp.maximum(cur, 0)
            best = jnp.maximum(best, cur)
        return cur, best

    def aff_cell(sub, diag, h_up, f_up, e_val, left, best):
        f_val = jnp.maximum(h_up + open_ref + gap_ref, f_up + gap_ref)
        e_val = jnp.maximum(left + open_read + gap_read, e_val + gap_read)
        cur = jnp.maximum(jnp.maximum(diag + sub, f_val), e_val)
        if local:
            cur = jnp.maximum(cur, 0)
            best = jnp.maximum(best, cur)
        return cur, f_val, e_val, best

    def row_pair_body(ip, best):
        i = ip * 2
        rc0 = reads_ref[0, i]
        rc1 = reads_ref[0, i + 1]
        rv0 = (rc0 >= 1) & (rc0 <= 4)
        rv1 = (rc1 >= 1) & (rc1 <= 4)
        h0 = h_ref[0]  # column-0 boundary: 0 in both score paths

        def chunk_body(c, carry):
            a_left, a_diag, b_left, b_diag, ea, eb, fa_prev, best = carry
            j0 = c * unroll
            old = h_ref[pl.ds(j0 + 1, unroll)]     # row i-1
            ref_chunk = refs_ref[0, pl.ds(j0, unroll)]
            if affine:
                f_old = f_ref[pl.ds(j0, unroll)]   # F of row i-1
                new_f = []
            store_vals = []
            for u in range(unroll):
                up0 = old[u]
                ref_col = ref_chunk[u]
                s0 = sub_of(rc0, rv0, ref_col)
                s1 = sub_of(rc1, rv1, ref_col)
                if affine:
                    a, fa, ea, best = aff_cell(s0, a_diag, up0, f_old[u], ea, a_left, best)
                    b, fb, eb, best = aff_cell(s1, b_diag, a, fa, eb, b_left, best)
                    new_f.append(fb)
                else:
                    a, best = lin_cell(s0, a_diag, up0, a_left, best)
                    b, best = lin_cell(s1, b_diag, a, b_left, best)
                store_vals.append(b)
                a_diag = up0
                a_left = a
                b_diag = a
                b_left = b
            h_ref[pl.ds(j0 + 1, unroll)] = jnp.stack(store_vals)
            if affine:
                f_ref[pl.ds(j0, unroll)] = jnp.stack(new_f)
            return a_left, a_diag, b_left, b_diag, ea, eb, fa_prev, best

        init = (h0, h0, h0, h0, neg_inf, neg_inf, zero, best)
        a_last, _, b_last, _, _, _, _, best = jax.lax.fori_loop(
            0, n_chunks, chunk_body, init)
        if not local:
            # NW overlap: max over the LAST column of both rows
            # (DefaultKernel.cpp:177). a_last/b_last hold H_i[n]/H_{i+1}[n].
            best = jnp.maximum(best, jnp.maximum(a_last, b_last))
        return best

    def single_row_body(i, best):
        read_col = reads_ref[0, i]
        read_valid = (read_col >= 1) & (read_col <= 4)

        def chunk_body(c, carry):
            h_left, h_diag, e_val, best = carry
            j0 = c * unroll
            old = h_ref[pl.ds(j0 + 1, unroll)]
            ref_chunk = refs_ref[0, pl.ds(j0, unroll)]
            if affine:
                f_old = f_ref[pl.ds(j0, unroll)]
                new_f = []
            new_vals = []
            for u in range(unroll):
                up = old[u]
                s = sub_of(read_col, read_valid, ref_chunk[u])
                if affine:
                    cur, f_val, e_val, best = aff_cell(
                        s, h_diag, up, f_old[u], e_val, h_left, best)
                    new_f.append(f_val)
                else:
                    cur, best = lin_cell(s, h_diag, up, h_left, best)
                new_vals.append(cur)
                h_left = cur
                h_diag = up
            h_ref[pl.ds(j0 + 1, unroll)] = jnp.stack(new_vals)
            if affine:
                f_ref[pl.ds(j0, unroll)] = jnp.stack(new_f)
            return h_left, h_diag, e_val, best

        h0 = h_ref[0]
        h_last, _, _, best = jax.lax.fori_loop(
            0, n_chunks, chunk_body, (h0, h0, neg_inf, best))
        if not local:
            best = jnp.maximum(best, h_last)
        return best

    best = jax.lax.fori_loop(0, m // 2, row_pair_body, zero)
    if m % 2:
        best = single_row_body(m - 1, best)
    if not local:
        # ... and over the entire final row (DefaultKernel.cpp:189-191);
        # clamped >= 0 because the reference's globalMax starts at 0.
        def final_fold(j, b):
            return jnp.maximum(b, h_ref[j])
        best = jax.lax.fori_loop(0, n + 1, final_fold, best)
        best = jnp.maximum(best, 0)
    out_ref[0] = best


@functools.partial(
    jax.jit, static_argnames=("params", "algorithm", "interpret")
)
def _score_blocks(reads_b, refs_b, params: AlignmentParameters,
                  algorithm: Algorithm, interpret: bool = False):
    """reads_b: (G, m, 8, 128) int32; refs_b: (G, n, 8, 128) int32."""
    g, m = reads_b.shape[0], reads_b.shape[1]
    n = refs_b.shape[1]
    local = algorithm == Algorithm.SMITH_WATERMAN
    kernel = functools.partial(
        _score_kernel, m=m, n=n, unroll=_pick_unroll(n),
        params=params, local=local,
    )
    vmem_bytes = 4 * BLOCK_PAIRS * (
        (n + 1)                    # H scratch
        + (n if params.affine else 1)  # F scratch
        + 2 * (m + n)              # double-buffered read/ref blocks
        + 2                        # out
    ) + 1024 * 1024                # headroom
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, m, BLOCK_SUBLANES, BLOCK_LANES),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, BLOCK_SUBLANES, BLOCK_LANES),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_SUBLANES, BLOCK_LANES),
                               lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, BLOCK_SUBLANES, BLOCK_LANES),
                                       jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((n + 1, BLOCK_SUBLANES, BLOCK_LANES), jnp.int32),
            pltpu.VMEM((n if params.affine else 1, BLOCK_SUBLANES, BLOCK_LANES),
                       jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        cost_estimate=pl.CostEstimate(
            flops=12 * g * m * n * BLOCK_PAIRS,
            bytes_accessed=4 * g * (m + n) * BLOCK_PAIRS,
            transcendentals=0,
        ),
        interpret=interpret,
    )(reads_b, refs_b)


@functools.partial(jax.jit, static_argnames=("params", "algorithm", "interpret"))
def score_batch_device(reads, refs, params: AlignmentParameters,
                       algorithm: Algorithm, interpret: bool = False):
    """Device-side batch scoring: (B, m), (B, n) uint8/int32 -> (B,) int32.

    Pads the batch up to a multiple of BLOCK_PAIRS with all-invalid pairs
    (score 0), packs pairs into (G, len, 8, 128) blocks, runs the Pallas
    kernel, and unpacks.
    """
    b, m = reads.shape
    n = refs.shape[1]
    g = max(1, -(-b // BLOCK_PAIRS))
    b_pad = g * BLOCK_PAIRS

    def pack(x, length):
        x = x.astype(jnp.int32)
        x = jnp.pad(x, ((0, b_pad - b), (0, 0)))
        # (b_pad, L) -> (G, 8, 128, L) -> (G, L, 8, 128)
        x = x.reshape(g, BLOCK_SUBLANES, BLOCK_LANES, length)
        return jnp.transpose(x, (0, 3, 1, 2))

    out = _score_blocks(pack(reads, m), pack(refs, n), params, algorithm,
                        interpret)
    # (G, 8, 128) -> (b,)
    return out.reshape(b_pad)[:b]


class PallasScorer:
    """Thin host wrapper choosing compiled vs interpreter mode."""

    def __init__(self, interpret: bool | None = None):
        self.interpret = (not _is_tpu()) if interpret is None else interpret

    def __call__(self, reads, refs, params, algorithm):
        if reads.shape[1] == 0 or refs.shape[1] == 0:
            # Degenerate empty sequences: all scores 0.
            return np.zeros(reads.shape[0], dtype=np.int32)
        out = score_batch_device(
            jnp.asarray(reads), jnp.asarray(refs), params,
            Algorithm(algorithm), self.interpret,
        )
        return np.asarray(out, dtype=np.int32)
