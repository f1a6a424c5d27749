"""Device-side traceback walk: packed pointer rows -> per-row path records.

The round-2 pipeline ships the FULL packed pointer matrix device->host
(2 bits/cell: 4KB/pair at 128x128, 64KB at 512x512) and walks it with the
native C++ decoder — mirroring the reference's scalar per-lane backtrack
(/root/reference/src/Kernels/AVX-SSE/SSEKernel.cpp:785-860). That makes the
device->host link the e2e ceiling on real hosts (PCIe 16GB/s / 4KB ~= 4M
alns/s at 128bp). This module walks the pointers ON DEVICE and ships only a
compact per-row record stream (4 bytes/row/pair — 8x fewer bytes at 128bp,
32x at 512bp), leaving the host a branch-free linear replay.

Key observation making the walk vectorizable: along any traceback path the
read row index is non-increasing, and within one row the path is exactly
``k LEFT moves then one exit move`` (UP / DIAG / START) — any UP/DIAG leaves
the row. So the walk over a whole 1024-pair block is a lockstep scan over
rows from the bottom, and each pair's per-row work is branchless:

- the LEFT-run length is computed arithmetically from the row's packed
  2-bit codes: per int32 word, a "not-LEFT" flag bit per field
  (``~((w>>1) & ~w) & 0x5555_5555``), masked to fields <= the cursor
  column; the run ends at the highest such flag (31 - clz), maxed across
  words — O(words/row) vector ops, no data-dependent loop;
- the exit move is the 2-bit code at the stop column (one select chain
  over words + a per-lane variable shift);
- the cursor column advances by the run length (+1 for DIAG), the record
  ``left_count*4 | exit_code`` is emitted, and lanes activate/retire by
  comparing the row index against their start row / a done flag.

Boundary semantics replicate ops/traceback.decode_one exactly: row 0 above
the matrix is all-START; column -1 is UP for NW (DefaultKernel.cpp:304) and
START for SW. NW end coordinates and the end-cell score (from the captured
last-valid-row H) are derived on device, so nothing but records + (4,)
scalars per pair crosses the link.

Cost: ~15 vector ops per packed word per row ~= 8% of the fill's ALU work —
the walk rides along essentially free; the win is the link bytes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from versalignlib_tpu.params import AlignmentParameters
from versalignlib_tpu.types import Algorithm, Alignment, Trace, cigar_from_gapped

#: per-2-bit-field flag positions (even bits of an int32 word)
_FIELD_BITS = 0x55555555
#: per-4-bit-field flag positions (affine codes)
_FIELD_BITS4 = 0x11111111


def _starts_and_scores(aux, hsel, mrp_b, mxp_b, n: int, local: bool):
    """Traceback start cell + end-cell score, derived on device.

    SW: the device-folded journal IS (score, argmax_row, argmax_col).
    NW: end = (max_read_pos, min(max_ref_pos, argmax of last valid row)),
    score = hsel[start_f + 1] via one masked reduction pass (hsel never
    leaves HBM). Mirrors _decode_chunk's host derivation exactly.
    """
    if local:
        return aux[:, 1], aux[:, 2], aux[:, 0]
    start_r = mrp_b
    start_f = jnp.minimum(mxp_b, aux[:, 0])
    idx = jnp.clip(start_f, -1, n - 1) + 1
    sel = (jnp.arange(n + 1, dtype=jnp.int32)[None, :, None, None]
           == idx[:, None])
    scores = jnp.where(start_r >= 0,
                       jnp.sum(jnp.where(sel, hsel, 0), axis=1), 0)
    return start_r, start_f, scores


@functools.partial(
    jax.jit, static_argnames=("m", "n", "pack", "local"))
def walk_blocks(ptr, aux, hsel, mrp_b, mxp_b, *, m: int, n: int, pack: int,
                local: bool):
    """Walk packed pointer blocks on device.

    Parameters
    ----------
    ptr:   (G, m_pad, nc, 8, 128) int32 — the fill kernel's packed rows.
    aux:   (G, 4, 8, 128) int32 — device-folded journal (see _align_kernel).
    hsel:  (G, n+1, 8, 128) int32 — NW last-valid-row H (None for SW).
    mrp_b: (G, 8, 128) int32 — per-pair max_read_pos (NW; ignored for SW).
    mxp_b: (G, 8, 128) int32 — per-pair max_ref_pos (NW; ignored for SW).

    Returns
    -------
    records: (G, m, 8, 128) int32 — per-row ``left_count*4 | exit_code``
             (exit_code: Trace.START stop / UP / DIAG; rows outside the
             walk hold 0). Row r's record is at records[:, r].
    start_r, start_f, scores: (G, 8, 128) int32 — traceback start cell
             (inner coords) and the alignment score.
    """
    assert pack == 16, "linear pointer words are 16x 2-bit"
    nc = ptr.shape[2]
    start_r, start_f, scores = _starts_and_scores(
        aux, hsel, mrp_b, mxp_b, n, local)

    bnd_code = jnp.int32(Trace.START if local else Trace.UP)
    d_code = jnp.int32(Trace.DIAG)
    s_code = jnp.int32(Trace.START)

    def body(carry, r):
        fp, started, done = carry
        row = jax.lax.dynamic_index_in_dim(ptr, r, axis=1, keepdims=False)
        newly = (start_r == r) & ~started
        started = started | newly
        fp = jnp.where(newly, start_f, fp)
        active = started & ~done
        fpos = fp >= 0
        wi = fp >> 4
        fmod = fp & 15

        # Highest column j_stop <= fp whose code is not LEFT (-1 if none).
        j_stop = jnp.full_like(fp, -1)
        for w in range(nc):
            word = row[:, w]
            is_left = (word >> 1) & ~word & _FIELD_BITS
            stops = ~is_left & _FIELD_BITS
            # Mask to fields <= fp in the cursor word; whole word below it.
            in_word = (2 << (2 * fmod)) - 1          # wraps safely at fmod=15
            stops = jnp.where(wi == w, stops & in_word,
                              jnp.where(wi > w, stops, 0))
            hb = 31 - jax.lax.clz(stops)
            j_stop = jnp.maximum(
                j_stop, jnp.where(stops != 0, w * 16 + (hb >> 1), -1))

        left_cnt = jnp.where(fpos, fp - j_stop, 0)
        # Exit code at (r, j_stop); boundary when the run hit column -1 or
        # the row started there (NW UP chain / SW stop).
        wj = j_stop >> 4
        fj = j_stop & 15
        code = jnp.zeros_like(fp)
        for w in range(nc):
            code = jnp.where(wj == w, (row[:, w] >> (2 * fj)) & 3, code)
        code = jnp.where(fpos & (j_stop >= 0), code, bnd_code)

        rec = jnp.where(active, left_cnt * 4 + code, 0)
        stop_now = active & (code == s_code)
        fp_next = jnp.where(code == d_code, j_stop - 1, j_stop)
        fp = jnp.where(active & fpos & ~stop_now, fp_next, fp)
        done = done | stop_now
        return (fp, started, done), rec

    G = ptr.shape[0]
    shape = (G, ptr.shape[3], ptr.shape[4])
    init = (jnp.full(shape, -1, jnp.int32),
            jnp.zeros(shape, bool), jnp.zeros(shape, bool))
    _, recs = jax.lax.scan(
        body, init, jnp.arange(m - 1, -1, -1, dtype=jnp.int32))
    # recs[k] is row m-1-k; return natural row order, pair-block leading.
    records = jnp.flip(jnp.moveaxis(recs, 0, 1), axis=1)
    return records, start_r, start_f, scores


@functools.partial(
    jax.jit, static_argnames=("m", "n", "pack", "local"))
def walk_blocks_affine(ptr, aux, hsel, mrp_b, mxp_b, *, m: int, n: int,
                       pack: int, local: bool):
    """Affine (Gotoh) device walk — same record format as :func:`walk_blocks`.

    The host three-state walk (native decode_pair_affine_impl /
    gotoh._affine_traceback) collapses to per-row records because rows are
    still ``k LEFT emissions then one exit``; only the run-length rule and
    the UP chaining change:

    - a cell j is LEFT-emitted iff the chain reaches it:
      ``emit(j0) = hptr(j0)==LEFT`` (H enters E) and for j < j0
      ``emit(j) = emit(j+1) & (e_ext(j+1) | hptr(j)==LEFT)`` — an E run
      continues on the *previous* cell's extend bit, or re-enters E from H;
      so the run length is a consecutive-ones scan over
      ``cont(j) = e_ext(j+1) | is_left(j)`` flag bits, same clz trick;
    - an UP exit at cell j puts the NEXT row in state F iff f_ext(j) is
      set; a row entered in state F exits immediately with UP (0 LEFTs),
      chaining on its own cell's f_ext — the per-lane ``in_f`` carry.

    The replayed records are state-free, so the SAME host replay (python
    or native records mode) serves linear and affine walks.
    """
    assert pack == 8, "affine pointer words are 8x 4-bit"
    nc = ptr.shape[2]
    start_r, start_f, scores = _starts_and_scores(
        aux, hsel, mrp_b, mxp_b, n, local)

    bnd_code = jnp.int32(Trace.START if local else Trace.UP)
    d_code = jnp.int32(Trace.DIAG)
    u_code = jnp.int32(Trace.UP)
    l_code = jnp.int32(Trace.LEFT)
    s_code = jnp.int32(Trace.START)

    def body(carry, r):
        fp, in_f, started, done = carry
        row = jax.lax.dynamic_index_in_dim(ptr, r, axis=1, keepdims=False)
        newly = (start_r == r) & ~started
        started = started | newly
        fp = jnp.where(newly, start_f, fp)
        in_f = jnp.where(newly, False, in_f)
        active = started & ~done
        fpos = fp >= 0

        # Per-word flag planes (bit 4f per field).
        eL = [None] * nc
        eX = [None] * nc
        for w in range(nc):
            word = row[:, w]
            eL[w] = (word >> 1) & ~word & _FIELD_BITS4  # hptr == LEFT
            eX[w] = (word >> 2) & _FIELD_BITS4          # e_ext
        # cont(j) = e_ext(j+1) | is_left(j); eX beyond the last column is 0.
        cont = [
            (((eX[w] >> 4) | (eX[w + 1] << 28)) if w + 1 < nc
             else (eX[w] >> 4)) | eL[w]
            for w in range(nc)
        ]

        def code4_at(j):
            """Full 4-bit code at column j (word select + variable shift)."""
            wj = j >> 3
            fj = j & 7
            c = jnp.zeros_like(j)
            for w in range(nc):
                c = jnp.where(wj == w, (row[:, w] >> (4 * fj)) & 15, c)
            return c

        # State H: LEFT-run length. eL(fp) gates the chain; the chain scan
        # runs over cont masked to fields <= fp-1.
        code_fp = code4_at(jnp.maximum(fp, 0))
        enters_e = (code_fp & 3) == l_code
        p = fp - 1          # highest chain position
        wi = p >> 3
        fm = p & 7
        jb_chain = jnp.full_like(fp, -1)
        for w in range(nc):
            stops = ~cont[w] & _FIELD_BITS4
            in_word = (2 << (4 * fm)) - 1
            stops = jnp.where(wi == w, stops & in_word,
                              jnp.where(wi > w, stops, 0))
            hb = 31 - jax.lax.clz(stops)
            jb_chain = jnp.maximum(
                jb_chain, jnp.where(stops != 0, w * 8 + (hb >> 2), -1))
        # Cursor after the run: fp when no E entry, else the chain break.
        jb = jnp.where(enters_e, jb_chain, fp)
        left_cnt = fp - jb

        code_jb = code4_at(jnp.maximum(jb, 0))
        hp = code_jb & 3
        f_ext = (code_jb >> 3) & 1

        # Three cases: row entered in F (immediate UP, chain on own f_ext);
        # H with cursor in-bounds (exit by hptr); boundary (jb<0 or fp<0).
        h_code = jnp.where(jb >= 0, hp, bnd_code)
        code = jnp.where(in_f, u_code, h_code)
        cnt = jnp.where(in_f | ~fpos, 0, left_cnt)
        code = jnp.where(fpos, code, bnd_code)

        rec = jnp.where(active, cnt * 4 + code, 0)
        stop_now = active & (code == s_code)
        # fp update: DIAG consumes the cursor column; UP keeps it; F rows
        # keep fp untouched.
        fp_next = jnp.where(code == d_code, jb - 1, jb)
        fp = jnp.where(active & fpos & ~in_f & ~stop_now, fp_next, fp)
        # Next-row state F: an UP exit chaining on the exit cell's f_ext
        # (for F rows, their own cell = code_fp; for H rows, the cursor).
        fx_here = jnp.where(in_f, (code_fp >> 3) & 1, f_ext)
        in_f = active & fpos & (code == u_code) & (fx_here == 1) & (
            jnp.where(in_f, fp, jb) >= 0)
        done = done | stop_now
        return (fp, in_f, started, done), rec

    G = ptr.shape[0]
    shape = (G, ptr.shape[3], ptr.shape[4])
    init = (jnp.full(shape, -1, jnp.int32), jnp.zeros(shape, bool),
            jnp.zeros(shape, bool), jnp.zeros(shape, bool))
    _, recs = jax.lax.scan(
        body, init, jnp.arange(m - 1, -1, -1, dtype=jnp.int32))
    records = jnp.flip(jnp.moveaxis(recs, 0, 1), axis=1)
    return records, start_r, start_f, scores


# ---------------------------------------------------------------------------
# Banded walks: window-relative packed words (8 fields/word; 2-bit linear,
# 4-bit affine), per-row window base + band offsets. Records are the SAME
# format as the dense walks, so the host replay below is shared. The banded
# boundary rule differs from dense NW: walking off the band (either edge,
# incl. column -1) is a hard stop (START record), never an UP chain —
# mirroring _banded_decode_one / banded_align_oracle.
# ---------------------------------------------------------------------------

#: per-2-bit-field flag positions of BANDED linear words (8 fields in the
#: low 16 bits; dense linear packs 16 fields and uses _FIELD_BITS).
_FIELD_BITS_B2 = 0x5555


def _banded_starts(best, keep, mrp_b, mxp_b, offsets, wbase, n: int,
                   band: int, local: bool):
    """Banded traceback start cell + score, derived on device.

    SW: the fill's best registers ARE (score, argmax_row, argmax_col).
    NW: start = (mrp, argmax over the captured last-valid-row H restricted
    to the in-band window ``[o, min(o+band, n, mxp+1))``), first max wins —
    mirroring banded_align_batch's host derivation element for element.
    """
    if local:
        return best[:, 1], best[:, 2], best[:, 0]
    rp = mrp_b
    safe = jnp.maximum(rp, 0)
    o = offsets[safe]
    wb = wbase[safe]
    hi = jnp.minimum(jnp.minimum(o + band, n), mxp_b + 1)
    ok = (rp >= 0) & (hi > o)
    kk = jnp.arange(keep.shape[1], dtype=jnp.int32)[None, :, None, None]
    valid = (kk >= (o - wb)[:, None]) & (kk < (hi - wb)[:, None])
    vals = jnp.where(valid, keep, jnp.int32(-(2**31)))
    arg = jnp.argmax(vals, axis=1).astype(jnp.int32)  # first max, as host
    score = jnp.max(vals, axis=1)
    return (jnp.where(ok, rp, -1), jnp.where(ok, wb + arg, -1),
            jnp.where(ok, score, 0))


@functools.partial(jax.jit, static_argnames=("m", "n", "band", "local"))
def walk_blocks_banded(ptr, best, keep, mrp_b, mxp_b, offsets, wbase, *,
                       m: int, n: int, band: int, local: bool):
    """Walk banded packed pointer blocks on device (linear gaps).

    Parameters
    ----------
    ptr:     (G, m_pad, wc, 8, 128) int32 — window-relative packed rows
             (8x 2-bit codes per word, low 16 bits).
    best:    (G, 4, 8, 128) int32 — SW end registers (score, row, col).
    keep:    (G, win, 8, 128) int32 — NW captured last-valid-row H
             (window-relative to ``wbase[mrp]``); ignored for SW.
    mrp_b/mxp_b: (G, 8, 128) int32 — last valid read/ref positions (NW).
    offsets: (m_pad,) int32 — band start column per row.
    wbase:   (m_pad,) int32 — window base column per row (per row tile).

    Returns ``records, start_r, start_f, scores`` exactly like
    :func:`walk_blocks`; the cursor is an ABSOLUTE ref column, converted
    per row through ``wbase``/``offsets``. Per-row work is the same
    clz-over-flag-bits LEFT-run arithmetic, band-clipped on both edges.
    """
    wc = ptr.shape[2]
    start_r, start_f, scores = _banded_starts(
        best, keep, mrp_b, mxp_b, offsets, wbase, n, band, local)

    d_code = jnp.int32(Trace.DIAG)
    s_code = jnp.int32(Trace.START)
    widx = jnp.arange(wc, dtype=jnp.int32)[None, :, None, None]
    full = jnp.int32(_FIELD_BITS_B2)

    def body(carry, r):
        fp, started, done = carry
        row = jax.lax.dynamic_index_in_dim(ptr, r, axis=1, keepdims=False)
        off_r = offsets[r]
        wb_r = wbase[r]
        newly = (start_r == r) & ~started
        started = started | newly
        fp = jnp.where(newly, start_f, fp)
        active = started & ~done
        kb = fp - off_r
        live = active & (kb >= 0) & (kb < band)

        k_f = fp - wb_r                     # cursor field (window-relative)
        lo_k = off_r - wb_r                 # band low edge field (scalar)
        is_left = (row >> 1) & ~row & full
        stops = ~is_left & full
        # Mask stop flags to fields in [lo_k, k_f].
        wi = k_f >> 3
        fm = k_f & 7
        hi_m = jnp.where(widx == wi[:, None], ((2 << (2 * fm)) - 1)[:, None],
                         jnp.where(widx < wi[:, None], full, 0))
        lo_w = lo_k >> 3
        lo_f = lo_k & 7
        lo_bits = jnp.int32(-1) << (2 * lo_f)
        lo_m = jnp.where(widx == lo_w, lo_bits,
                         jnp.where(widx > lo_w, full, 0))
        stops = stops & hi_m & lo_m
        hb = 31 - jax.lax.clz(stops)
        cand = widx * 8 + (hb >> 1)
        k_stop = jnp.max(jnp.where(stops != 0, cand, -1), axis=1)

        found = k_stop >= 0
        left_cnt = jnp.where(found, k_f - k_stop, k_f - lo_k + 1)
        wj = k_stop >> 3
        fj = k_stop & 7
        code_sel = jnp.max(
            jnp.where(widx == wj[:, None],
                      (row >> (2 * fj[:, None])) & 3, 0), axis=1)
        code = jnp.where(found, code_sel, s_code)
        code = jnp.where(live, code, s_code)
        cnt = jnp.where(live, left_cnt, 0)

        rec = jnp.where(active, cnt * 4 + code, 0)
        stop_now = active & (code == s_code)
        k_next = jnp.where(code == d_code, k_stop - 1, k_stop)
        fp = jnp.where(live & ~stop_now, wb_r + k_next, fp)
        done = done | stop_now
        return (fp, started, done), rec

    G = ptr.shape[0]
    shape = (G, ptr.shape[3], ptr.shape[4])
    init = (jnp.full(shape, -1, jnp.int32),
            jnp.zeros(shape, bool), jnp.zeros(shape, bool))
    _, recs = jax.lax.scan(
        body, init, jnp.arange(m - 1, -1, -1, dtype=jnp.int32))
    records = jnp.flip(jnp.moveaxis(recs, 0, 1), axis=1)
    return records, start_r, start_f, scores


@functools.partial(jax.jit, static_argnames=("m", "n", "band", "local"))
def walk_blocks_banded_affine(ptr, best, keep, mrp_b, mxp_b, offsets, wbase,
                              *, m: int, n: int, band: int, local: bool):
    """Banded affine (Gotoh) device walk — records shared with all walks.

    Same three-state collapse as :func:`walk_blocks_affine` (E runs are a
    consecutive-ones scan over ``cont(j) = e_ext(j+1) | is_left(j)``; F rows
    exit UP immediately chaining on their own f_ext), with the banded
    boundary rule: an E run that reaches the band's low edge emits down to
    it and hard-stops, and a row entered out of band stops before emitting
    (START record) — mirroring _banded_decode_one's loop-top band check.
    """
    wc = ptr.shape[2]
    start_r, start_f, scores = _banded_starts(
        best, keep, mrp_b, mxp_b, offsets, wbase, n, band, local)

    d_code = jnp.int32(Trace.DIAG)
    u_code = jnp.int32(Trace.UP)
    l_code = jnp.int32(Trace.LEFT)
    s_code = jnp.int32(Trace.START)
    widx = jnp.arange(wc, dtype=jnp.int32)[None, :, None, None]
    full = jnp.int32(_FIELD_BITS4)

    def body(carry, r):
        fp, in_f, started, done = carry
        row = jax.lax.dynamic_index_in_dim(ptr, r, axis=1, keepdims=False)
        off_r = offsets[r]
        wb_r = wbase[r]
        newly = (start_r == r) & ~started
        started = started | newly
        fp = jnp.where(newly, start_f, fp)
        in_f = jnp.where(newly, False, in_f)
        active = started & ~done
        kb = fp - off_r
        live = active & (kb >= 0) & (kb < band)

        k_f = fp - wb_r
        lo_k = off_r - wb_r
        eL = (row >> 1) & ~row & full       # hptr == LEFT
        eX = (row >> 2) & full              # e_ext
        # cont(j) = e_ext(j+1) | is_left(j); field j+1 crosses words upward.
        eX_hi = jnp.concatenate(
            [eX[:, 1:], jnp.zeros_like(eX[:, :1])], axis=1)
        cont = ((eX >> 4) | (eX_hi << 28)) | eL

        def code4_at(k):
            wj = k >> 3
            fj = k & 7
            return jnp.max(
                jnp.where(widx == wj[:, None],
                          (row >> (4 * fj[:, None])) & 15, 0), axis=1)

        code_fp = code4_at(jnp.maximum(k_f, 0))
        enters_e = (code_fp & 3) == l_code
        # Chain-stop scan over fields [lo_k, k_f - 1].
        p = k_f - 1
        wi = p >> 3
        fm = p & 7
        stops = ~cont & full
        hi_m = jnp.where(widx == wi[:, None], ((2 << (4 * fm)) - 1)[:, None],
                         jnp.where(widx < wi[:, None], full, 0))
        lo_w = lo_k >> 3
        lo_f = lo_k & 7
        lo_bits = jnp.int32(-1) << (4 * lo_f)
        lo_m = jnp.where(widx == lo_w, lo_bits,
                         jnp.where(widx > lo_w, full, 0))
        stops = stops & hi_m & lo_m
        hb = 31 - jax.lax.clz(stops)
        cand = widx * 8 + (hb >> 2)
        jb_chain = jnp.max(jnp.where(stops != 0, cand, -1), axis=1)

        jb = jnp.where(enters_e, jb_chain, k_f)
        found = jb >= lo_k
        left_cnt = jnp.where(found, k_f - jb, k_f - lo_k + 1)
        code_jb = code4_at(jnp.maximum(jb, 0))
        hp = code_jb & 3
        f_ext = (code_jb >> 3) & 1

        h_code = jnp.where(found, hp, s_code)
        code = jnp.where(in_f, u_code, h_code)
        cnt = jnp.where(in_f, 0, left_cnt)
        code = jnp.where(live, code, s_code)
        cnt = jnp.where(live, cnt, 0)

        rec = jnp.where(active, cnt * 4 + code, 0)
        stop_now = active & (code == s_code)
        k_next = jnp.where(code == d_code, jb - 1, jb)
        fp = jnp.where(live & ~in_f & ~stop_now, wb_r + k_next, fp)
        fx_here = jnp.where(in_f, (code_fp >> 3) & 1, f_ext)
        in_f = live & (code == u_code) & (fx_here == 1)
        done = done | stop_now
        return (fp, in_f, started, done), rec

    G = ptr.shape[0]
    shape = (G, ptr.shape[3], ptr.shape[4])
    init = (jnp.full(shape, -1, jnp.int32), jnp.zeros(shape, bool),
            jnp.zeros(shape, bool), jnp.zeros(shape, bool))
    _, recs = jax.lax.scan(
        body, init, jnp.arange(m - 1, -1, -1, dtype=jnp.int32))
    records = jnp.flip(jnp.moveaxis(recs, 0, 1), axis=1)
    return records, start_r, start_f, scores


# ---------------------------------------------------------------------------
# Host replay: records -> Alignment (python reference; native fast path in
# versalignlib_tpu.native)
# ---------------------------------------------------------------------------

def _text_from_codes(codes: np.ndarray) -> str:
    table = "\0ATCGN"
    return "".join(table[int(c)] if 0 <= int(c) <= 5 else "\0" for c in codes)


def replay_one(
    records: np.ndarray,
    read: np.ndarray,
    ref: np.ndarray,
    start_read_pos: int,
    start_ref_pos: int,
    score: int,
    params: AlignmentParameters,
    algorithm: Algorithm,
    read_text: str | None = None,
    ref_text: str | None = None,
) -> Alignment:
    """Replay one pair's device walk records into an Alignment.

    Produces output identical to ops/traceback.decode_one on the same
    pointer matrix (test-gated); the walk order and boundary handling
    mirror it move for move.
    """
    m = records.shape[0]
    n = ref.shape[0]
    if read_text is None:
        read_text = _text_from_codes(read)
    if ref_text is None:
        ref_text = _text_from_codes(ref)
    rp, fp = int(start_read_pos), int(start_ref_pos)
    read_chars: list[str] = []
    ref_chars: list[str] = []
    steps = 0
    while rp >= 0:
        rec = int(records[rp])
        k = rec >> 2
        code = rec & 3
        for _ in range(k):
            read_chars.append("-")
            ref_chars.append(ref_text[fp])
            fp -= 1
        steps += k
        if code == Trace.START:
            break
        if code == Trace.UP:
            read_chars.append(read_text[rp])
            ref_chars.append("-")
        else:  # DIAG
            read_chars.append(read_text[rp])
            ref_chars.append(ref_text[fp])
            fp -= 1
        rp -= 1
        steps += 1

    read_g = "".join(reversed(read_chars))
    ref_g = "".join(reversed(ref_chars))
    aln_length = m + n
    return Alignment(
        read=read_g,
        ref=ref_g,
        score=int(score),
        cigar=cigar_from_gapped(read_g, ref_g),
        read_start=rp + 1,
        read_end=int(start_read_pos) + 1,
        ref_start=fp + 1,
        ref_end=int(start_ref_pos) + 1,
        buffer_start=aln_length - 1 - steps,
        buffer_end=aln_length - 1,
    )


def replay_batch(
    records: np.ndarray,
    reads: np.ndarray,
    refs: np.ndarray,
    start_read_pos: np.ndarray,
    start_ref_pos: np.ndarray,
    scores: np.ndarray,
    params: AlignmentParameters,
    algorithm: Algorithm,
    read_texts: list[str] | None = None,
    ref_texts: list[str] | None = None,
    raw: bool = False,
    gapped: bool = True,
):
    """Replay a batch; prefers the native decoder, falls back to Python."""
    try:
        from versalignlib_tpu.native import replay_records_native

        return replay_records_native(
            records, reads, refs, start_read_pos, start_ref_pos, scores,
            params, algorithm, read_texts, ref_texts, raw=raw,
            gapped=gapped)
    except ImportError:
        if raw:
            raise
    return [
        replay_one(
            records[i], reads[i], refs[i], int(start_read_pos[i]),
            int(start_ref_pos[i]), int(scores[i]), params, algorithm,
            None if read_texts is None else read_texts[i],
            None if ref_texts is None else ref_texts[i],
        )
        for i in range(records.shape[0])
    ]
