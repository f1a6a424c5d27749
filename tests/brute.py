"""Brute-force triple-loop DP, transcribing the reference recurrences 1:1.

This is an independent re-derivation of DefaultKernel's loops used ONLY to
validate the vectorized oracle on small inputs; deliberately the dumbest
possible implementation.
"""

from __future__ import annotations

import numpy as np

from versalignlib_tpu.alphabet import base_score_matrix
from versalignlib_tpu.params import AlignmentParameters
from versalignlib_tpu.types import TieBreak, Trace


def _sub(params: AlignmentParameters):
    return base_score_matrix(params.score_match, params.score_mismatch)


def brute_sw_score(read, ref, p: AlignmentParameters) -> int:
    bs = _sub(p)
    m, n = len(read), len(ref)
    h = np.zeros((m + 1, n + 1), dtype=np.int64)
    best = 0
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            diag = h[i - 1][j - 1] + bs[read[i - 1]][ref[j - 1]]
            cur = max(h[i - 1][j] + p.score_gap_ref, h[i][j - 1] + p.score_gap_read, diag, 0)
            h[i][j] = cur
            best = max(best, cur)
    return int(best)


def brute_nw_score(read, ref, p: AlignmentParameters) -> int:
    bs = _sub(p)
    m, n = len(read), len(ref)
    h = np.zeros((m + 1, n + 1), dtype=np.int64)
    best = 0
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            diag = h[i - 1][j - 1] + bs[read[i - 1]][ref[j - 1]]
            h[i][j] = max(h[i - 1][j] + p.score_gap_ref, h[i][j - 1] + p.score_gap_read, diag)
        best = max(best, int(h[i][n]))
    for j in range(n + 1):
        best = max(best, int(h[m][j]))
    return int(best)


def brute_sw_pointers(read, ref, p: AlignmentParameters, tie: TieBreak):
    """(h, ptr, best_read_pos, best_ref_pos) with the reference's scan."""
    bs = _sub(p)
    m, n = len(read), len(ref)
    h = np.zeros((m + 1, n + 1), dtype=np.int64)
    ptr = np.zeros((m + 1, n + 1), dtype=np.uint8)
    best, bi, bj = 0, 0, 0
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            diag = h[i - 1][j - 1] + bs[read[i - 1]][ref[j - 1]]
            up = h[i - 1][j] + p.score_gap_ref
            left = h[i][j - 1] + p.score_gap_read
            cur = max(up, left, diag, 0)
            h[i][j] = cur
            vc = 1 <= read[i - 1] <= 4 and 1 <= ref[j - 1] <= 4
            if tie == TieBreak.DIAG_UP_LEFT:
                if cur == 0:
                    pv = Trace.START
                elif cur == diag:
                    pv = Trace.DIAG
                elif cur == up:
                    pv = Trace.UP
                else:
                    pv = Trace.LEFT
            else:  # SSE flavor: DIAG needs valid bases; no START force at 0
                if cur == diag and vc:
                    pv = Trace.DIAG
                elif cur == left:
                    pv = Trace.LEFT
                elif cur == up:
                    pv = Trace.UP
                else:
                    pv = Trace.START
            ptr[i][j] = pv
            if cur > best:
                best, bi, bj = cur, i - 1, j - 1
    return h, ptr, bi, bj


def brute_nw_pointers(read, ref, p: AlignmentParameters, tie: TieBreak):
    """(h, ptr, end_read_pos, end_ref_pos) replicating the NW traceback
    variant's boundary + end-cell bookkeeping."""
    bs = _sub(p)
    m, n = len(read), len(ref)
    h = np.zeros((m + 1, n + 1), dtype=np.int64)
    ptr = np.zeros((m + 1, n + 1), dtype=np.uint8)
    max_read_pos = m - 1
    max_ref_pos = n - 1
    global_row_max_index = -1
    row_max_index = 0
    # Boundary validity: Default counts N (code 5) as valid; SSE does not.
    if tie == TieBreak.DIAG_UP_LEFT:
        valid = lambda c: c != 0
    else:
        valid = lambda c: 1 <= c <= 4
    for i in range(1, m + 1):
        read_pos = i - 1
        h[i][0] = i * p.score_gap_ref
        ptr[i][0] = Trace.UP
        if max_read_pos == m - 1 and not valid(read[read_pos]):
            max_read_pos = read_pos - 1
        if max_read_pos + 1 == read_pos:
            global_row_max_index = row_max_index
        row_max = h[i][0]
        row_max_index = 0
        for j in range(1, n + 1):
            ref_pos = j - 1
            diag = h[i - 1][j - 1] + bs[read[read_pos]][ref[ref_pos]]
            up = h[i - 1][j] + p.score_gap_ref
            left = h[i][j - 1] + p.score_gap_read
            cur = max(up, left, diag)
            h[i][j] = cur
            vc = 1 <= read[read_pos] <= 4 and 1 <= ref[ref_pos] <= 4
            if tie == TieBreak.DIAG_UP_LEFT:
                pv = Trace.DIAG if cur == diag else (Trace.UP if cur == up else Trace.LEFT)
            else:
                if cur == diag and vc:
                    pv = Trace.DIAG
                elif cur == left:
                    pv = Trace.LEFT
                elif cur == up:
                    pv = Trace.UP
                else:
                    pv = Trace.START
            ptr[i][j] = pv
            if max_ref_pos == n - 1 and not valid(ref[ref_pos]):
                max_ref_pos = ref_pos - 1
            if cur > row_max:
                row_max = cur
                row_max_index = ref_pos
    if global_row_max_index < 0:
        global_row_max_index = row_max_index
    return h, ptr, max_read_pos, min(max_ref_pos, global_row_max_index)


def brute_traceback(read_str, ref_str, ptr, start_read_pos, start_ref_pos):
    """Reference traceback loop -> (read_gapped, ref_gapped, rp_end, fp_end)."""
    rp, fp = start_read_pos, start_ref_pos
    rg, fg = [], []
    while True:
        bt = ptr[rp + 1][fp + 1]
        if bt == Trace.START:
            break
        if bt == Trace.UP:
            rg.append(read_str[rp]); fg.append("-"); rp -= 1
        elif bt == Trace.LEFT:
            rg.append("-"); fg.append(ref_str[fp]); fp -= 1
        else:
            rg.append(read_str[rp]); fg.append(ref_str[fp]); rp -= 1; fp -= 1
    return "".join(reversed(rg)), "".join(reversed(fg)), rp, fp
