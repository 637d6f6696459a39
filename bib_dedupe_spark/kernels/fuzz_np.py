"""Batched window scan for partial_ratio (packed big-integer SIMD).

Bit-identical to the pure-Python per-window scan in kernels/fuzz.py
(integer LCS → identical floats), but evaluates ALL interior windows
simultaneously: the bit-parallel LCS states of the W windows are packed
into ONE Python big integer, one (len1+1)-bit slot per window (guard bit
absorbs the addition carry), so each scan step is ~6 big-int operations
regardless of W. The per-step mask is a shift of a single precomputed
packed mask, because window i consumes haystack[i+t] at step t — a
diagonal of the (window, step) grid.

Edge-window families collapse into one incremental prefix scan each
(suffix windows are prefix windows of the reversed strings); the interior
pass runs first so the prefix scans can skip the per-step popcount
whenever the window-length upper bound 2·wlen/(len1+wlen) cannot beat the
best score so far — a lossless pruning (LCS(needle, hay[:i]) is
non-decreasing in i).

rapidfuzz's "boundary char not in needle" window skip is likewise a
lossless pruning, so evaluating every window yields the same maximum.
"""
from __future__ import annotations

__all__ = ["best_window_similarity"]


def _pattern_masks(s: str) -> dict:
    masks: dict = {}
    bit = 1
    for ch in s:
        masks[ch] = masks.get(ch, 0) | bit
        bit <<= 1
    return masks


def _prefix_scan_best(needle: str, haystack: str, limit: int, best: float) -> float:
    """Best sim over prefix windows haystack[:i], i = 1..limit (one scan).

    Skips the per-step popcount while even a perfect window of the current
    length could not beat ``best``.
    """
    len1 = len(needle)
    masks = _pattern_masks(needle)
    full = (1 << len1) - 1
    state = full
    get = masks.get
    steps = min(limit, len(haystack))
    for step in range(steps):
        pm = get(haystack[step])
        if pm:
            carry = state & pm
            state = ((state + carry) | (state - carry)) & full
        wlen = step + 1
        total = len1 + wlen
        # lcs ≤ min(len1, wlen) ⇒ sim ≤ 2·wlen/total; skip when hopeless
        if 2.0 * min(len1, wlen) / total <= best:
            continue
        lcs = len1 - bin(state).count("1")
        sim = 2.0 * lcs / total
        if sim > best:
            best = sim
    return best


def best_window_similarity(needle: str, haystack: str) -> float:
    """max Indel normalized similarity over rapidfuzz's window set."""
    len1 = len(needle)
    len2 = len(haystack)
    if len1 == 0:
        return 0.0

    best = 0.0

    # ---- interior full-length windows first (they dominate the maximum
    # for near-duplicates, making the edge-scan pruning effective)
    n_win = len2 - len1
    if n_win > 0:
        slot = len1 + 1
        slot_ones = (1 << len1) - 1
        full = 0
        for i in range(n_win):
            full |= slot_ones << (i * slot)

        masks = _pattern_masks(needle)
        get = masks.get
        packed_all = 0
        for j, ch in enumerate(haystack):
            pm = get(ch)
            if pm:
                packed_all |= pm << (j * slot)

        state = full
        for t in range(len1):
            m = (packed_all >> (t * slot)) & full
            u = state & m
            state = ((state + u) | (state - u)) & full

        for i in range(n_win):
            zeros = len1 - bin((state >> (i * slot)) & slot_ones).count("1")
            sim = zeros / len1  # 2·lcs / (len1 + len1)
            if sim > best:
                best = sim
        if best == 1.0:
            return 1.0

    # ---- edge windows
    best = _prefix_scan_best(needle, haystack, len1 - 1, best)
    if best == 1.0:
        return 1.0
    best = _prefix_scan_best(
        needle[::-1], haystack[::-1], min(len1, len2), best
    )
    return best
