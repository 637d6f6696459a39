"""Indel-based string similarity kernels (rapidfuzz-compatible).

Self-contained re-implementation of the four scoring primitives the
reference engine uses via the ``rapidfuzz.fuzz`` module
(/root/reference/bib_dedupe/sim.py:10 and call sites therein):

* ``ratio``            — normalized Indel similarity * 100
* ``partial_ratio``    — best Indel ratio of the shorter string against
                         sliding windows of the longer string
* ``token_sort_ratio`` — ratio over whitespace-split, sorted, re-joined tokens
* ``token_set_ratio``  — max ratio over sorted intersection/difference
                         token constructions

Outputs are pinned by the exact float expectations in
/root/reference/tests/sim_test.py (e.g. 0.984375 at :81), which our test
suite extracts and replays.

The Indel distance is ``len(a) + len(b) - 2 * LCS(a, b)``; the LCS length
is computed with the Hyyrö bit-parallel algorithm on Python big ints,
O(len(a) * len(b) / wordsize). All functions are pure Python and are only
ever called inside Arrow-batched pandas UDFs (never per-row at the Spark
API level).
"""
from __future__ import annotations

from functools import lru_cache

__all__ = [
    "ratio",
    "partial_ratio",
    "token_sort_ratio",
    "token_set_ratio",
    "indel_distance",
    "indel_normalized_similarity",
]


@lru_cache(maxsize=4096)
def _pattern_masks(s: str) -> dict:
    """Per-character bitmasks for the bit-parallel LCS scan."""
    masks: dict = {}
    bit = 1
    for ch in s:
        masks[ch] = masks.get(ch, 0) | bit
        bit <<= 1
    return masks


def lcs_length(s1: str, s2: str, masks: dict | None = None) -> int:
    """Length of the longest common subsequence of ``s1`` and ``s2``."""
    m = len(s1)
    if m == 0 or len(s2) == 0:
        return 0
    if masks is None:
        masks = _pattern_masks(s1)
    full = (1 << m) - 1
    state = full
    get = masks.get
    for ch in s2:
        pm = get(ch)
        if pm:
            carry = state & pm
            state = ((state + carry) | (state - carry)) & full
    # zero bits in the final state correspond to matched pattern positions
    return m - bin(state).count("1")


def indel_distance(s1: str, s2: str) -> int:
    """Insertion/deletion edit distance (no substitutions)."""
    return len(s1) + len(s2) - 2 * lcs_length(s1, s2)


def indel_normalized_similarity(
    s1: str, s2: str, masks: dict | None = None
) -> float:
    """1 - indel_distance / (len1 + len2); 1.0 when both strings are empty."""
    total = len(s1) + len(s2)
    if total == 0:
        return 1.0
    dist = total - 2 * lcs_length(s1, s2, masks)
    return 1.0 - dist / total


def ratio(s1: str, s2: str) -> float:
    """Normalized Indel similarity scaled to [0, 100]."""
    return indel_normalized_similarity(s1, s2) * 100.0


def _best_window_similarity(needle: str, haystack: str) -> float:
    """Best Indel similarity of ``needle`` vs substrings of ``haystack``.

    Mirrors the window enumeration of rapidfuzz's partial_ratio: full
    windows of len(needle) plus truncated windows hanging off either edge,
    skipping windows whose boundary character does not occur in the needle
    (provably never optimal).
    """
    len1 = len(needle)
    len2 = len(haystack)
    if len1 == 0:
        return 0.0
    charset = set(needle)
    masks = _pattern_masks(needle)
    best = 0.0
    # windows hanging off the left edge: haystack[:i] for i < len1
    for i in range(1, len1):
        if haystack[i - 1] not in charset:
            continue
        score = indel_normalized_similarity(needle, haystack[:i], masks)
        if score > best:
            best = score
            if best == 1.0:
                return 1.0
    # full-length interior windows
    for i in range(len2 - len1):
        if haystack[i + len1 - 1] not in charset:
            continue
        score = indel_normalized_similarity(needle, haystack[i : i + len1], masks)
        if score > best:
            best = score
            if best == 1.0:
                return 1.0
    # windows hanging off the right edge
    for i in range(max(len2 - len1, 0), len2):
        if haystack[i] not in charset:
            continue
        score = indel_normalized_similarity(needle, haystack[i:], masks)
        if score > best:
            best = score
            if best == 1.0:
                return 1.0
    return best


# above this work size, the vectorized multi-window scan wins
_NP_WINDOW_THRESHOLD = 4000


def _window_scan(shorter: str, longer: str, cutoff: float = 0.0) -> float:
    if len(shorter) * len(longer) >= _NP_WINDOW_THRESHOLD:
        from bib_dedupe_spark.kernels import fuzz_np

        return fuzz_np.best_window_similarity(shorter, longer, cutoff)
    return _best_window_similarity(shorter, longer)


def partial_ratio(s1: str, s2: str, score_cutoff: float = 0.0) -> float:
    """Best ratio of the shorter string over windows of the longer one.

    ``score_cutoff`` (0-100) enables the lossless banded pruning in the
    long-string scan: the result is exact whenever it exceeds the cutoff;
    below it, some lower bound ≤ cutoff may be returned. Callers folding
    partial_ratio into max(other_signals, ...) pass the running max and
    get bit-identical final values (see fuzz_np module docstring).
    """
    if len(s1) == 0 and len(s2) == 0:
        return 100.0
    if len(s1) == 0 or len(s2) == 0:
        return 0.0
    cutoff = score_cutoff / 100.0
    shorter, longer = (s1, s2) if len(s1) <= len(s2) else (s2, s1)
    best = _window_scan(shorter, longer, cutoff)
    if best != 1.0 and len(s1) == len(s2):
        # equal lengths: the window scan is not symmetric, try both roles
        other = _window_scan(longer, shorter, max(cutoff, best))
        if other > best:
            best = other
    return best * 100.0


def _sorted_join(s: str) -> str:
    return " ".join(sorted(s.split()))


def token_sort_ratio(s1: str, s2: str) -> float:
    """Ratio over whitespace-tokenized, lexicographically sorted joins."""
    return ratio(_sorted_join(s1), _sorted_join(s2))


def token_set_ratio(s1: str, s2: str) -> float:
    """Max Indel ratio over token intersection/difference constructions."""
    tokens_a = set(s1.split())
    tokens_b = set(s2.split())
    if not tokens_a and not tokens_b:
        return 100.0

    intersect = tokens_a & tokens_b
    diff_ab = tokens_a - tokens_b
    diff_ba = tokens_b - tokens_a

    if intersect and (not diff_ab or not diff_ba):
        return 100.0

    diff_ab_joined = " ".join(sorted(diff_ab))
    diff_ba_joined = " ".join(sorted(diff_ba))
    ab_len = len(diff_ab_joined)
    ba_len = len(diff_ba_joined)
    sect_len = len(" ".join(intersect))

    # lengths of "<sect> <diff_ab>" / "<sect> <diff_ba>" virtual strings
    sect_ab_len = sect_len + bool(sect_len) + ab_len
    sect_ba_len = sect_len + bool(sect_len) + ba_len

    total = sect_ab_len + sect_ba_len
    result = 0.0
    if total:
        dist = indel_distance(diff_ab_joined, diff_ba_joined)
        result = 100.0 * (1.0 - dist / total)

    if not sect_len:
        return result

    # the shared section aligns perfectly; distances reduce to length deltas
    sect_ab_dist = bool(sect_len) + ab_len
    sect_ab_ratio = 100.0 * (1.0 - sect_ab_dist / (sect_len + sect_ab_len))
    sect_ba_dist = bool(sect_len) + ba_len
    sect_ba_ratio = 100.0 * (1.0 - sect_ba_dist / (sect_len + sect_ba_len))

    return max(result, sect_ab_ratio, sect_ba_ratio)
