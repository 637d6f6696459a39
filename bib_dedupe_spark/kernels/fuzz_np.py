"""Batched window scan for partial_ratio (packed big-integer SIMD).

Bit-identical to the pure-Python per-window scan in kernels/fuzz.py
(integer LCS → identical floats), but evaluates many windows
simultaneously: the bit-parallel LCS states of W windows are packed into
ONE Python big integer, one (len1+1)-bit slot per window (guard bit
absorbs the addition carry), so each scan step is ~6 big-int operations
regardless of W. For stride-K window families the per-step mask is a
slot-shift of one of K precomputed packed masks, because window s
consumes haystack[b + sK + t] at step t — a diagonal of the
(window, step) grid in each residue class t mod K.

Banded pruning (round-2): window similarity is 1/len1-Lipschitz in the
window start (shifting the window by one changes the LCS by at most ±1),
so a coarse stride-K pass bounds every skipped block by
(lcs_left + lcs_right + gap) / 2. Blocks whose bound cannot beat
max(best-so-far, cutoff) are never evaluated — a LOSSLESS pruning under
the contract "the returned value is exact whenever it exceeds
``cutoff``, otherwise it is some lower bound ≤ cutoff". Callers that
consume partial_ratio inside a max() of other signals (sim_abstract,
sim_author) pass the running max as the cutoff, which preserves
bit-exact pipeline results while skipping most of the scan on dissimilar
long texts.

Edge-window families collapse into one incremental prefix scan each
(suffix windows are prefix windows of the reversed strings); prefix
scans skip the per-step popcount whenever the window-length upper bound
2·wlen/(len1+wlen) cannot beat max(best, cutoff) — likewise lossless.

rapidfuzz's "boundary char not in needle" window skip is likewise a
lossless pruning, so evaluating every window yields the same maximum.
"""
from __future__ import annotations

__all__ = ["best_window_similarity"]

# coarse stride for the interior pass; margin per block is K/(2·len1)
_STRIDE = 16
# below this many interior windows the two-pass machinery is overhead
_MIN_STRIDED = 4 * _STRIDE


def _pattern_masks(s: str) -> dict:
    masks: dict = {}
    bit = 1
    for ch in s:
        masks[ch] = masks.get(ch, 0) | bit
        bit <<= 1
    return masks


def _packed_scan(
    masks: dict, len1: int, haystack: str, begin: int, n_sel: int, stride: int
) -> list:
    """LCS(needle, haystack[b+sK : b+sK+len1]) for s in range(n_sel).

    One packed bit-parallel scan over all selected windows; ``masks`` is
    ``_pattern_masks(needle)``.
    """
    slot = len1 + 1
    slot_ones = (1 << len1) - 1
    full = 0
    for s in range(n_sel):
        full |= slot_ones << (s * slot)

    # residue-class packed masks: A[r] carries hay[b + uK + r] in slot u
    get = masks.get
    A = [0] * stride
    hi = min(begin + (n_sel - 1) * stride + len1, len(haystack))
    for j in range(begin, hi):
        pm = get(haystack[j])
        if pm:
            off = j - begin
            A[off % stride] |= pm << ((off // stride) * slot)

    state = full
    for t in range(len1):
        q, r = divmod(t, stride)
        m = (A[r] >> (q * slot)) & full
        if m:
            u = state & m
            state = ((state + u) | (state - u)) & full

    out = []
    for s in range(n_sel):
        zeros = len1 - bin((state >> (s * slot)) & slot_ones).count("1")
        out.append(zeros)
    return out


def _lcs_single(
    masks: dict, len1: int, haystack: str, begin: int, floor_lcs: int = 0
) -> int:
    """LCS(needle, haystack[begin:begin+len1]) — one bit-parallel scan.

    The packed layouts span ~len1 slots regardless of window count, so a
    lone window is far cheaper with a plain len1-bit state. ``floor_lcs``
    enables a lossless abort: once lcs-so-far + steps-remaining cannot
    reach it, the true LCS is ≤ floor_lcs and any value ≤ it may be
    returned (checked every 64 steps; popcount is the only extra cost).
    """
    full = (1 << len1) - 1
    state = full
    get = masks.get
    end = min(begin + len1, len(haystack))
    check = begin + 64
    for j in range(begin, end):
        pm = get(haystack[j])
        if pm:
            u = state & pm
            state = ((state + u) | (state - u)) & full
        if j >= check:
            check = j + 64
            lcs_now = len1 - bin(state).count("1")
            if lcs_now + (end - 1 - j) <= floor_lcs:
                return lcs_now  # ≤ floor: caller ignores the exact value
    return len1 - bin(state).count("1")


def _packed_scan_runs(masks: dict, len1: int, haystack: str, runs: list) -> list:
    """LCS for the union of stride-1 window runs [(begin, count), ...].

    All runs share ONE packed state (slots laid out run after run); the
    per-step mask is assembled from one shifted+masked integer per run,
    so the dominant big-int work still amortizes across every selected
    window while Python-level overhead stays at len1 steps total.
    """
    slot = len1 + 1
    slot_ones = (1 << len1) - 1
    get = masks.get
    len2 = len(haystack)

    offsets = []
    total = 0
    for _, count in runs:
        offsets.append(total)
        total += count
    full = 0
    for s in range(total):
        full |= slot_ones << (s * slot)

    per_run = []
    for (begin, count), off in zip(runs, offsets):
        a_r = 0
        hi = min(count - 1 + len1, len2 - begin)
        base = off * slot
        for u in range(hi):
            pm = get(haystack[begin + u])
            if pm:
                a_r |= pm << (base + u * slot)
        full_r = 0
        for s in range(count):
            full_r |= slot_ones << ((off + s) * slot)
        per_run.append((a_r, full_r))

    state = full
    if len(per_run) == 1:
        a_r, _ = per_run[0]
        for t in range(len1):
            m = (a_r >> (t * slot)) & full
            if m:
                u = state & m
                state = ((state + u) | (state - u)) & full
    else:
        for t in range(len1):
            ts = t * slot
            m = 0
            for a_r, full_r in per_run:
                m |= (a_r >> ts) & full_r
            if m:
                u = state & m
                state = ((state + u) | (state - u)) & full

    out = []
    for s in range(total):
        zeros = len1 - bin((state >> (s * slot)) & slot_ones).count("1")
        out.append(zeros)
    return out


def _prefix_scan_best(
    needle: str, haystack: str, limit: int, best: float, floor: float
) -> float:
    """Best sim over prefix windows haystack[:i], i = 1..limit (one scan).

    Skips the per-step popcount while even a perfect window of the current
    length could not beat ``max(best, floor)``.
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
        if 2.0 * min(len1, wlen) / total <= max(best, floor):
            continue
        lcs = len1 - bin(state).count("1")
        sim = 2.0 * lcs / total
        if sim > best:
            best = sim
    return best


def _bisect_interior(
    masks: dict, len1: int, haystack: str, n_win: int, cutoff: float
) -> tuple:
    """(best_sim, lcs_win0, lcs_last) by branch-and-bound bisection.

    For few-windows-long-needle shapes, each exact single-window scan
    costs ~len1 big-int steps, so the cheapest exact strategy is to
    evaluate window endpoints and recursively split only intervals whose
    Lipschitz bound (lcs_lo + lcs_hi + width) / 2 can still beat
    max(best, cutoff·len1). Dissimilar landscapes collapse after the two
    endpoint evals; flat-high landscapes degrade to evaluating every
    window — no worse than the plain loop. All evals are EXACT (no
    floor-abort), so the endpoint values double as the edge-scan bound.
    """
    cache: dict = {}

    def ev(i: int) -> int:
        if i not in cache:
            cache[i] = _lcs_single(masks, len1, haystack, i)
        return cache[i]

    best_lcs = max(ev(0), ev(n_win - 1))
    if best_lcs < len1:
        stack = [(0, n_win - 1)]
        while stack:
            lo, hi = stack.pop()
            if hi - lo <= 1:
                continue
            if ev(lo) + ev(hi) + (hi - lo) <= 2.0 * max(
                best_lcs, cutoff * len1
            ):
                continue
            mid = (lo + hi) // 2
            m = ev(mid)
            if m > best_lcs:
                best_lcs = m
                if best_lcs == len1:
                    break
            stack.append((lo, mid))
            stack.append((mid, hi))
    return best_lcs / len1, cache[0], cache[n_win - 1]


def _edge_scan_bound(len1: int, lcs_window: int) -> float:
    """Upper bound on any edge-window sim hanging off one end.

    Every prefix window haystack[:i] (i < len1) is a substring of the
    FIRST full window, and every suffix window a substring of the LAST,
    so their LCS is ≤ that window's exact LCS L; with sim_i =
    2·min(i, L)/(len1 + i) maximized at i = L, the whole edge family is
    bounded by 2L/(len1 + L). When that cannot beat max(best, cutoff),
    the edge scan is skipped — lossless.
    """
    return 2.0 * lcs_window / (len1 + lcs_window)


def _coarse_then_runs(
    masks: dict,
    len1: int,
    haystack: str,
    n_win: int,
    K: int,
    cutoff: float,
) -> tuple:
    """(best_sim, lcs_win0, lcs_last): anchors + Lipschitz block pruning.

    Lossless for ANY stride K: blocks are skipped only when the bound
    (lcs_a + lcs_b + (b - a)) / 2 proves their maximum cannot beat
    max(best-so-far, cutoff) — skipping vs best-so-far never changes the
    returned max; skipping vs cutoff only hides values the contract
    already allows to be lower bounds.
    """
    n_coarse = (n_win - 1) // K + 1
    coarse_idx = [s * K for s in range(n_coarse)]
    lcs_at = dict(
        zip(coarse_idx, _packed_scan(masks, len1, haystack, 0, n_coarse, K))
    )
    last = n_win - 1
    if last not in lcs_at:
        lcs_at[last] = _lcs_single(masks, len1, haystack, last)
    anchors = sorted(lcs_at)
    best = max(lcs_at.values()) / len1
    if best == 1.0:
        return 1.0, lcs_at[0], lcs_at[last]

    # keep blocks whose Lipschitz bound can still beat the target:
    # lcs_j ≤ min(lcs_a + (j-a), lcs_b + (b-j)) for a<j<b, so the
    # block max is bounded by (lcs_a + lcs_b + (b-a)) / 2
    thresh2x = 2.0 * max(best, cutoff) * len1
    survivors = [
        (a, b)
        for a, b in zip(anchors, anchors[1:])
        if b - a > 1 and lcs_at[a] + lcs_at[b] + (b - a) > thresh2x
    ]
    if survivors:
        # merge adjacent/nearby blocks into maximal stride-1 runs
        # (evaluating the few anchor windows again is cheaper than
        # paying per-run packed-mask assembly for fragmented runs)
        runs = []
        cur_a, cur_b = survivors[0]
        for a, b in survivors[1:]:
            if a - cur_b <= 2:
                cur_b = b
            else:
                runs.append((cur_a + 1, cur_b - cur_a - 1))
                cur_a, cur_b = a, b
        runs.append((cur_a + 1, cur_b - cur_a - 1))
        # tiny runs: the packed layout spans ~len1 slots per run no
        # matter how few windows it holds — individual scans win
        small = [r for r in runs if r[1] * 10 < len1]
        large = [r for r in runs if r[1] * 10 >= len1]
        zeros_all = []
        floor = int(max(best, cutoff) * len1)
        for begin, count in small:
            zeros_all.extend(
                _lcs_single(masks, len1, haystack, begin + d, floor)
                for d in range(count)
            )
        if large:
            zeros_all.extend(
                _packed_scan_runs(masks, len1, haystack, large)
            )
        for zeros in zeros_all:
            sim = zeros / len1
            if sim > best:
                best = sim
    return best, lcs_at[0], lcs_at[last]


def best_window_similarity(
    needle: str, haystack: str, cutoff: float = 0.0
) -> float:
    """max Indel normalized similarity over rapidfuzz's window set.

    Exact whenever the true maximum exceeds ``cutoff``; when it does not,
    the returned value is a lower bound ≤ the true maximum (callers using
    the result inside max(other_signals, ...) with cutoff = that max get
    bit-identical final values).
    """
    len1 = len(needle)
    len2 = len(haystack)
    if len1 == 0:
        return 0.0

    best = 0.0
    lcs0 = lcs_last = None  # EXACT first/last-window LCS when known

    # ---- interior full-length windows first (they dominate the maximum
    # for near-duplicates, making the edge-scan pruning effective).
    # ALL len1-length alignments are scanned here — offsets 0..n_win
    # INCLUSIVE (the final alignment haystack[len2-len1:] included, which
    # the edge-skip suffix bound anchors on: every suffix window is a
    # substring of it, just as every prefix window is of offset 0).
    n_win = len2 - len1
    if 0 < n_win and n_win * 10 < len1:
        # few windows on a long needle: the packed layout would span
        # ~len1 slots regardless — exact single-window scans driven by
        # branch-and-bound bisection win (dissimilar landscapes collapse
        # after the endpoint evals)
        masks = _pattern_masks(needle)
        best, lcs0, lcs_last = _bisect_interior(
            masks, len1, haystack, n_win + 1, cutoff
        )
        if best == 1.0:
            return 1.0
    elif 0 < n_win <= _MIN_STRIDED:
        masks = _pattern_masks(needle)
        zeros_all = _packed_scan(masks, len1, haystack, 0, n_win + 1, 1)
        lcs0, lcs_last = zeros_all[0], zeros_all[-1]
        for zeros in zeros_all:
            sim = zeros / len1  # 2·lcs / (len1 + len1)
            if sim > best:
                best = sim
        if best == 1.0:
            return 1.0
    elif n_win > _MIN_STRIDED:
        masks = _pattern_masks(needle)
        # a high cutoff tolerates a coarser first pass (block bounds only
        # need to separate the landscape from the cutoff, not from the
        # running best); K never affects exactness, only work
        K = _STRIDE if cutoff < 0.6 else min(4 * _STRIDE, max(n_win // 8, _STRIDE))
        best, lcs0, lcs_last = _coarse_then_runs(
            masks, len1, haystack, n_win + 1, K, cutoff
        )
        if best == 1.0:
            return 1.0

    # ---- edge windows, each family skipped when its substring bound
    # (see _edge_scan_bound) cannot beat max(best, cutoff)
    target = max(best, cutoff)
    if lcs0 is None or _edge_scan_bound(len1, lcs0) > target:
        best = _prefix_scan_best(needle, haystack, len1 - 1, best, cutoff)
        if best == 1.0:
            return 1.0
        target = max(best, cutoff)
    if lcs_last is None or _edge_scan_bound(len1, lcs_last) > target:
        best = _prefix_scan_best(
            needle[::-1], haystack[::-1], min(len1, len2), best, cutoff
        )
    return best
