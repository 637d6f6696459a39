"""Per-field similarity kernels.

Behavioral spec: /root/reference/bib_dedupe/sim.py (sim_author :35-82,
sim_page :85-118, sim_title :121-237, sim_year :240-272, sim_doi :275-279,
sim_number :282-302, sim_volume :305-318, sim_abstract :321-352,
sim_container_title :355-401, page_ranges_adjacent :404-434).
Exact float expectations pinned by /root/reference/tests/sim_test.py.

Every kernel maps a pair of prepared (all-lowercase, ''-missing) strings to
a float in [0, 1] — except :func:`page_ranges_adjacent`, which returns the
3-valued string column {'', 'adjacent', 'non_overlapping'}. The kernels run
inside Arrow-batched pandas UDFs only (see operators/sim.py).
"""
from __future__ import annotations

import re
from functools import lru_cache

from bib_dedupe_spark.kernels import fuzz

TITLE_SIM_STOPWORDS = frozenset(
    ["the", "a", "an", "in", "on", "at", "and", "or", "of"]
)

_ONE_SIDED_GENRE_TERMS = (
    "comment",
    "response",
    "reply",
    "update",
    "forum",
    "proposed",
    "talk",
)

_ONE_SIDED_POPULATION_TERMS = (
    "women",
    "adult",
    "pediatric",
    "protocol",
    "vivo",
    "vitro",
    "rats",
    "cats",
)

_RE_FORMULA_BRACKET = re.compile(r"\[[a-z0-9 ]{1,5}\]")
_RE_DIGIT_RUN = re.compile(r"(?<!\[)\d+")
_RE_PART_TAG = re.compile(r"part [a-z]")
_RE_EFFECT_OF = re.compile(r"effect[s]? of (\w+)")
_RE_TREATMENT_OF = re.compile(r"treatment of (\w+)")
_RE_PATIENTS = re.compile(r"(\w+) patients")
_RE_LETTER_DIGIT = re.compile(r"([A-Za-z])(\d)")
_RE_CAPITALS = re.compile(r"[A-Z]")
_RE_LETTERS = re.compile(r"[a-zA-Z]")
_RE_FIRST_INT = re.compile(r"\d+")
_RE_PAGE_RANGE = re.compile(r"\d{1,}-\d{1,}")


def sim_token_sort(s1: str, s2: str) -> float:
    """Generic token-sort similarity; 0 when either side is empty."""
    if s1 != "" and s2 != "":
        return fuzz.token_sort_ratio(s1, s2) / 100
    return 0.0


@lru_cache(maxsize=8192)
def _caps_of(full: str) -> str:
    return " ".join(_RE_CAPITALS.findall(full))


@lru_cache(maxsize=8192)
def _title_fuzzy_form(t: str) -> str:
    """Stopword-stripped, digit-spaced title form fed to fuzz.ratio
    (cached per side: pure function of one title)."""
    t = " ".join(w for w in t.split() if w not in TITLE_SIM_STOPWORDS)
    return _RE_LETTER_DIGIT.sub(r"\1 \2", t)


def sim_author(a1: str, full1: str, a2: str, full2: str) -> float:
    """Author similarity: max over truncated token-sort, partial,
    capital-initials token-sort, and full-string token-sort signals."""
    if a1 == "" and a2 == "":
        return 0.0
    if a1 == a2:
        return 1.0

    a1 = a1.replace("vander", "")
    a2 = a2.replace("vander", "")

    # the result is max(truncated, partial, initials, full) capped at 1.0;
    # compute the cheap token-sort signals first and skip the window scan
    # (partial_ratio) once the cap is reached — exact under max semantics
    truncated = 0.0
    if len(a1) > 200 or len(a2) > 200:
        truncated = fuzz.token_sort_ratio(a1[:200], a2[:200]) / 100

    initials = 0.0
    if len(full1) > 5 and len(full2) > 5:
        initials = fuzz.token_sort_ratio(_caps_of(full1), _caps_of(full2)) / 100

    full = 0.0
    if full1 != "" and full2 != "":
        full = fuzz.token_sort_ratio(full1, full2) / 100

    best = max(truncated, initials, full)
    if best >= 1.0:
        return 1.0
    # lossless score_cutoff: exact whenever the partial beats best
    return max(best, fuzz.partial_ratio(a1, a2, score_cutoff=best * 100) / 100)


def sim_page(p1: str, p2: str) -> float:
    """Page similarity with suffix-containment and first-integer fast paths."""
    p1 = _RE_LETTERS.sub("", p1)
    p2 = _RE_LETTERS.sub("", p2)

    if p1 == "" and p2 == "":
        return 0.0

    if p1 != "" and p2 != "":
        if (p1.endswith(p2) and p2.isdigit()) or (p2.endswith(p1) and p1.isdigit()):
            return 1.0

    m1 = _RE_FIRST_INT.search(p1)
    m2 = _RE_FIRST_INT.search(p2)
    first1 = m1.group() if m1 else ""
    first2 = m2.group() if m2 else ""

    if first1 != "" and first1 == first2:
        return 1.0
    return fuzz.token_sort_ratio(first1, first2) / 100


@lru_cache(maxsize=8192)
def _title_digits(t: str) -> tuple:
    return tuple(_RE_DIGIT_RUN.findall(t))


@lru_cache(maxsize=8192)
def _title_gate_tags(t: str) -> tuple:
    """(part, effect, treatment, patients) regex captures — pure per-side
    function; each record participates in ~10 pairs, so caching the
    scans amortizes the gate cost across its pairs."""
    return (
        tuple(_RE_PART_TAG.findall(t)),
        tuple(_RE_EFFECT_OF.findall(t)),
        tuple(_RE_TREATMENT_OF.findall(t)),
        tuple(_RE_PATIENTS.findall(t)),
    )


def sim_title(raw1: str, raw2: str) -> float:
    """Title similarity with hard-0/hard-1 gates before the fuzzy score."""
    t1 = str(raw1)
    t2 = str(raw2)

    if t1 in ("", "book review") or t2 in ("", "book review"):
        return 0.0

    squeezed1 = t1.replace(" ", "")
    if squeezed1 == t2.replace(" ", "") and squeezed1 != "":
        return 1.0

    for term in _ONE_SIDED_GENRE_TERMS:
        if (term in t1) != (term in t2):
            return 0.0

    # long titles: secondary titles may be omitted on one side; NOTE the
    # reference's precedence makes the second prefix test unconditional
    # (sim.py:153: `a and b and x or y`)
    if (len(t1) > 60 and len(t2) > 60 and t1.startswith(t2)) or t2.startswith(t1):
        return 1.0

    if "[" in t1:
        t1 = _RE_FORMULA_BRACKET.sub("", t1)
    if "[" in t2:
        t2 = _RE_FORMULA_BRACKET.sub("", t2)

    digits1 = _title_digits(t1)
    digits2 = _title_digits(t2)
    if (
        digits1 != digits2
        and "".join(digits1) != "".join(digits2)
        and len(digits1) < 3
    ):
        return 0.0

    for term in _ONE_SIDED_POPULATION_TERMS:
        if (term in t1) != (term in t2):
            return 0.0

    if any(term in t1 for term in ("part", "effect", "treatment")):
        part1, eff1, trt1, pat1 = _title_gate_tags(t1)
        part2, eff2, trt2, pat2 = _title_gate_tags(t2)
        if part1 != part2 and len(digits1) < 3:
            return 0.0
        if eff1 != eff2:
            return 0.0
        if trt1 != trt2:
            return 0.0
        if pat1 != pat2:
            return 0.0

    if t1.endswith(t2) or t2.endswith(t1):
        return 1.0

    t1 = _title_fuzzy_form(t1)
    t2 = _title_fuzzy_form(t2)

    score = fuzz.ratio(t1, t2) / 100

    # one title may carry an appended translation: fall back to partial
    if score < 0.7:
        # score_cutoff is lossless here: the partial value is only used
        # when it exceeds the running score (max semantics)
        if len(t1) > 1.7 * len(t2):
            partial = fuzz.partial_ratio(t1, t2, score_cutoff=score * 100) / 100
            if partial > score:
                return partial
        if len(t2) > 1.7 * len(t1):
            partial = fuzz.partial_ratio(t2, t1, score_cutoff=score * 100) / 100
            if partial > score:
                return partial

    return score


def sim_year(y1: str, y2: str) -> float:
    """Graded year similarity: 1.0 / 0.95 / 0.8 / 0 by absolute gap."""
    v1 = int(y1) if y1.isdigit() else -1
    v2 = int(y2) if y2.isdigit() else -1
    if v1 == -1 or v2 == -1:
        return 0.0
    gap = abs(v1 - v2)
    if gap == 0:
        return 1.0
    if gap == 1:
        return 0.95
    if gap == 2:
        return 0.8
    return 0.0


def sim_doi(d1: str, d2: str) -> float:
    if d1 == "" or d2 == "":
        return 0.0
    return fuzz.ratio(d1, d2) / 100


def sim_number(n1_str: str, n2_str: str) -> float:
    """Issue-number similarity; graded gap above 12, token-sort below."""
    if n1_str == "" or n2_str == "":
        return 0.0
    n1 = int(n1_str) if n1_str.isdigit() else 0
    n2 = int(n2_str) if n2_str.isdigit() else 0
    if n1 > 12 and n2 > 12:
        gap = abs(n1 - n2)
        if gap == 0:
            return 1.0
        if gap <= 2:
            return 0.95
        return 0.0
    return fuzz.token_sort_ratio(str(n1), str(n2)) / 100


def sim_volume(v1_str: str, v2_str: str) -> float:
    """Binary volume similarity on integer coercion (non-digits → 0)."""
    if v1_str == "" or v2_str == "":
        return 0.0
    v1 = int(v1_str) if v1_str.isdigit() else 0
    v2 = int(v2_str) if v2_str.isdigit() else 0
    return 1.0 if v1 == v2 else 0.0


_RE_AB_LETTER_DIGIT_GAP = re.compile(r"([a-z])\s+(\d)")
_RE_AB_LETTER_LETTER_GAP = re.compile(r"([a-z])\s+([a-z])")
_RE_AB_NON_ALNUM = re.compile(r"[^a-z0-9\s]")
_RE_WS = re.compile(r"\s+")


@lru_cache(maxsize=8192)
def _normalize_abstract(text: str) -> str:
    # cached: one record's abstract is re-normalized for every pair it
    # appears in (pure function, so caching preserves exactness)
    text = "" if text is None else str(text)
    text = _RE_AB_LETTER_DIGIT_GAP.sub(r"\1\2", text)
    text = _RE_AB_LETTER_LETTER_GAP.sub(r"\1\2", text)
    text = _RE_AB_NON_ALNUM.sub(" ", text)
    return _RE_WS.sub(" ", text).strip()


def sim_abstract(a1: str, a2: str, partial_cutoff: float = 0.0) -> float:
    """Abstract similarity: max(ratio, partial, token_set) on normalized text.

    ``partial_cutoff`` (0-100) lets the caller declare the smallest
    abstract-similarity threshold any downstream consumer applies (the
    rule engine's is rules.MIN_ABSTRACT_SIM_THRESHOLD): the returned
    value is exact whenever it exceeds the cutoff, and a lower bound
    otherwise — rule outcomes are provably unchanged, while the window
    scan skips the (expensive) dissimilar-abstract case entirely.
    """
    n1 = _normalize_abstract(a1)
    n2 = _normalize_abstract(a2)
    if not n1 or not n2:
        return 0.0
    if n1 == n2:
        return 1.0
    # the result is a max capped at 1.0: bail as soon as any signal hits it
    score = fuzz.ratio(n1, n2)
    if score < 100.0:
        score = max(score, fuzz.token_set_ratio(n1, n2))
    if score < 100.0:
        # max(score, cutoff) is lossless: below score the max stands,
        # below partial_cutoff no consumer distinguishes values
        score = max(
            score,
            fuzz.partial_ratio(
                n1, n2, score_cutoff=max(score, partial_cutoff)
            ),
        )
    return score / 100.0


def sim_container_title(c1: str, c2: str) -> float:
    """Container-title similarity with abbreviation/initialism handling."""
    if c1 == "" or c2 == "":
        return 0.0

    if ("euro " in c1 and "am " in c2) or ("euro " in c2 and "am " in c1):
        return 0.0

    c1 = c1.replace("res", "")
    c2 = c2.replace("res", "")

    abbreviation_match = 0
    if " " not in c1 and " " in c2:
        if c1 == "".join(w[0] for w in c2.split()):
            abbreviation_match = 1
    if " " not in c2 and " " in c1:
        if "".join(w[0] for w in c1.split()) == c2:
            abbreviation_match = 1

    words1 = c1.split()
    words2 = c2.split()
    word_match = 1
    if len(words1) != len(words2):
        word_match = 0
    else:
        for w1, w2 in zip(words1, words2):
            if not w1.startswith(w2) and not w2.startswith(w1):
                word_match = 0
                break

    if c1.count(" ") < 5 and c2.count(" ") < 5:
        if c1.startswith(c2) or c2.startswith(c1):
            return 1.0
        overall = fuzz.ratio(c1, c2) / 100
    else:
        overall = fuzz.partial_ratio(c1, c2) / 100

    return max(overall, abbreviation_match, word_match)


def page_ranges_adjacent(p1: str, p2: str) -> str:
    """Classify two page ranges as adjacent / non-overlapping / neither."""
    if p1 == p2:
        return ""
    if not _RE_PAGE_RANGE.match(p1) or not _RE_PAGE_RANGE.match(p2):
        return ""
    parts1 = p1.split("-")
    parts2 = p2.split("-")
    if len(parts1) == 2 and len(parts2) == 2:
        start1, end1 = int(parts1[0]), int(parts1[1])
        start2, end2 = int(parts2[0]), int(parts2[1])
        if end1 + 1 == start2 or end2 + 1 == start1:
            return "adjacent"
        if end1 < start2 or end2 < start1:
            return "non_overlapping"
    return ""
