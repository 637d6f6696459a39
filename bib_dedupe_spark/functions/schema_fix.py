"""Cross-field schema-misalignment repair.

Behavioral spec: /root/reference/bib_dedupe/prep_schema.py:170-317
(month guard :45-61, supplement normalizer :64-82, journal-only-title
detector :92-167). Golden expectations:
/root/reference/tests/prep_test.py:505-678.

Volume/number/pages columns frequently carry mixed content
("9 (3) (pp 224) 2004", "(7 JUL)", "2017 (10)"); this stage re-routes the
pieces into the right columns, row-wise over a (title, journal, volume,
number, pages, year) tuple. Runs inside the prep mapInPandas batch.
"""
from __future__ import annotations

import re
from functools import lru_cache

MONTH_TOKENS = frozenset(
    [
        "jan",
        "january",
        "feb",
        "february",
        "mar",
        "march",
        "apr",
        "april",
        "may",
        "jun",
        "june",
        "jul",
        "july",
        "aug",
        "august",
        "sep",
        "sept",
        "september",
        "oct",
        "october",
        "nov",
        "november",
        "dec",
        "december",
    ]
)

_RE_NO_PAGINATION = re.compile(r"\(\s*no\s+pagination\s*\)", re.IGNORECASE)
_RE_WS = re.compile(r"\s+")
_RE_NON_ALNUM_SP = re.compile(r"[^a-z0-9 ]")
_RE_NON_ALNUM = re.compile(r"[^a-z0-9]+")
_RE_PAREN_ONLY = re.compile(r"^\(\s*([^)]+?)\s*\)$")
_RE_YEAR_VOLUME = re.compile(r"^(\d{4})(?:\s*\(\s*([^)]+?)\s*\))?$")
_RE_VOL_ISSUE = re.compile(r"^([A-Za-z0-9]+)\s*\(\s*(.+)\s*\)$")
_RE_SUPPL_DOT = re.compile(r"(?i)\bSUPPL\.?\s*(\d+)\b")
_RE_SUPPLEMENT_SP = re.compile(r"(?i)\bSupplement\s*([0-9]+)\b")
_RE_SUPPLEMENT_GLUED = re.compile(r"(?i)\bSupplement([0-9]+)\b")
_RE_SPEC_ISS = re.compile(r"(?i)\bSPEC\.?\s*ISS\.?\s*(\d+)\b")
_RE_META_TAIL = re.compile(
    r"""(?ix)
    (?:\bvolume\b|\bvol\.?\b|\bissue\b|\bno\.?\b|\bnumber\b|\bpaper\b|\bart\.?\b)?
    [\s:,\-]*\(?\s*\d+\s*\)?
    (?:[\s:,\-]*(?:\bpaper\b|\bart\.?\b)?[\s:,\-]*\d+)?
    (?:[\s:,\-]*\(?\s*\d+\s*\)?)?
    \s*$
    """,
)
_RE_META_ONLY = re.compile(
    r"(?i)\W*(volume|vol|issue|no|number|paper|art|article)\W*"
)


def strip_no_pagination(text: str) -> str:
    """Drop '(no pagination)' fragments and collapse whitespace."""
    if not text:
        return ""
    if "(" in text:
        text = _RE_NO_PAGINATION.sub("", text)
    return " ".join(text.split())


def is_monthish(token: str) -> bool:
    """True for month/season/date-like labels that should be ignored."""
    if not token:
        return False
    cleaned = _RE_NON_ALNUM_SP.sub(" ", token.strip().lower())
    parts = cleaned.split()
    if not parts:
        return False
    if any(p in MONTH_TOKENS for p in parts):
        return True
    return len(parts) == 2 and parts[1] in MONTH_TOKENS and parts[0].isdigit()


def normalize_supplement(token: str) -> str:
    """Lightly canonicalize supplement labels (SUPPL.1, Spec.Iss 1, ...)."""
    if not token:
        return ""
    t = _RE_WS.sub(" ", token.strip())
    t = _RE_SUPPL_DOT.sub(r"SUPPL.\1", t)
    t = _RE_SUPPLEMENT_SP.sub(r"Supplement \1", t)
    t = _RE_SUPPLEMENT_GLUED.sub(r"Supplement \1", t)
    t = _RE_SPEC_ISS.sub(r"Spec.Iss \1", t)
    return t.strip()


def _loose(text: str) -> str:
    if not text:
        return ""
    return _RE_NON_ALNUM.sub("", text.lower())


@lru_cache(maxsize=4096)
def _journal_strip_re(journal_key: str):
    """Compiled journal-name stripper, cached per journal.

    A corpus has few distinct journals but millions of rows; compiling
    the word-joined pattern per ROW (what an inline re.sub does once the
    re-module cache thrashes) was the dominant cost of this detector.
    The key is the whitespace-normalized word sequence, which is the
    only input the pattern depends on.
    """
    pattern = r"[\W_]*".join(map(re.escape, journal_key.split()))
    return re.compile(rf"(?:{pattern})+", re.IGNORECASE)


def title_is_journal_only(title: str, journal: str) -> bool:
    """True if the title is essentially just the journal name (± metadata)."""
    if not title or not journal:
        return False
    t = title.strip()
    j = journal.strip()
    if not t or not j:
        return False

    j_norm = _loose(j)
    if not j_norm or len(j_norm) < 8:
        return False

    # the meta-tail pattern can only match a title ending in a digit or
    # ')' (after strip); skipping the scan otherwise returns t unchanged
    if t[-1].isdigit() or t[-1] == ")":
        base = _RE_META_TAIL.sub("", t).strip()
    else:
        base = t

    journal_words = j.split()
    if not journal_words:
        return False

    base_norm = _loose(base)
    jw0 = _loose(journal_words[0])
    if jw0 and jw0 not in base_norm:
        # the journal pattern starts with word 1, so it cannot match and
        # stripped == base; the two tail equalities are also impossible
        # (j_norm contains jw0). Most rows exit here without the sub.
        if base_norm == "" or base_norm.isdigit():
            return True
        return bool(_RE_META_ONLY.fullmatch(base))

    stripped = _journal_strip_re(" ".join(journal_words)).sub(
        "", base
    ).strip()

    stripped_norm = _RE_NON_ALNUM.sub("", stripped.lower())
    if stripped_norm == "" or stripped_norm.isdigit():
        return True
    if _RE_META_ONLY.fullmatch(stripped):
        return True
    return base_norm == j_norm or base_norm == j_norm * 2


def fix_row(
    title: str, journal: str, volume: str, number: str, pages: str, year: str
) -> tuple:
    """Repair one record's (title, volume, number, pages, year) routing.

    Returns the corrected (title, journal, volume, number, pages, year).
    """
    title = (title or "").strip()
    journal = (journal or "").strip()
    volume = strip_no_pagination((volume or "").strip())
    number = strip_no_pagination((number or "").strip())
    pages = strip_no_pagination((pages or "").strip())
    year_out = year or ""  # year column is only rewritten, never re-stripped
    year = year_out.strip()

    # pages carrying a parenthesized issue label: "(1)" → number
    m = _RE_PAREN_ONLY.match(pages) if pages.startswith("(") else None
    if m:
        issue = m.group(1).strip()
        if number == "" and not is_monthish(issue):
            number = normalize_supplement(issue)
        pages = ""

    # volume that is only "(...)": issue without volume, or monthish noise
    m = _RE_PAREN_ONLY.match(volume) if volume.startswith("(") else None
    if m:
        token = m.group(1).strip()
        if number == "" and not is_monthish(token):
            number = normalize_supplement(token)
        volume = ""

    # a year (optionally "+ (issue)") stored in the volume column
    m = _RE_YEAR_VOLUME.match(volume) if volume[:1].isdigit() else None
    if m:
        year_value = (m.group(1) or "").strip()
        issue = (m.group(2) or "").strip()
        if year == "" and year_value != "":
            year = year_out = year_value
        if number == "" and issue != "" and not is_monthish(issue):
            number = normalize_supplement(issue)
        volume = ""

    # main pattern: "V (X)" — volume with embedded issue
    m = _RE_VOL_ISSUE.match(volume) if "(" in volume else None
    if m:
        vol_part = m.group(1).strip()
        issue = m.group(2).strip()
        volume = vol_part
        if number == "" and issue != "" and not is_monthish(issue):
            number = normalize_supplement(issue)

    volume, number, pages = volume.strip(), number.strip(), pages.strip()
    if volume.lower() == "no pagination":
        volume = ""
    if number.lower() == "no pagination":
        number = ""
    if pages.lower() == "no pagination":
        pages = ""

    if title_is_journal_only(title, journal):
        title = ""

    return title.strip(), journal.strip(), volume, number, pages, year_out
