"""Title normalization.

Behavioral spec: /root/reference/bib_dedupe/prep_title.py:47-182
(golden expectations in /root/reference/tests/prep_test.py:252-382).
"""
from __future__ import annotations

import html
import re

from bib_dedupe_spark.kernels import numwords

PREP_TITLE_STOPWORDS = frozenset(
    [
        "a",
        "an",
        "the",
        "in",
        "of",
        "on",
        "for",
        "from",
        "does",
        "do",
        "and",
        "are",
        "with",
        "to",
        "or",
        "as",
        "by",
        "their",
    ]
)

_RE_TRANSLATED_TAIL = re.compile(
    r"\. (Russian|Chinese|Spanish|Czech|Italian|Polish|Dutch|Ukrainian|German"
    r"|French|Japanese|Slovak|Hungarian|Portuguese English|Turkish|Norwegian"
    r"|Portuguese)(\r?\n)?.*$",
    re.IGNORECASE,
)
_RE_PREFIX_SUFFIX_NOISE = re.compile(
    r"^(withdrawn[.:] )|^(proceedings: )|^(reprint)|( \(review\))$|( \(vol \d+.*\))",
    re.IGNORECASE,
)
_RE_ROMAN_1 = re.compile(r"\bi\b", re.IGNORECASE)
_RE_ROMAN_2 = re.compile(r"\bii\b", re.IGNORECASE)
_RE_ROMAN_3 = re.compile(r"\biii\b", re.IGNORECASE)
_RE_ROMAN_4 = re.compile(r"\biv\b", re.IGNORECASE)
_RE_HTML_TAG = re.compile(r"<.*?>")
_RE_LANG_TAG = re.compile(r"\. \[[A-Z][a-z]*\]$")
_RE_TRAILING_1 = re.compile(r"1$")
_RE_REVIEW_REFS_TAIL = re.compile(r" review \d+ refs$")
_RE_TRAIL_PAREN = re.compile(r"\s*\([^)]*\)\s*$")
_RE_REVIEW_REFS = re.compile(
    r"\[Review\] \[\d+ refs\]| \[abstract no: \d+\]", re.IGNORECASE
)
_RE_FORMULA_PAREN = re.compile(r"([A-Za-z])\(([0-9]*)\)")
_RE_KEEP_CHARS = re.compile(r"[^A-Za-z0-9,\[\]]+")
_RE_DIGIT_GAP = re.compile(r"(\d) (\d)")
_RE_WS = re.compile(r"\s+")

_ERRATUM_PHRASES = ("erratum appears in ", "erratum in ")


def _drop_erratum_tail(title: str) -> str:
    for phrase in _ERRATUM_PHRASES:
        if phrase in title.lower():
            title = title[: title.lower().rfind(phrase) - 2]
    return _RE_REVIEW_REFS_TAIL.sub("", title)


def norm_title(title: str) -> str:
    """Full title normalization cascade → lowercase token string."""
    if ". " in title:
        title = _RE_TRANSLATED_TAIL.sub("", title)

    title = (
        title.replace("-like", "like")
        .replace("co-", "co")
        .replace("post-", "post")
        .replace("three-dimensional", "threedimensional")
        .replace("+", " plus ")
    )

    title = _RE_PREFIX_SUFFIX_NOISE.sub("", title)

    # roman numerals i..iv → digits (title similarity is number-sensitive)
    title = _RE_ROMAN_4.sub(
        " 4 ", _RE_ROMAN_3.sub(" 3 ", _RE_ROMAN_2.sub(" 2 ", _RE_ROMAN_1.sub(" 1 ", title)))
    )

    title = _RE_HTML_TAG.sub(" ", title)
    title = html.unescape(title)
    title = _RE_LANG_TAG.sub("", title)

    if "part" not in title[-10:].lower():
        title = _RE_TRAILING_1.sub("", title)

    title = _drop_erratum_tail(title)
    title = _RE_TRAIL_PAREN.sub("", title)
    title = _RE_REVIEW_REFS.sub("", title)
    title = _RE_FORMULA_PAREN.sub(r"\1\2", title)
    title = _RE_KEEP_CHARS.sub(" ", title.lower())

    title = " ".join(w for w in title.split() if w not in PREP_TITLE_STOPWORDS)
    title = numwords.parse(title)
    title = _RE_DIGIT_GAP.sub(r"\1\2", title).rstrip(" ].").lstrip("[ ")
    return _RE_WS.sub(" ", title).strip()
