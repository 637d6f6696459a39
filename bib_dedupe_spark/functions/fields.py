"""Scalar normalizers for the simple record fields.

Behavioral spec (golden string expectations in
/root/reference/tests/prep_test.py):

* year     — /root/reference/bib_dedupe/prep_year.py:8-24
* volume   — /root/reference/bib_dedupe/prep_volume.py:8-45
* number   — /root/reference/bib_dedupe/prep_number.py:8-31
* pages    — /root/reference/bib_dedupe/prep_pages.py:23-79
* doi      — /root/reference/bib_dedupe/prep_doi.py:9-35
* abstract — /root/reference/bib_dedupe/prep_abstract.py:8-62

Each function maps one raw string to its normalized form; missingness is
the empty string. These run batched inside Arrow pandas UDFs.
"""
from __future__ import annotations

import re
import urllib.parse

_RE_ISO_DATE = re.compile(r"^(\d{4})-\d{2}-\d{2}$")


def norm_year(value: str) -> str:
    """YYYY-MM-DD → year; int(float()); keep only 1900 < y < 2100."""
    m = _RE_ISO_DATE.match(value)
    if m:
        value = m.group(1)
    try:
        year = int(float(value))
    except ValueError:
        return ""
    if not 1900 < year < 2100:
        return ""
    return str(year)


_RE_VOL_PAREN = re.compile(r"(\d+) \(.*\)")
_RE_VOL_PAGES = re.compile(r"(\d+) \d+-\d+")
_RE_VOL_LEAD = re.compile(r"(\d+) .*")
_RE_VOL_SUPPL = re.compile(r"(\d+) suppl \d+")
_RE_NON_DIGIT_PAREN = re.compile(r"[^\d\(\)]")
_RE_DIGITS = re.compile(r"(\d+)")


def norm_volume(value: str) -> str:
    """Extract the leading volume integer from dirty volume strings."""
    m = _RE_VOL_PAREN.search(value)
    if m is not None:
        value = m.group(1)
    elif _RE_VOL_PAGES.search(value) is not None:
        value = _RE_VOL_LEAD.search(value).group(1)

    m = _RE_VOL_SUPPL.search(value.lower())
    if m is not None:
        value = m.group(1)

    value = _RE_NON_DIGIT_PAREN.sub("", value)

    m = _RE_DIGITS.search(value)
    if m is not None:
        value = m.group(0)
    else:
        value = value.replace("(", "").replace(")", "")

    if value == "nan" or len(value) > 100:
        return ""
    return value


_RE_LETTERS_DOTS = re.compile(r"[A-Za-z.]*")


def norm_number(value: str) -> str:
    """Strip letters/dots; pull the leading int when pages leaked in."""
    value = _RE_LETTERS_DOTS.sub("", value)
    if _RE_VOL_PAGES.search(value) is not None:
        value = _RE_VOL_LEAD.search(value).group(1)
    value = value.replace(" ", "").replace("(", "").replace(")", "")
    if value in ("nan", "var.pagings"):
        return ""
    return value


_EXCEL_MONTHS = (
    ("jan", "01"),
    ("feb", "02"),
    ("mar", "03"),
    ("apr", "04"),
    ("may", "05"),
    ("jun", "06"),
    ("jul", "07"),
    ("aug", "08"),
    ("sep", "09"),
    ("oct", "10"),
    ("nov", "11"),
    ("dec", "12"),
)

_ROMAN_VALUES = {"I": 1, "V": 5, "X": 10, "L": 50, "C": 100, "D": 500, "M": 1000}
_RE_ROMAN_RANGE = re.compile(r"([IVXLCDM]+)-([IVXLCDM]+)", re.I)
_RE_LEADING_ZEROS = re.compile(r"\b0+([0-9]+)")
_RE_LETTERS_DOTS_SPACES = re.compile(r"[A-Za-z. ]*")
_RE_PAGE_RANGE_FULL = re.compile(r"^\d+\s*-?-\s*\d+$")
_RE_NON_PAGE_CHARS = re.compile(r"[^0-9-]")

_PAGES_JUNK = {" ", None, "nan", "na", "no pages", "no pagination", "var.pagings"}


def _roman_to_int(s: str) -> int:
    total = 0
    for i, ch in enumerate(s):
        v = _ROMAN_VALUES[ch]
        if i > 0 and v > _ROMAN_VALUES[s[i - 1]]:
            total += v - 2 * _ROMAN_VALUES[s[i - 1]]
        else:
            total += v
    return total


def norm_pages(value: str) -> str:
    """Repair Excel month corruption, roman ranges, truncated ranges."""
    if value.isalpha():
        return ""

    lowered = value.lower()
    for month, num in _EXCEL_MONTHS:
        if month in lowered:
            value = lowered.replace(month, num)
            break

    m = _RE_ROMAN_RANGE.match(value)
    if m:
        return f"{_roman_to_int(m.group(1).upper())}-{_roman_to_int(m.group(2).upper())}"

    value = _RE_LEADING_ZEROS.sub(r"\1", value)
    value = _RE_LETTERS_DOTS_SPACES.sub("", value)

    if _RE_PAGE_RANGE_FULL.match(value):
        start, end = _RE_DIGITS.findall(value)
        if start == end:
            return start
        if len(start) > len(end):
            # "120-40" means 120-140: complete the truncated end
            return f"{start}-{start[: -len(end)]}{end}"
        return f"{start}-{end}"

    if value in _PAGES_JUNK:
        return ""
    return _RE_NON_PAGE_CHARS.sub("", value).lstrip("-").rstrip("-")


_RE_DOI_RESOLVER = re.compile(r"http://dx.doi.org/")
_RE_DOI_TAG = re.compile(r"\[doi\]")
_RE_NEWLINES = re.compile(r"[\r\n]+")


def norm_doi(value: str) -> str:
    """Normalize DOI strings: resolver prefixes, [pii] forms, url-quoting."""
    value = _RE_DOI_RESOLVER.sub("", value.lower())
    value = value.replace("-", "_")
    value = _RE_DOI_TAG.sub("", value)
    value = _RE_NEWLINES.sub(" ; ", value)

    if ";" in value:
        parts = value.split(";")
        if parts[1].lstrip().startswith("10."):
            value = parts[1].lstrip()
        elif parts[0].lstrip().startswith("10."):
            value = parts[0].lstrip()

    if "[pii];" in value:
        value = value.split("[pii];")[1]

    value = urllib.parse.unquote(value)
    if not value.startswith("10."):
        return ""
    if value == "nan":
        return ""
    return value.replace(".", "").rstrip()


_RE_TAGS = re.compile(r"<.*?>")
_RE_AB_LEAD = re.compile(r"^aims\s|^objectives|^background")
_RE_AB_AUTHORS_TAIL = re.compile(r"(\s*\d{4}\s*)?the authors[.?]$")
_RE_AB_YEAR_TAIL_SEARCH = re.compile(r"\.\s*\d{4}.*$")
_RE_AB_YEAR_TAIL_SUB = re.compile(r"\s*\d{4}.*$")
_RE_AB_C_TAIL_SEARCH = re.compile(r"\. \(c\) \d{4}.*\.$")
_RE_AB_C_TAIL_SUB = re.compile(r" \(c\) \d{4}.*\.$")
_RE_AB_TRUNC = re.compile(r"\.\(abstract truncated at 400 words\)$")
_RE_AB_LEAD_WORD = re.compile(r"^abstract ")
_RE_AB_TRAIL_YEAR = re.compile(r"\s*\(\d{4}\)$")
_RE_AB_KEEP = re.compile(r"[^A-Za-z0-9 .,]")
_RE_SPACES = re.compile(r"\s+")


def norm_abstract(value: str) -> str:
    """Lowercase, strip tags, truncate copyright tails, keep word chars."""
    text = _RE_TAGS.sub(" ", value.lower())
    text = _RE_AB_LEAD.sub("", text)

    if ". copyright" in text[-300:]:
        text = text[: text.rfind(". copyright")]
    elif "©" in text[-200:]:
        text = text[: text.rfind("©")]
    elif "the authors" in text[-100:]:
        text = _RE_AB_AUTHORS_TAIL.sub("", text)
    elif "springer-verlag" in text[-100:]:
        text = text[: text.rfind("springer-verlag")]
    elif _RE_AB_YEAR_TAIL_SEARCH.search(text):
        text = _RE_AB_YEAR_TAIL_SUB.sub("", text)
    elif _RE_AB_C_TAIL_SEARCH.search(text):
        text = _RE_AB_C_TAIL_SUB.sub("", text)
    elif ".(abstract truncated at 400 words)" in text[-80:]:
        text = _RE_AB_TRUNC.sub("", text)

    text = _RE_AB_LEAD_WORD.sub("", text)
    text = _RE_AB_TRAIL_YEAR.sub("", text)
    text = _RE_AB_KEEP.sub("", text)
    text = _RE_SPACES.sub(" ", text)
    if text == "nan":
        return ""
    return text.lower().rstrip(" .").lstrip(" .")
