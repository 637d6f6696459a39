"""English number-word → digit rewriting (number_parser subset).

The reference pipeline calls ``number_parser.parse`` while normalizing
titles (/root/reference/bib_dedupe/prep_title.py:168) and container
titles (/root/reference/bib_dedupe/prep_container_title.py:124). That
package is unavailable here, so this module re-implements the subset the
golden prep cases exercise: cardinal number words (units, tens, scale
words, "and"-joined groups) rewritten to digit strings, all other tokens
passed through untouched.
"""
from __future__ import annotations

_UNITS = {
    "zero": 0,
    "one": 1,
    "two": 2,
    "three": 3,
    "four": 4,
    "five": 5,
    "six": 6,
    "seven": 7,
    "eight": 8,
    "nine": 9,
    "ten": 10,
    "eleven": 11,
    "twelve": 12,
    "thirteen": 13,
    "fourteen": 14,
    "fifteen": 15,
    "sixteen": 16,
    "seventeen": 17,
    "eighteen": 18,
    "nineteen": 19,
}

_TENS = {
    "twenty": 20,
    "thirty": 30,
    "forty": 40,
    "fifty": 50,
    "sixty": 60,
    "seventy": 70,
    "eighty": 80,
    "ninety": 90,
}

_SCALES = {
    "hundred": 100,
    "thousand": 1_000,
    "million": 1_000_000,
    "billion": 1_000_000_000,
    "trillion": 1_000_000_000_000,
}


def _is_number_word(token: str) -> bool:
    return token in _UNITS or token in _TENS or token in _SCALES


def _consume_number(tokens: list, start: int) -> tuple:
    """Greedily parse one spoken number starting at ``start``.

    Returns (value, tokens_consumed); consumed == 0 if no number begins here.
    """
    total = 0
    group = 0  # value below the next scale word
    last = None  # 'unit' | 'tens' | 'hundred' | 'scale'
    j = start
    n = len(tokens)
    while j < n:
        tok = tokens[j]
        if (
            tok == "and"
            and last in ("hundred", "scale")
            and j + 1 < n
            and (tokens[j + 1] in _UNITS or tokens[j + 1] in _TENS)
        ):
            j += 1
            continue
        if tok in _UNITS:
            value = _UNITS[tok]
            if last == "unit":
                break
            if last == "tens" and value >= 10:
                break
            group += value
            last = "unit"
        elif tok in _TENS:
            if last in ("unit", "tens"):
                break
            group += _TENS[tok]
            last = "tens"
        elif tok == "hundred":
            if last in ("hundred", "scale") or group == 0 and last is not None:
                break
            group = (group or 1) * 100
            last = "hundred"
        elif tok in _SCALES:
            scale = _SCALES[tok]
            if last == "scale":
                break
            total += (group or 1) * scale
            group = 0
            last = "scale"
        else:
            break
        j += 1
    if last is None:
        return 0, 0
    return total + group, j - start


def parse(text: str) -> str:
    """Rewrite cardinal number words in ``text`` to digit strings."""
    if not text:
        return text
    tokens = text.split(" ")
    out: list = []
    i = 0
    n = len(tokens)
    while i < n:
        if _is_number_word(tokens[i]):
            value, consumed = _consume_number(tokens, i)
            if consumed:
                out.append(str(value))
                i += consumed
                continue
        out.append(tokens[i])
        i += 1
    return " ".join(out)
