"""Author-field normalization.

Behavioral spec: /root/reference/bib_dedupe/prep_author.py
(format-case classifier :27-68, splitter :71-94, accent folding :97-123,
per-case reconstruction :126-184, main cascade :187-300, first-author
selection :309-329). Golden expectations:
/root/reference/tests/prep_test.py:18-138.

Messy real-world author strings ("Broadley K.Burton A. C.",
"VianaA.F.MacielI.S.", "B. Abrahao; P. Parigi", org names) are classified
into one of seven format cases and re-assembled into the canonical
"surname, initials and surname, initials" form, then lowercased with
punctuation stripped.
"""
from __future__ import annotations

import re
import unicodedata

# checked in order; multi-word prefixes must precede their single-word stems
SURNAME_PREFIXES = (
    "van der",
    "van",
    "von der",
    "von",
    "vom",
    "le",
    "den",
    "der",
    "ter",
    "de",
    "da",
    "di",
)

_PREFIX_ALT = "|".join(SURNAME_PREFIXES)

_RE_DIGITS = re.compile(r"\d")
_RE_PREFIX_AFTER_CAP = re.compile(r"([A-Z])(" + _PREFIX_ALT + r") (\w+)")
_RE_PREFIX_AFTER_SEP = re.compile(
    r"(^| |\.|-)(" + _PREFIX_ALT + r") (\w+)", re.IGNORECASE
)
_RE_INITIALS_SURNAME = re.compile(
    r"^([A-Z]\.\s+){1,3}[A-Z][a-z]+(?:\s+[A-Z][a-z]+)*$"
)
_RE_LOWER_UPPER_BOUNDARY = re.compile(r"(?<=[a-z])(?=[A-Z])")
_RE_CAP_BOUNDARY = re.compile(r"(?=[A-Z])")
_RE_INNER_LOWER_UPPER = re.compile(r"[a-z]{3}[A-Z]")
_RE_CAPITALIZED_WORD = re.compile(r"[A-Z][a-z]+")
_RE_GLUED_NAMES = re.compile(r"[A-Z][a-z\.]+[A-Z][a-z]+")
_RE_STRIP_PUNCT = re.compile(r"[^A-Za-z0-9, ]+")
_RE_WORD_GLUE = re.compile(r"([A-Z][a-z.]+)([A-Z])")
_RE_SELECT_PREFIX = re.compile(r"(^| )(" + _PREFIX_ALT + r") ", re.IGNORECASE)


def fold_accents(text: str) -> str:
    """NFKD-decompose and strip combining marks / 'WITH ...' variants."""

    def base_char(ch: str) -> str:
        try:
            name = unicodedata.name(ch)
            cut = name.find(" WITH ")
            if cut != -1:
                ch = unicodedata.lookup(name[:cut])
        except (KeyError, ValueError):
            pass
        return ch

    # ASCII fast path — provably the identity: NFKD is a no-op, no ASCII
    # char is combining, and no ASCII character name contains " WITH ".
    # The per-char unicodedata.name walk below was the #1 cost of the
    # whole prep batch profile; most real author strings never enter it.
    if text.isascii():
        return text
    try:
        decomposed = unicodedata.normalize("NFKD", text)
        out = []
        for c in decomposed:
            if c.isascii():
                out.append(c)
            elif not unicodedata.combining(c):
                out.append(base_char(c))
        return "".join(out)
    except ValueError:
        return text


def _split_author_fragments(authors: str) -> list:
    """Fragment a raw author string at capital-letter boundaries."""
    if len(authors) < 15:
        if " " not in authors and _RE_INNER_LOWER_UPPER.search(authors):
            return _RE_LOWER_UPPER_BOUNDARY.split(authors)
        if authors.count(" ") <= 2:
            return authors.split(" ")

    fragments = _RE_CAP_BOUNDARY.split(authors)
    for i in range(len(fragments) - 1):
        frag = fragments[i]
        if (
            frag.endswith("-")
            or frag in ("Mc", "Mac")
            or (
                len(frag) == 1
                and frag.isupper()
                and len(fragments[i + 1]) == 1
                and fragments[i + 1].isupper()
            )
        ):
            fragments[i + 1] = frag + fragments[i + 1]
            fragments[i] = ""
    return [f.rstrip() for f in fragments if f != ""]


def _classify_format(fragments: list, original: str) -> str:
    """Assign one of the seven author-format cases."""
    if fragments == [""]:
        return "empty"

    lowered = original.lower()
    if any(kw in lowered for kw in ("group", "agency", "council")):
        return "organization"

    if (" and " in original and ", " in original) or (
        " and " not in original and ", " in original and len(original) < 50
    ):
        return "proper_format"

    if len(fragments) < 4 and not any("," in f for f in fragments):
        return "single_author_missing_comma"

    # NOTE: list-membership tests (not substring), mirroring the reference
    if " and " not in fragments and "," not in fragments and len(original) > 5:
        short_upper = sum(
            1
            for f in fragments
            if f.isupper() and len(re.sub(r"[ .-]", "", f)) < 3
        )
        if short_upper / len(fragments) >= 0.4:
            return "abbreviated_initials"

        if len(_RE_GLUED_NAMES.findall(original)) / len(fragments) >= 0.1:
            if " " in original:
                return "missing_spaces_between_words"
            return "no_spaces_at_al"

    return "special_case"


def _rebuild_abbreviated_initials(fragments: list) -> str:
    """'Broadley K.Burton A. C.' style → 'Broadley, K and Burton, A C'."""
    grouped: list = []
    pending: list = []
    for frag in fragments:
        if _RE_CAPITALIZED_WORD.match(frag):
            grouped.append(" ".join(pending))
            pending = [frag]
        else:
            pending.append(frag)
    grouped.append(" ".join(pending))
    grouped = [g for g in grouped if g != ""]

    for i, item in enumerate(grouped):
        words = item.split()
        for j in range(len(words) - 1, -1, -1):
            if words[j].isupper() and not words[j - 1].isupper():
                words[j - 1] = words[j - 1] + ","
                break
        grouped[i] = " ".join(words)

    parts: list = []
    for i, item in enumerate(grouped):
        if i == len(grouped) - 1:
            parts.append(item)
        elif ", " in item:
            parts.append(item + " and ")
        else:
            parts.append(item + " ")
    return "".join(parts)


def _rebuild_glued_no_spaces(fragments: list) -> str:
    """'PayenJ.-L.IzopetJ.' style reconstruction."""
    out = ""
    for frag in fragments:
        if re.match(r"^[A-Z][a-z]+", frag):
            out += frag + " "
        else:
            out += ", " + frag + " and "
    # NOTE: str.rstrip with a char set, mirroring the reference exactly
    return out.rstrip(" and ")


def _rebuild_missing_spaces(original: str) -> str:
    """'Vernia FilippoDi Ruscio Mirko' style reconstruction."""
    chunks = _RE_WORD_GLUE.sub(r"\1 SPLIT\2", original).split("SPLIT")
    for i, chunk in enumerate(chunks):
        words = [
            w.replace(".", "").rstrip()
            for w in chunk.split()
            if w.lower() not in SURNAME_PREFIXES
        ]
        if len(words) > 1:
            words.insert(len(words) // 2, ",")
            chunks[i] = " ".join(words)
    return " and ".join(chunks)


def _hyphenate_prefix(match: re.Match) -> str:
    return (
        match.group(1) + match.group(2).title().replace(" ", "-") + "-" + match.group(3)
    )


def norm_author(authors: str) -> str:
    """Full author normalization cascade → 'surname, i and ...' lowercase."""
    authors = str(authors)
    if authors.lower() in ("nan", "anonymous"):
        return ""

    # accent folding + digraph simplification (databases mangle accents)
    authors = (
        fold_accents(authors).replace("ue", "u").replace("oe", "o").replace("ae", "a")
    )
    authors = _RE_DIGITS.sub("", authors)

    if ";" in authors:
        semi_normalized = authors.replace(";", " and ")
        chunks = [c.strip() for c in semi_normalized.split(" and ") if c.strip()]
        if chunks and all(_RE_INITIALS_SURNAME.match(c.strip()) for c in chunks):
            rebuilt = []
            for chunk in chunks:
                tokens = chunk.replace(".", "").split()
                *initials, surname = tokens
                initials_part = " ".join(i.lower() for i in initials)
                rebuilt.append(f"{surname.lower()}, {initials_part}")
            return " and ".join(rebuilt)
        authors = semi_normalized

    authors = _RE_PREFIX_AFTER_CAP.sub(_hyphenate_prefix, authors)
    authors = _RE_PREFIX_AFTER_SEP.sub(_hyphenate_prefix, authors)

    original = authors
    fragments = _split_author_fragments(authors)
    case = _classify_format(fragments, original)

    if case in ("proper_format", "organization"):
        result = authors
    elif case == "empty":
        result = ""
    elif case == "single_author_missing_comma":
        first = fragments[0]
        if first.isupper():
            first = first.title()
        result = first + ", " + " ".join(fragments[1:])
    elif case == "abbreviated_initials":
        result = _rebuild_abbreviated_initials(fragments)
    elif case == "no_spaces_at_al":
        result = _rebuild_glued_no_spaces(fragments)
    elif case == "missing_spaces_between_words":
        result = _rebuild_missing_spaces(original)
    else:
        result = " and ".join(fragments)

    result = result.replace(" ,", ",")
    result = _RE_STRIP_PUNCT.sub("", result)
    return result.lower()


def select_surnames(authors: str) -> str:
    """First ≤8 surnames, space-joined (the blocking-side author form)."""
    surnames = []
    for author in authors.split(" and "):
        head = author.split(",")[0]
        head = _RE_SELECT_PREFIX.sub(
            lambda m: m.group(1) + m.group(2).replace(" ", "-") + "-", head
        )
        surnames.append(head.replace(" ", ""))
    joined = " ".join(surnames[:8])
    joined = joined.replace("anonymous", "").replace("jr", "")
    return _RE_STRIP_PUNCT.sub("", joined)
