"""Container-title (journal / proceedings venue) normalization.

Behavioral spec: /root/reference/bib_dedupe/prep_container_title.py:85-204
(golden expectations in /root/reference/tests/prep_test.py:144-247).

The journal-variant translation table (title_variant → canonical journal;
the reference maintains ~1,350 rows in its ``journal_variants.csv``) is an
injectable data dependency: :func:`load_journal_variants` reads an
explicit path or ``BIB_DEDUPE_JOURNAL_VARIANTS``, falling back to the
engine's bundled starter table (``data/journal_variants.csv``) with a
one-time warning — never to a reference checkout. Entry order matters
(first match wins), so the mapping is an ordered dict.
"""
from __future__ import annotations

import csv
import os
import re
from pathlib import Path

from bib_dedupe_spark.kernels import numwords

VENUE_STOPWORDS = frozenset(
    [
        "of",
        "for",
        "the",
        "and",
        "de",
        "d",
        "et",
        "in",
        "i",
        "&",
        "to",
        "on",
        "die",
        "part",
        "annual",
        "und",
        "für",
        "fur",
        "der",
    ]
)

# 4-char-prefix → canonical abbreviation rewrites, applied in order
VENUE_ABBREVIATIONS = (
    ("amer", "am"),
    ("soci", "soc"),
    ("expe", "exp"),
    ("mole", "mol"),
    ("scie", "sci"),
    ("brit", "br"),
    ("bole", "bol"),
    ("inte", "int"),
    ("arqu", "arq"),
    ("polo", "pol"),
    ("vete", "vet"),
    ("desi", "des"),
    ("mede", "med"),
    ("tera", "ter"),
    ("huma", "hum"),
    ("revu", "rev"),
    ("natu", "nat"),
    ("move", "mov"),
    ("cana", "can"),
    ("euro", "eur"),
    ("adva", "adv"),
    ("medi", "med"),
    ("anna", "ann"),
    ("revi", "rev"),
    ("rese", "res"),
    ("bmj br med j", "bmj"),
    ("br med j", "bmj"),
)

_VARIANTS_ENV = "BIB_DEDUPE_JOURNAL_VARIANTS"
# engine-owned starter table, shipped with the package (original curated
# rows; the reference maintains its own, much larger, table at
# bib_dedupe/journal_variants.csv — point the env var at a full table for
# corpus-grade coverage)
_BUNDLED_VARIANTS_PATH = Path(__file__).resolve().parent.parent / "data" / "journal_variants.csv"

_variants_cache: dict | None = None
_warned_bundled = False


def _parse_variants(lines) -> dict:
    mapping: dict = {}
    for row in csv.DictReader(lines):
        variant = (row.get("title_variant") or "").lower()
        canonical = (row.get("journal") or "").lower()
        if variant:
            mapping[variant] = canonical
    return mapping


def _read_variants_csv(p: Path) -> dict:
    with p.open(newline="", encoding="utf-8") as fh:
        return _parse_variants(fh)


def _read_bundled_data(name: str) -> str:
    # plain checkout first; importlib.resources covers the
    # spark-submit --py-files zip deployment (zipimport has no real paths)
    p = _BUNDLED_VARIANTS_PATH.parent / name
    if p.is_file():
        return p.read_text(encoding="utf-8")
    from importlib import resources

    return (
        resources.files("bib_dedupe_spark")
        .joinpath(f"data/{name}")
        .read_text(encoding="utf-8")
    )


def _read_bundled_variants() -> dict:
    """Curated starter rows + structurally GENERATED abbreviation rows.

    The curated CSV covers transliterated titles (not derivable
    structurally); the abbreviation-expansion generator
    (functions/abbrev_gen.py) derives NLM/ISO-4-style variant rows from
    the bundled canonical-title seed list, keeping only pairs the
    4-char-prefix cascade would not already unify. Curated rows come
    first — first match wins in _translate_variant.
    """
    mapping = _parse_variants(
        _read_bundled_data("journal_variants.csv").splitlines()
    )
    from bib_dedupe_spark.functions import abbrev_gen

    canonicals = _read_bundled_data("journal_canonical.txt").splitlines()
    generated = abbrev_gen.generated_mapping(
        canonicals, normalizer=norm_container_title
    )
    for variant, canonical in generated.items():
        mapping.setdefault(variant, canonical)
    return mapping


def load_journal_variants(
    path: str | None = None, strict: bool | None = None
) -> dict:
    """Ordered {title_variant_lower: canonical_journal_lower} mapping.

    Resolution order: explicit ``path`` arg → ``BIB_DEDUPE_JOURNAL_VARIANTS``
    env var → the engine's bundled starter table. The engine carries NO
    runtime dependency on a reference checkout.

    A CONFIGURED path (arg or env) that does not exist always raises —
    a misconfigured deployment must not silently normalize differently.
    When nothing is configured, the bundled starter table is used with a
    one-time warning (it covers common transliterated titles only;
    deployments that need parity with upstream bib-dedupe should point
    the env var at that project's full variants csv). ``strict=True`` (or
    ``BIB_DEDUPE_JOURNAL_VARIANTS_STRICT=1``) refuses the bundled
    fallback and raises instead.
    """
    global _variants_cache, _warned_bundled
    if path is None and _variants_cache is not None:
        return _variants_cache
    if strict is None:
        strict = os.environ.get(f"{_VARIANTS_ENV}_STRICT", "") == "1"
    configured = path or os.environ.get(_VARIANTS_ENV)
    if configured:
        p = Path(configured)
        if not p.is_file():
            raise FileNotFoundError(
                f"journal-variants table not found at {configured!r} "
                f"(from {'the path argument' if path else _VARIANTS_ENV}); "
                "expected a csv with columns: journal,title_variant"
            )
        mapping = _read_variants_csv(p)
    elif strict:
        raise FileNotFoundError(
            f"no journal-variants table configured and strict mode is on; "
            f"set {_VARIANTS_ENV} to your variants csv (columns: journal,"
            "title_variant)"
        )
    else:
        mapping = _read_bundled_variants()
        if not _warned_bundled:
            _warned_bundled = True
            import warnings

            warnings.warn(
                f"using the bundled starter journal-variants table "
                f"({len(mapping)} entries). For corpus-grade variant "
                f"coverage set {_VARIANTS_ENV} to a full variants csv "
                "(columns: journal,title_variant).",
                UserWarning,
                stacklevel=2,
            )
    if path is None:
        _variants_cache = mapping
    return mapping


_RE_PROCEEDINGS_OF_THE = re.compile("proceedings of the", re.IGNORECASE)
_RE_SPLIT_MARKERS = re.compile(r"(\.\d+)|(: )|( - )")
_RE_SPLIT_SEARCH = re.compile(r"(\.\d+)|(\. )|(: )|( - )")
_RE_ELECTRONIC_RESOURCE = re.compile(r"\s*\[Electronic Resource\]$")
_RE_TRAIL_PAREN_OR_S = re.compile(r"\s*\([^)]*\)\s*$|('s)")
_RE_LEAD_THE_OR_L = re.compile(r"^the\s|^(l')|", re.IGNORECASE)
_RE_NON_ALPHA = re.compile(r"[^A-Za-z ]+")
_RE_LEAD_ORDINAL = re.compile(r"^\s*(st|nd|rd|th) ", re.IGNORECASE)
_RE_TRAIL_THE = re.compile(r"\sthe\s*$", re.IGNORECASE)
_RE_PROC_SUPP = re.compile(r"^proc\s|\ssupp$")


def _translate_variant(value: str, variants: dict) -> str:
    """First-match journal-variant translation (skips single-word keys)."""
    if (
        not any(ch in value for ch in "=.[")
        and len(value) < 70
        and "journal" in value.lower()
    ):
        return value
    haystack = value.replace(".", " ").lower()
    for variant, canonical in variants.items():
        if " " not in variant:
            continue
        if variant in haystack:
            return canonical
    return value


def _abbreviate(ct: str) -> str:
    """Collapse a cleaned venue string to its 4-char-prefix abbreviation."""
    ct = _RE_TRAIL_THE.sub("", ct)
    ct = ct.lower().replace(" neuro ", " neuro").replace("-", "").replace("journal", "j")
    if "plos one" not in ct:
        ct = numwords.parse(ct)
    ct = " ".join(w[:4] for w in ct.split() if w not in VENUE_STOPWORDS)
    for prefix, abbrev in VENUE_ABBREVIATIONS:
        ct = ct.replace(prefix, abbrev)
    return _RE_PROC_SUPP.sub("", ct)


def norm_container_title(value: str, variants: dict | None = None) -> str:
    """Full container-title normalization cascade."""
    if variants is None:
        variants = load_journal_variants()

    lowered = value.lower()
    if "date of publication" in lowered or "conference start" in lowered:
        value = _RE_PROCEEDINGS_OF_THE.sub("", value.split(".")[0])
    else:
        value = _RE_PROCEEDINGS_OF_THE.sub("", value)

    value = _translate_variant(value, variants)

    if _RE_SPLIT_SEARCH.search(value):
        value = _RE_SPLIT_MARKERS.split(value)[0]

    value = _RE_ELECTRONIC_RESOURCE.sub("", value)
    value = _RE_TRAIL_PAREN_OR_S.sub("", value)
    value = _RE_LEAD_THE_OR_L.sub("", value)
    value = _RE_NON_ALPHA.sub(" ", value)
    value = _RE_LEAD_ORDINAL.sub("", value)

    return _abbreviate(value)


def container_title_short(ct: str) -> str:
    """Initialism of the alphabetic words (used as a blocking key)."""
    if ct == "nan":
        return ""
    return "".join(word[0] for word in ct.split() if word.isalpha())
