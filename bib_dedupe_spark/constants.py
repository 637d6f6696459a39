"""Field-name constants and schema definitions for the record model.

Mirrors the reference's field vocabulary
(/root/reference/bib_dedupe/constants/fields.py,
prep.py:48-60 REQUIRED/OPTIONAL/ALL_FIELDS) — the all-string record schema
with ''-encoded missingness that the rule layer depends on.
"""
from __future__ import annotations

from pyspark.sql.types import StringType, StructField, StructType

ID = "ID"
ENTRYTYPE = "ENTRYTYPE"
TITLE = "title"
AUTHOR = "author"
YEAR = "year"
JOURNAL = "journal"
BOOKTITLE = "booktitle"
SERIES = "series"
VOLUME = "volume"
NUMBER = "number"
PAGES = "pages"
ABSTRACT = "abstract"
DOI = "doi"
SEARCH_SET = "search_set"
ORIGIN = "origin"
CONTAINER_TITLE = "container_title"

AUTHOR_FULL = "author_full"
AUTHOR_FIRST = "author_first"
TITLE_SHORT = "title_short"
CONTAINER_TITLE_SHORT = "container_title_short"

PAGE_RANGES_ADJACENT = "page_ranges_adjacent"
DUPLICATE_LABEL = "duplicate_label"
DUPLICATE = "duplicate"
MAYBE = "maybe"
BLOCK_RULE = "block_rule"
COMPONENT = "component"

REQUIRED_FIELDS = [ID, ENTRYTYPE, TITLE, AUTHOR, YEAR]
OPTIONAL_FIELDS = [
    JOURNAL,
    BOOKTITLE,
    SERIES,
    VOLUME,
    NUMBER,
    PAGES,
    ABSTRACT,
    DOI,
    SEARCH_SET,
]
ALL_FIELDS = REQUIRED_FIELDS + OPTIONAL_FIELDS + [CONTAINER_TITLE]

# prep() output columns, in order
PREPARED_FIELDS = [
    ID,
    ENTRYTYPE,
    TITLE,
    AUTHOR,
    YEAR,
    SERIES,
    VOLUME,
    NUMBER,
    PAGES,
    ABSTRACT,
    DOI,
    SEARCH_SET,
    CONTAINER_TITLE,
    AUTHOR_FULL,
    AUTHOR_FIRST,
    TITLE_SHORT,
    CONTAINER_TITLE_SHORT,
]

PREPARED_SCHEMA = StructType(
    [StructField(name, StringType(), True) for name in PREPARED_FIELDS]
)

# similarity columns appended by the scoring stage (floats + one 3-valued str)
SIM_FIELDS_FLOAT = [
    AUTHOR,
    TITLE,
    CONTAINER_TITLE,
    YEAR,
    VOLUME,
    NUMBER,
    PAGES,
    ABSTRACT,
    DOI,
]
SIM_FIELDS = SIM_FIELDS_FLOAT + [PAGE_RANGES_ADJACENT]


def pair_columns() -> list:
    """Pair-table columns: block_rule + every prepared column twice."""
    cols = [BLOCK_RULE]
    cols += [f"{c}_1" for c in PREPARED_FIELDS]
    cols += [f"{c}_2" for c in PREPARED_FIELDS]
    return cols
