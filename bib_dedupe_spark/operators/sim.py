"""Similarity-scoring stage: 10 per-field scores via Arrow-batched UDFs.

Behavioral spec: /root/reference/bib_dedupe/sim.py:449-545 (row loop +
process pool). Here the stage is struct-in/struct-out Arrow-batched
``pandas_udf``s over the pair table: ONLY the kernel input columns cross
the JVM↔Python boundary (the other ~15 pair columns never leave
Tungsten), and the similarity columns come back as one struct — no
shuffle, no per-row Python at the Spark API level.

Two shapes:

- ``score(pairs)`` — all 10 sims in ONE Arrow pass (one UDF, one
  boundary). The shape for consumers that need every column.
- ``score_cheap(pairs)`` / ``score_expensive(df)`` — the staged split
  used by the lazy match path (operators/match.py): the cheap kernels
  (title/container/year/volume/number/pages/doi/page-adjacency) run for
  every pair; the expensive author + abstract kernels run ONLY for pairs
  the rule bounds cannot decide from the cheap sims. At corpus scale the
  expensive pair fraction is a few percent, and abstracts dominate
  per-pair cost, so this is the 100 TB budget lever.

Abstract-cutoff contract: ``sim_abstract`` is computed with a banded
partial-ratio cutoff (default ``rules.MIN_ABSTRACT_SIM_THRESHOLD``).
Values ABOVE the cutoff are exact; values BELOW it are LOWER BOUNDS of
the reference's value (never higher). No default rule reads
``abstract`` below the cutoff (pinned by test_rules), so match/maybe
labels are bit-identical to exact scoring — but any non-rule consumer of
the raw column (debug output, matched-edge parquet, downstream
analytics) must either tolerate the bound or request exact values with
``abstract_cutoff=0.0`` (the debug CLI does exactly that).
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from bib_dedupe_spark import constants as C
from bib_dedupe_spark.kernels import similarity as K
from bib_dedupe_spark.rules import MIN_ABSTRACT_SIM_THRESHOLD

# 0-100 scale for the fuzz kernels
_ABSTRACT_CUTOFF = MIN_ABSTRACT_SIM_THRESHOLD * 100.0

# ---- cheap kernels: everything except author/abstract -------------------

_CHEAP_INPUT_COLS = (
    "title_1",
    "title_2",
    "container_title_1",
    "container_title_2",
    "year_1",
    "year_2",
    "volume_1",
    "volume_2",
    "number_1",
    "number_2",
    "pages_1",
    "pages_2",
    "doi_1",
    "doi_2",
)

CHEAP_SIM_FIELDS_FLOAT = [
    C.TITLE,
    C.CONTAINER_TITLE,
    C.YEAR,
    C.VOLUME,
    C.NUMBER,
    C.PAGES,
    C.DOI,
]

CHEAP_STRUCT = StructType(
    [StructField(name, DoubleType(), True) for name in CHEAP_SIM_FIELDS_FLOAT]
    + [StructField(C.PAGE_RANGES_ADJACENT, StringType(), True)]
)

# ---- expensive kernels: author + abstract --------------------------------

_EXPENSIVE_INPUT_COLS = (
    "author_1",
    "author_2",
    "author_full_1",
    "author_full_2",
    "abstract_1",
    "abstract_2",
)

EXPENSIVE_STRUCT = StructType(
    [
        StructField(C.AUTHOR, DoubleType(), True),
        StructField(C.ABSTRACT, DoubleType(), True),
    ]
)


_INPUT_COLS = (
    "author_1",
    "author_2",
    "author_full_1",
    "author_full_2",
) + _CHEAP_INPUT_COLS[:4] + (
    "year_1",
    "year_2",
    "volume_1",
    "volume_2",
    "number_1",
    "number_2",
    "pages_1",
    "pages_2",
    "abstract_1",
    "abstract_2",
    "doi_1",
    "doi_2",
)

SIM_STRUCT = StructType(
    [StructField(name, DoubleType(), True) for name in C.SIM_FIELDS_FLOAT]
    + [StructField(C.PAGE_RANGES_ADJACENT, StringType(), True)]
)


def _strs(batch: pd.DataFrame, cols) -> dict:
    return {
        name: ["" if v is None else str(v) for v in batch[name].tolist()]
        for name in cols
    }


def _cheap_sims(s: dict) -> dict:
    return {
        C.TITLE: [K.sim_title(a, b) for a, b in zip(s["title_1"], s["title_2"])],
        C.CONTAINER_TITLE: [
            K.sim_container_title(a, b)
            for a, b in zip(s["container_title_1"], s["container_title_2"])
        ],
        C.YEAR: [K.sim_year(a, b) for a, b in zip(s["year_1"], s["year_2"])],
        C.VOLUME: [
            K.sim_volume(a, b) for a, b in zip(s["volume_1"], s["volume_2"])
        ],
        C.NUMBER: [
            K.sim_number(a, b) for a, b in zip(s["number_1"], s["number_2"])
        ],
        C.PAGES: [
            K.sim_page(a, b) for a, b in zip(s["pages_1"], s["pages_2"])
        ],
        C.DOI: [K.sim_doi(a, b) for a, b in zip(s["doi_1"], s["doi_2"])],
        C.PAGE_RANGES_ADJACENT: [
            K.page_ranges_adjacent(a, b)
            for a, b in zip(s["pages_1"], s["pages_2"])
        ],
    }


def _expensive_sims(s: dict, abstract_cutoff: float) -> dict:
    return {
        C.AUTHOR: [
            K.sim_author(a1, f1, a2, f2)
            for a1, f1, a2, f2 in zip(
                s["author_1"],
                s["author_full_1"],
                s["author_2"],
                s["author_full_2"],
            )
        ],
        C.ABSTRACT: [
            K.sim_abstract(a, b, partial_cutoff=abstract_cutoff)
            for a, b in zip(s["abstract_1"], s["abstract_2"])
        ],
    }


def _compute_sims(batch: pd.DataFrame, abstract_cutoff: float) -> pd.DataFrame:
    s = _strs(batch, _INPUT_COLS)
    out = _expensive_sims(s, abstract_cutoff)
    out.update(_cheap_sims(s))
    return pd.DataFrame(out)[
        C.SIM_FIELDS_FLOAT + [C.PAGE_RANGES_ADJACENT]
    ]


def _make_full_udf(abstract_cutoff: float):
    @pandas_udf(SIM_STRUCT)
    def _sims_udf(batch: pd.DataFrame) -> pd.DataFrame:
        return _compute_sims(batch, abstract_cutoff)

    return _sims_udf


def _make_expensive_udf(abstract_cutoff: float):
    @pandas_udf(EXPENSIVE_STRUCT)
    def _exp_udf(batch: pd.DataFrame) -> pd.DataFrame:
        s = _strs(batch, _EXPENSIVE_INPUT_COLS)
        return pd.DataFrame(_expensive_sims(s, abstract_cutoff))[
            [C.AUTHOR, C.ABSTRACT]
        ]

    # the kernels ARE deterministic; the marker only blocks filter
    # pushdown through the projection that computes them — without it,
    # the staged label filter gets substituted below the project and
    # ExtractPythonUDFs materializes a SECOND ArrowEval of the same UDF
    # (expensive kernels evaluated twice per row; plan-pinned in
    # tests/test_match_staged.py::test_staged_plan_shape)
    return _exp_udf.asNondeterministic()


@pandas_udf(CHEAP_STRUCT)
def _cheap_udf(batch: pd.DataFrame) -> pd.DataFrame:
    s = _strs(batch, _CHEAP_INPUT_COLS)
    return pd.DataFrame(_cheap_sims(s))[
        CHEAP_SIM_FIELDS_FLOAT + [C.PAGE_RANGES_ADJACENT]
    ]


def score(pairs_df: DataFrame, abstract_cutoff: float | None = None) -> DataFrame:
    """Append all 10 similarity columns in one Arrow pass.

    ``abstract_cutoff`` — 0-100-scale banded-kernel cutoff; defaults to
    ``MIN_ABSTRACT_SIM_THRESHOLD * 100``. Pass ``0.0`` for exact abstract
    sims everywhere (slower; the debug paths do this). See the module
    docstring for the below-cutoff lower-bound contract.
    """
    cutoff = _ABSTRACT_CUTOFF if abstract_cutoff is None else abstract_cutoff
    udf = _make_full_udf(cutoff)
    with_struct = pairs_df.withColumn(
        "_sims", udf(F.struct(*[F.col(c) for c in _INPUT_COLS]))
    )
    return with_struct.select("*", "_sims.*").drop("_sims")


def score_cheap(pairs_df: DataFrame) -> DataFrame:
    """Append the 8 cheap similarity columns (no author / abstract)."""
    with_struct = pairs_df.withColumn(
        "_csims", _cheap_udf(F.struct(*[F.col(c) for c in _CHEAP_INPUT_COLS]))
    )
    return with_struct.select("*", "_csims.*").drop("_csims")


def gated_expensive_inputs(gate: "F.Column") -> "F.Column":
    """Struct of the expensive-kernel inputs, '' unless ``gate``.

    ONE conditional on the whole struct — the gate expression is
    referenced once, so CollapseProject cannot fan its (large,
    rule-bound-derived) tree out into every input column. The staged
    match path materializes this struct BEFORE its persist barrier so
    the cached frame never carries the heavy raw abstract/author columns
    for decided rows.
    """
    return F.when(
        gate, F.struct(*[F.col(c) for c in _EXPENSIVE_INPUT_COLS])
    ).otherwise(
        F.struct(*[F.lit("").alias(c) for c in _EXPENSIVE_INPUT_COLS])
    )


def score_expensive(
    df: DataFrame,
    abstract_cutoff: float | None = None,
    gate: "F.Column | None" = None,
    inputs_struct: "F.Column | None" = None,
) -> DataFrame:
    """Append the author + abstract similarity columns to ``df``.

    ``gate`` — optional boolean Column: rows where it is false ship EMPTY
    strings through the Arrow boundary (the kernels return instantly and
    the outputs are meaningless for those rows — the caller must not read
    them). ``inputs_struct`` — a pre-built (possibly gated) input struct
    column; overrides ``gate``.
    """
    cutoff = _ABSTRACT_CUTOFF if abstract_cutoff is None else abstract_cutoff
    udf = _make_expensive_udf(cutoff)
    if inputs_struct is not None:
        inputs = inputs_struct
    elif gate is None:
        inputs = F.struct(*[F.col(c) for c in _EXPENSIVE_INPUT_COLS])
    else:
        inputs = gated_expensive_inputs(gate)
    with_struct = df.withColumn("_esims", udf(inputs))
    return with_struct.select("*", "_esims.*").drop("_esims")
