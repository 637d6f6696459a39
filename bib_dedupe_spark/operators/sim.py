"""Similarity-scoring stage: 10 per-field scores in one Arrow pass.

Behavioral spec: /root/reference/bib_dedupe/sim.py:449-545 (row loop +
process pool). Here the whole stage is a single struct-in/struct-out
Arrow-batched ``pandas_udf`` over the pair table: ONLY the 20 kernel
input columns cross the JVM↔Python boundary (the other ~15 pair columns
never leave Tungsten), and the 10 similarity columns come back as one
struct — no shuffle, no per-row Python at the Spark API level.
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

_INPUT_COLS = (
    "author_1",
    "author_2",
    "author_full_1",
    "author_full_2",
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
    "abstract_1",
    "abstract_2",
    "doi_1",
    "doi_2",
)

SIM_STRUCT = StructType(
    [StructField(name, DoubleType(), True) for name in C.SIM_FIELDS_FLOAT]
    + [StructField(C.PAGE_RANGES_ADJACENT, StringType(), True)]
)


def _compute_sims(batch: pd.DataFrame) -> pd.DataFrame:
    s = {
        name: ["" if v is None else str(v) for v in batch[name].tolist()]
        for name in _INPUT_COLS
    }
    out = {
        C.AUTHOR: [
            K.sim_author(a1, f1, a2, f2)
            for a1, f1, a2, f2 in zip(
                s["author_1"],
                s["author_full_1"],
                s["author_2"],
                s["author_full_2"],
            )
        ],
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
        C.ABSTRACT: [
            # lossless cutoff: exact above the smallest rule threshold,
            # lower bound below it — no rule outcome can change
            K.sim_abstract(a, b, partial_cutoff=_ABSTRACT_CUTOFF)
            for a, b in zip(s["abstract_1"], s["abstract_2"])
        ],
        C.DOI: [K.sim_doi(a, b) for a, b in zip(s["doi_1"], s["doi_2"])],
        C.PAGE_RANGES_ADJACENT: [
            K.page_ranges_adjacent(a, b)
            for a, b in zip(s["pages_1"], s["pages_2"])
        ],
    }
    return pd.DataFrame(out)


@pandas_udf(SIM_STRUCT)
def _sims_udf(batch: pd.DataFrame) -> pd.DataFrame:
    return _compute_sims(batch)


def score(pairs_df: DataFrame) -> DataFrame:
    """Append the 10 similarity columns to the pair table."""
    with_struct = pairs_df.withColumn(
        "_sims", _sims_udf(F.struct(*[F.col(c) for c in _INPUT_COLS]))
    )
    return with_struct.select("*", "_sims.*").drop("_sims")
