"""Similarity-scoring stage: 10 per-field scores in one Arrow pass.

Behavioral spec: /root/reference/bib_dedupe/sim.py:449-545 (row loop +
process pool). Here the whole stage is a single ``mapInPandas`` over the
pair table — the similarity kernels run per Arrow batch on executors, no
per-row Python at the Spark API level, no shuffle.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from bib_dedupe_spark import constants as C
from bib_dedupe_spark.kernels import similarity as K


def _score_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    s = {name: pdf[name].astype(str) for name in pdf.columns}
    pdf[C.AUTHOR] = [
        K.sim_author(a1, f1, a2, f2)
        for a1, f1, a2, f2 in zip(
            s["author_1"], s["author_full_1"], s["author_2"], s["author_full_2"]
        )
    ]
    pdf[C.TITLE] = [
        K.sim_title(a, b) for a, b in zip(s["title_1"], s["title_2"])
    ]
    pdf[C.CONTAINER_TITLE] = [
        K.sim_container_title(a, b)
        for a, b in zip(s["container_title_1"], s["container_title_2"])
    ]
    pdf[C.YEAR] = [K.sim_year(a, b) for a, b in zip(s["year_1"], s["year_2"])]
    pdf[C.VOLUME] = [
        K.sim_volume(a, b) for a, b in zip(s["volume_1"], s["volume_2"])
    ]
    pdf[C.NUMBER] = [
        K.sim_number(a, b) for a, b in zip(s["number_1"], s["number_2"])
    ]
    pdf[C.PAGES] = [
        K.sim_page(a, b) for a, b in zip(s["pages_1"], s["pages_2"])
    ]
    pdf[C.ABSTRACT] = [
        K.sim_abstract(a, b) for a, b in zip(s["abstract_1"], s["abstract_2"])
    ]
    pdf[C.DOI] = [K.sim_doi(a, b) for a, b in zip(s["doi_1"], s["doi_2"])]
    pdf[C.PAGE_RANGES_ADJACENT] = [
        K.page_ranges_adjacent(a, b) for a, b in zip(s["pages_1"], s["pages_2"])
    ]
    return pdf


def scored_schema(pairs_df: DataFrame) -> StructType:
    fields = list(pairs_df.schema.fields)
    for name in C.SIM_FIELDS_FLOAT:
        fields.append(StructField(name, DoubleType(), True))
    fields.append(StructField(C.PAGE_RANGES_ADJACENT, StringType(), True))
    return StructType(fields)


def score(pairs_df: DataFrame) -> DataFrame:
    """Append the 10 similarity columns to the pair table."""
    schema = scored_schema(pairs_df)

    def run(iterator):
        for pdf in iterator:
            if pdf.empty:
                yield pd.DataFrame(columns=schema.fieldNames())
            else:
                yield _score_batch(pdf)

    return pairs_df.mapInPandas(run, schema=schema)
