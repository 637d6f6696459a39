"""Maybe-case review round-trip (human-in-the-loop edge relabeling).

Behavioral spec: /root/reference/bib_dedupe/maybe_cases.py
(export :52-150, import :153-192, ranking similarity :44-49). The
reference writes/reads a CSV side file; here export produces the review
DataFrame (two rows per maybe pair, ranked by a fuzzy author+title
similarity) — callers persist it wherever they like — and import applies
the reviewed decisions back onto the matched edge list.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bib_dedupe_spark import constants as C
from bib_dedupe_spark.kernels import fuzz
from bib_dedupe_spark.operators.cluster import connected_components

EXPORT_FRONT_FIELDS = [
    "similarity_score",
    C.DUPLICATE_LABEL,
    "cluster_ID",
    C.AUTHOR,
    C.TITLE,
    C.CONTAINER_TITLE,
    C.YEAR,
    C.VOLUME,
    C.NUMBER,
    C.PAGES,
    C.DOI,
    C.ABSTRACT,
]


def export_maybe(matched_df: DataFrame, records_df: DataFrame) -> DataFrame:
    """Maybe pairs → review table: one row per member, ranked clusters.

    Maybe-pair endpoints are first remapped to their duplicate-cluster
    representative (min ID) so reviewers see one link between clusters
    (maybe_cases.py:70-82).
    """
    dup_edges = matched_df.filter(
        F.col(C.DUPLICATE_LABEL) == C.DUPLICATE
    ).select(F.col("ID_1").alias("src"), F.col("ID_2").alias("dst"))
    rep = connected_components(dup_edges).select(
        F.col(C.ID).alias("member"), F.col(C.COMPONENT).alias("rep")
    )

    maybe = matched_df.filter(F.col(C.DUPLICATE_LABEL) == C.MAYBE)
    for side in ("1", "2"):
        maybe = (
            maybe.join(
                rep.withColumnRenamed("member", f"ID_{side}"),
                f"ID_{side}",
                "left",
            )
            .withColumn(
                f"ID_{side}", F.coalesce(F.col("rep"), F.col(f"ID_{side}"))
            )
            .drop("rep")
        )

    pairs = (
        maybe.filter(F.col("ID_1") != F.col("ID_2"))
        .dropDuplicates(["ID_1", "ID_2"])
        .select("ID_1", "ID_2")
    )

    # deterministic cluster ids derived from the pair key itself — the
    # reference's enumerate() index (maybe_cases.py:93-95) is row-order
    # cosmetic, and a global Window.orderBy would funnel every maybe pair
    # through one partition; xxhash64 keeps the plan fully parallel
    pairs = pairs.withColumn("cluster_ID", F.xxhash64("ID_1", "ID_2"))

    members = pairs.select(
        "cluster_ID", F.col("ID_1").alias(C.ID), F.lit(0).alias("_pos")
    ).unionByName(
        pairs.select(
            "cluster_ID", F.col("ID_2").alias(C.ID), F.lit(1).alias("_pos")
        )
    )

    records_str = records_df.select(
        *[F.col(c).cast("string").alias(c) for c in records_df.columns]
    )
    enriched = members.join(records_str, C.ID, "inner")

    record_cols = [c for c in enriched.columns if c not in ("cluster_ID", "_pos")]
    out_schema = ", ".join(
        ["`cluster_ID` long", "`_pos` int"]
        + [f"`{c}` string" for c in record_cols]
        + ["`similarity_score` double"]
    )

    def score_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_pos", kind="stable")
        sim = 0.0
        if len(pdf) >= 2:
            first, second = pdf.iloc[0], pdf.iloc[1]
            sim = round(
                fuzz.ratio(
                    str(first[C.AUTHOR]) + str(first[C.TITLE]),
                    str(second[C.AUTHOR]) + str(second[C.TITLE]),
                )
                / 100,
                2,
            )
        return pdf.assign(similarity_score=sim)

    scored = enriched.groupBy("cluster_ID").applyInPandas(
        score_cluster, schema=out_schema
    )

    out = scored.withColumn(C.DUPLICATE_LABEL, F.lit(C.MAYBE)).orderBy(
        F.desc("similarity_score"), F.asc("cluster_ID"), F.asc("_pos")
    )
    front = [c for c in EXPORT_FRONT_FIELDS if c in out.columns] + [C.ID]
    rest = [c for c in out.columns if c not in front and c != "_pos"]
    return out.select(*front, *rest)


def import_maybe(matched_df: DataFrame, reviewed_df: DataFrame) -> DataFrame:
    """Apply reviewed decisions: promote confirmed maybes, drop the rest.

    ``reviewed_df`` is the (possibly edited) export with the
    duplicate_label column flipped to 'duplicate' where confirmed.
    """
    confirmed = (
        reviewed_df.filter(F.col(C.DUPLICATE_LABEL) == C.DUPLICATE)
        .groupBy("cluster_ID")
        .agg(F.min(C.ID).alias("lo"), F.max(C.ID).alias("hi"))
        .select("lo", "hi")
        .distinct()
        .withColumn("_confirmed", F.lit(True))
    )
    keyed = matched_df.withColumn(
        "lo", F.least("ID_1", "ID_2")
    ).withColumn("hi", F.greatest("ID_1", "ID_2"))
    promoted = keyed.join(confirmed, ["lo", "hi"], "left").withColumn(
        C.DUPLICATE_LABEL,
        F.when(F.col("_confirmed"), C.DUPLICATE).otherwise(
            F.col(C.DUPLICATE_LABEL)
        ),
    )
    return promoted.filter(F.col(C.DUPLICATE_LABEL) != C.MAYBE).select(
        *matched_df.columns
    )
