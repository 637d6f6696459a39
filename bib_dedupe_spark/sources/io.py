"""Record table sources/sinks.

The reference loads CSV via pandas (bib_dedupe.py:208) and writes review
CSVs (maybe_cases.py:133-150). Here records move through Spark readers
with the all-string record contract applied at the edge; parquet is the
default interchange (columnar scans, predicate pushdown), CSV/JSON are
supported for interop.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_records(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Load a records table; all columns arrive as non-null strings."""
    if fmt == "csv":
        df = spark.read.option("header", "true").csv(path)
    elif fmt == "json":
        df = spark.read.json(path)
    elif fmt == "parquet":
        df = spark.read.parquet(path)
    else:
        raise ValueError(f"unsupported record format: {fmt}")
    return df.select(
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("")).alias(c)
            for c in df.columns
        ]
    )


def write_records(
    df: DataFrame, path: str, fmt: str = "parquet", single_file: bool = False
) -> None:
    """Write a records/review table (coalesced when a single CSV is wanted)."""
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "parquet":
        writer.parquet(path)
    else:
        raise ValueError(f"unsupported record format: {fmt}")


def write_records_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 64,
    bucket_col: str = "ID",
) -> None:
    """Persist records hash-bucketed (and sorted) on ``bucket_col``.

    Pre-bucketing co-locates the blocking enrichment joins and the
    merge-stage cluster join: two tables bucketed the same way join with
    NO shuffle exchange on the bucketed key — the 100 TB layout for a
    corpus that is linked repeatedly (e.g. per crawl increment).
    """
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )
