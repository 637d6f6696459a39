"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship bib-dedupe pipeline end-to-end on the
sf0.001 documents table (adapted to the record model). ``queries()`` /
``oracle_sql()`` expose one oracle-checked entry per implemented operator
family from SURVEY.md §2 plus the training-data text/embedding ops; the
Spark implementations and the DuckDB SQL live side-by-side in
``bib_dedupe_spark/harness.py`` with identical column names and value
derivations.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the package importable regardless of how the driver loads this file
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full prep→block→match→cluster→merge over sf0.001."""
    from bib_dedupe_spark import block, cluster, match, merge, prep
    from bib_dedupe_spark.sources.webpages import records_from_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    records = records_from_documents(docs)
    prepared = prep(records)
    pairs = block(prepared)
    matched = match(pairs)
    components = cluster(matched)
    return merge(records, components)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from bib_dedupe_spark.harness import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column names/values)."""
    from bib_dedupe_spark.harness import ORACLES

    return dict(ORACLES)
