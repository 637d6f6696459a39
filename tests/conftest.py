import os
from pathlib import Path

import pytest

# The engine ships its own starter journal-variants table and never
# defaults to a reference checkout. The differential / golden tests use
# the reference AS THE ORACLE, so the test harness (not the library)
# injects the reference's full variants table to compare like with like.
_REF_VARIANTS = Path("/root/reference/bib_dedupe/journal_variants.csv")
if _REF_VARIANTS.is_file():
    os.environ.setdefault("BIB_DEDUPE_JOURNAL_VARIANTS", str(_REF_VARIANTS))

# tests spin up many short-lived sessions (incl. subprocess tests); skip
# the session-factory warm-up job — suites value startup time, and the
# warm-up's first-query-latency benefit is irrelevant here
os.environ.setdefault("SPARK_GRAFT_WARMUP", "0")


@pytest.fixture(scope="session")
def spark():
    from bib_dedupe_spark.session import get_spark

    session = get_spark(
        app_name="bib-dedupe-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.execution.arrow.maxRecordsPerBatch": "500",
            "spark.driver.memory": "4g",
        },
    )
    yield session
