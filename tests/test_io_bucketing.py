"""Record IO round-trips + bucketed-layout co-located joins."""
import io as _io
import contextlib

import pytest

from bib_dedupe_spark.sources.io import (
    read_records,
    write_records,
    write_records_bucketed,
)


def test_read_write_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("1", "T", None), ("2", "U", "2001")], ["ID", "title", "year"]
    )
    for fmt in ("parquet", "csv", "json"):
        path = str(tmp_path / f"rt_{fmt}")
        write_records(df, path, fmt=fmt)
        back = read_records(spark, path, fmt=fmt)
        rows = {r["ID"]: r for r in back.collect()}
        assert rows["1"]["year"] == ""  # null → '' at the edge
        assert rows["2"]["year"] == "2001"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS bucketed_records_test")
    df = spark.range(500).selectExpr(
        "cast(id as string) as ID", "concat('t', id) as title"
    )
    write_records_bucketed(df, "bucketed_records_test", buckets=8)

    t1 = spark.table("bucketed_records_test")
    t2 = spark.table("bucketed_records_test")
    joined = t1.join(t2, "ID")

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain()
    plan = buf.getvalue()
    # bucketed-on-key self join: no shuffle exchange required
    assert "Exchange hashpartitioning" not in plan, plan
    assert joined.count() == 500
    spark.sql("DROP TABLE IF EXISTS bucketed_records_test")
