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


def test_compact_corpus_index(spark, tmp_path):
    """Compaction round-trips the key index and buckets it on the
    candidate-join key."""
    import pandas as pd

    from bib_dedupe_spark import prep
    from bib_dedupe_spark.operators.block import block_delta, corpus_key_table
    from bib_dedupe_spark.sources.io import compact_corpus_index
    from bib_dedupe_spark.sources.synthetic import generate

    records, _ = generate(n_base=60, seed=41)
    corpus = prep(spark.createDataFrame(pd.DataFrame(records[:45])))
    batch = prep(
        spark.createDataFrame(pd.DataFrame(records[45:])), validate=False
    )
    keys_path = str(tmp_path / "keys")
    # two "micro-batch" appends
    corpus_key_table(corpus).limit(50).write.mode("append").parquet(keys_path)
    corpus_key_table(corpus).write.mode("append").parquet(keys_path)

    spark.sql("DROP TABLE IF EXISTS corpus_index_test")
    compact_corpus_index(spark, keys_path, "corpus_index_test", buckets=8)
    compacted = spark.table("corpus_index_test")
    raw = spark.read.parquet(keys_path)
    assert compacted.count() == raw.count()

    # delta blocking over the compacted index == over the raw appends
    got = {
        (r["ID_1"], r["ID_2"])
        for r in block_delta(batch, compacted.dropDuplicates(), corpus)
        .select("ID_1", "ID_2").collect()
    }
    want = {
        (r["ID_1"], r["ID_2"])
        for r in block_delta(batch, raw.dropDuplicates(), corpus)
        .select("ID_1", "ID_2").collect()
    }
    assert got == want
    spark.sql("DROP TABLE IF EXISTS corpus_index_test")
