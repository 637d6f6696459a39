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


def _exchange_count(df) -> int:
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue().count("Exchange hashpartitioning")


def test_delta_candidate_join_bucketed_no_index_exchange(spark, tmp_path):
    """With a non-broadcast batch, the candidate join against the
    compacted (rule_idx, key)-bucketed index must NOT exchange the index
    side — the 10^12-row side of the incremental-linkage join. Pinned by
    comparing Exchange counts against the identical plan over plain
    parquet (one fewer), with auto-broadcast disabled so the join is a
    real shuffle join both times."""
    import pandas as pd

    from bib_dedupe_spark import prep
    from bib_dedupe_spark.operators.block import block_delta, corpus_key_table
    from bib_dedupe_spark.sources.io import compact_corpus_index
    from bib_dedupe_spark.sources.synthetic import generate

    records, _ = generate(n_base=80, seed=43)
    corpus = prep(spark.createDataFrame(pd.DataFrame(records[:60])))
    batch = prep(
        spark.createDataFrame(pd.DataFrame(records[60:])), validate=False
    )
    keys_path = str(tmp_path / "keys")
    corpus_key_table(corpus).write.mode("overwrite").parquet(
        keys_path + "/_batch=0"
    )
    spark.sql("DROP TABLE IF EXISTS corpus_index_bx")
    manifest = compact_corpus_index(
        spark, keys_path, "corpus_index_bx", buckets=8
    )
    assert manifest == {"table": "corpus_index_bx", "max_batch": 0}

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed_plan = block_delta(
            batch,
            spark.table("corpus_index_bx").drop("_batch"),
            corpus,
            broadcast_batch=False,
        )
        plain_plan = block_delta(
            batch,
            spark.read.parquet(keys_path).drop("_batch"),
            corpus,
            broadcast_batch=False,
        )
        n_bucketed = _exchange_count(bucketed_plan)
        n_plain = _exchange_count(plain_plan)
        assert n_bucketed == n_plain - 1, (n_bucketed, n_plain)
        # and the pair sets are identical
        got = {
            (r["ID_1"], r["ID_2"])
            for r in bucketed_plan.select("ID_1", "ID_2").collect()
        }
        want = {
            (r["ID_1"], r["ID_2"])
            for r in plain_plan.select("ID_1", "ID_2").collect()
        }
        assert got == want and got
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS corpus_index_bx")


def test_link_batch_consumes_compaction_manifest(spark, tmp_path):
    """After compact_corpus_index, _resolve_corpus_index returns the
    bucketed table as bulk plus only post-watermark appends, and
    block_delta over (bulk, fresh) equals the plain full-index delta."""
    import pandas as pd

    from bib_dedupe_spark import prep
    from bib_dedupe_spark.operators.block import block_delta, corpus_key_table
    from bib_dedupe_spark.sources.io import compact_corpus_index
    from bib_dedupe_spark.sources.synthetic import generate
    from bib_dedupe_spark.streaming.dedup_stream import _resolve_corpus_index

    records, _ = generate(n_base=90, seed=44)
    c1 = prep(spark.createDataFrame(pd.DataFrame(records[:40])))
    c2 = prep(
        spark.createDataFrame(pd.DataFrame(records[40:70])), validate=False
    )
    batch = prep(
        spark.createDataFrame(pd.DataFrame(records[70:])), validate=False
    )
    keys_path = str(tmp_path / "keys")
    corpus_key_table(c1).write.mode("overwrite").parquet(keys_path + "/_batch=0")

    spark.sql("DROP TABLE IF EXISTS corpus_index_mf")
    compact_corpus_index(spark, keys_path, "corpus_index_mf", buckets=8)
    # a post-compaction append (batch 1)
    corpus_key_table(c2).write.mode("overwrite").parquet(keys_path + "/_batch=1")

    bulk, fresh = _resolve_corpus_index(spark, keys_path, batch_id=2)
    assert fresh is not None
    # fresh holds ONLY the post-watermark append
    assert fresh.select("ID").distinct().count() == c2.select("ID").distinct().count()

    corpus_all = c1.unionByName(c2)
    got = {
        (r["ID_1"], r["ID_2"])
        for r in block_delta(
            batch, bulk.drop("_batch"), corpus_all,
            fresh_corpus_keys=fresh.drop("_batch"),
        ).select("ID_1", "ID_2").collect()
    }
    want = {
        (r["ID_1"], r["ID_2"])
        for r in block_delta(
            batch,
            spark.read.parquet(keys_path).drop("_batch"),
            corpus_all,
        ).select("ID_1", "ID_2").collect()
    }
    assert got == want and got
    spark.sql("DROP TABLE IF EXISTS corpus_index_mf")


def test_compact_edges_roundtrip(spark, tmp_path):
    """Edges compaction: bulk comes from the bucketed table, appends newer
    than the watermark from parquet; the union is exactly every edge."""
    from bib_dedupe_spark.sources.io import compact_edges, read_all_edges

    edges_path = str(tmp_path / "edges")
    rows = lambda b: [  # noqa: E731
        (f"u{b}a", "s1", "s2", f"u{b}b", "duplicate"),
    ]
    cols = ["ID_1", "search_set_1", "search_set_2", "ID_2", "duplicate_label"]
    for b in range(3):
        spark.createDataFrame(rows(b), cols).write.mode("overwrite").parquet(
            f"{edges_path}/_batch={b}"
        )

    # pre-compaction: plain parquet read
    assert read_all_edges(spark, edges_path).count() == 3

    # unique per run: DROP TABLE of a fresh session does not remove an
    # orphaned warehouse location (LOCATION_ALREADY_EXISTS on re-run)
    import uuid

    table = f"edges_compact_{uuid.uuid4().hex[:8]}"
    manifest = compact_edges(spark, edges_path, table, buckets=4)
    assert manifest["max_batch"] == 2

    # append two newer batches AFTER the watermark
    for b in (3, 4):
        spark.createDataFrame(rows(b), cols).write.mode("overwrite").parquet(
            f"{edges_path}/_batch={b}"
        )

    got = read_all_edges(spark, edges_path)
    assert sorted(r["ID_1"] for r in got.collect()) == [
        "u0a", "u1a", "u2a", "u3a", "u4a",
    ]
    assert "_batch" not in got.columns
    # the bulk side really is the bucketed table (few files, no re-read of
    # the 3 compacted partitions)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert table in plan
