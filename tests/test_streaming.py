"""Structured Streaming dedup tests (file source, availableNow trigger)."""
import pandas as pd

from bib_dedupe_spark.sources.webpages import synthesize_webpages
from bib_dedupe_spark.streaming.dedup_stream import (
    run_incremental_linkage,
    stream_exact_dedup,
)

PAGE_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string,"
    " lang string, search_set string"
)


def _write_pages(spark, rows, path):
    spark.createDataFrame(rows, schema=PAGE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_stream_exact_dedup(spark, tmp_path):
    src = str(tmp_path / "pages")
    rows, _ = synthesize_webpages(20, dup_rate=0.0, seed=3)
    # one exact re-crawl: same text, later capture
    recrawl = dict(rows[0])
    recrawl["url"] = rows[0]["url"] + "?rc"
    _write_pages(spark, rows + [recrawl], src)

    stream = spark.readStream.schema(PAGE_SCHEMA).parquet(src)
    deduped = stream_exact_dedup(stream, watermark="10 minutes")
    query = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    out = spark.sql("select * from dedup_stream_test").collect()
    # 21 inputs, one exact duplicate text suppressed
    assert len(out) == 20
    assert len({r["fingerprint"] for r in out}) == 20


def test_incremental_linkage(spark, tmp_path):
    src = str(tmp_path / "pages")
    corpus = str(tmp_path / "corpus")
    edges = str(tmp_path / "edges")

    rows, golden = synthesize_webpages(25, dup_rate=0.4, seed=8)
    assert golden
    # batch 1: originals only; batch 2: the re-crawls
    originals = [r for r in rows if "?crawl=" not in r["url"]]
    recrawls = [r for r in rows if "?crawl=" in r["url"]]
    _write_pages(spark, originals, src)

    stream = spark.readStream.schema(PAGE_SCHEMA).parquet(src)
    q = run_incremental_linkage(
        stream, corpus, edges, str(tmp_path / "ckpt1"), max_block_size=None
    ).start()
    q.awaitTermination(240)

    _write_pages(spark, recrawls, src)
    stream = spark.readStream.schema(PAGE_SCHEMA).parquet(src)
    q = run_incremental_linkage(
        stream, corpus, edges, str(tmp_path / "ckpt1"), max_block_size=None
    ).start()
    q.awaitTermination(240)

    found = {
        frozenset((r["ID_1"], r["ID_2"]))
        for r in spark.read.parquet(edges)
        .filter("duplicate_label = 'duplicate'")
        .collect()
    }
    assert golden <= found
    # corpus accumulated every page exactly once
    assert spark.read.parquet(corpus).count() == len(rows)


def test_stateful_first_seen(spark, tmp_path):
    from bib_dedupe_spark.streaming.dedup_stream import stream_stateful_first_seen

    src = str(tmp_path / "pages_state")
    rows, _ = synthesize_webpages(12, dup_rate=0.0, seed=5)
    dup = dict(rows[0])
    dup["url"] = rows[0]["url"] + "?again"
    _write_pages(spark, rows + [dup], src)

    sink = str(tmp_path / "first_seen_out")

    def run_once():
        stream = spark.readStream.schema(PAGE_SCHEMA).parquet(src)
        dedup = stream_stateful_first_seen(stream, key_col="lang")
        q = (
            dedup.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", str(tmp_path / "ckpt_state"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    first = spark.read.parquet(sink).collect()
    assert len(first) == 12  # duplicate content suppressed
    assert len({r["fingerprint"] for r in first}) == 12

    # second batch: all re-crawls of known content → nothing new emitted
    recrawls = []
    for r in rows[:5]:
        rc = dict(r)
        rc["url"] = r["url"] + "?rc2"
        recrawls.append(rc)
    _write_pages(spark, recrawls, src)
    run_once()  # restart from the same checkpoint: state is durable
    second = spark.read.parquet(sink).collect()
    assert len(second) == 12


def test_incremental_linkage_recrawl_keeps_corpus_ids_unique(spark, tmp_path):
    """A re-crawled url (same ID) must not duplicate corpus rows: first
    capture wins, within a batch (earliest warc_ts) and across batches."""
    import datetime

    src = str(tmp_path / "pages_rc")
    corpus = str(tmp_path / "corpus_rc")
    edges = str(tmp_path / "edges_rc")
    rows, _ = synthesize_webpages(10, dup_rate=0.0, seed=11)
    # same-batch re-crawl: identical url, later ts, different text
    rc0 = dict(rows[0])
    rc0["warc_ts"] = rows[0]["warc_ts"] + datetime.timedelta(days=1)
    rc0["text"] = "changed " + (rows[0]["text"] or "")
    _write_pages(spark, rows + [rc0], src)

    stream = spark.readStream.schema(PAGE_SCHEMA).parquet(src)
    q = run_incremental_linkage(
        stream, corpus, edges, str(tmp_path / "ckpt_rc"), max_block_size=None
    ).start()
    q.awaitTermination(240)

    # cross-batch re-crawl of a different url
    rc1 = dict(rows[1])
    rc1["warc_ts"] = rows[1]["warc_ts"] + datetime.timedelta(days=2)
    _write_pages(spark, [rc1], src)
    stream = spark.readStream.schema(PAGE_SCHEMA).parquet(src)
    q = run_incremental_linkage(
        stream, corpus, edges, str(tmp_path / "ckpt_rc"), max_block_size=None
    ).start()
    q.awaitTermination(240)

    got = spark.read.parquet(corpus)
    ids = [r["ID"] for r in got.select("ID").collect()]
    assert len(ids) == len(set(ids)) == 10  # one row per url, ever
    # first capture won: the original text's title survived for rows[0]
    first_title = (rows[0]["text"] or "").split(".")[0]
    kept = {r["ID"]: r["title"] for r in got.select("ID", "title").collect()}
    assert not kept[rows[0]["url"]].startswith("changed")


def test_link_batch_retry_is_idempotent(spark, tmp_path):
    """foreachBatch retries re-run the same batch_id: link_batch must
    replace its own partial output, never double-append."""
    from bib_dedupe_spark.streaming.dedup_stream import link_batch

    corpus = str(tmp_path / "c")
    edges = str(tmp_path / "e")
    keys = str(tmp_path / "k")
    rows, _ = synthesize_webpages(14, dup_rate=0.4, seed=19)
    half = len(rows) // 2
    b0 = spark.createDataFrame(rows[:half], schema=PAGE_SCHEMA)
    b1 = spark.createDataFrame(rows[half:], schema=PAGE_SCHEMA)

    link_batch(b0, 0, corpus, edges, keys)
    link_batch(b1, 1, corpus, edges, keys)
    snapshot_corpus = sorted(
        r["ID"] for r in spark.read.parquet(corpus).collect()
    )
    snapshot_edges = sorted(
        (r["ID_1"], r["ID_2"], r["duplicate_label"])
        for r in spark.read.parquet(edges).collect()
    )

    # RETRY of batch 1 (same data, same id) — nothing may change
    link_batch(b1, 1, corpus, edges, keys)
    assert sorted(
        r["ID"] for r in spark.read.parquet(corpus).collect()
    ) == snapshot_corpus
    assert sorted(
        (r["ID_1"], r["ID_2"], r["duplicate_label"])
        for r in spark.read.parquet(edges).collect()
    ) == snapshot_edges
    # key index also stable
    k = spark.read.parquet(keys)
    assert k.count() == k.dropDuplicates().count()


def test_stream_host_rates(spark, tmp_path):
    import datetime

    from bib_dedupe_spark.streaming.dedup_stream import stream_host_rates

    src = str(tmp_path / "pages_rates")
    base = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    for i in range(12):
        rows.append({
            "url": f"https://host{'a' if i % 3 else 'b'}.org/p{i}",
            "warc_ts": base + datetime.timedelta(minutes=i),
            "html": None, "text": f"t{i}", "lang": "en", "search_set": "",
        })
    # a late-but-within-watermark event for the first window
    rows.append({
        "url": "https://hostb.org/late",
        "warc_ts": base + datetime.timedelta(minutes=1),
        "html": None, "text": "late", "lang": "en", "search_set": "",
    })
    _write_pages(spark, rows, src)

    stream = spark.readStream.schema(PAGE_SCHEMA).parquet(src)
    q = (
        stream_host_rates(stream, window="10 minutes", watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("host_rates_test")
        .outputMode("complete")  # availableNow drain: append would emit
        # only watermark-closed windows (none in a single batch)
        .option("checkpointLocation", str(tmp_path / "ckpt_rates"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["host"], r["window"]["start"].minute): r["n_pages"]
        for r in spark.sql("select * from host_rates_test").collect()
    }
    # window 12:00-12:10: hosta minutes 1,2,4,5,7,8 = 6; hostb 0,3,6,9 = 4+late
    assert got[("hosta.org", 0)] == 6
    assert got[("hostb.org", 0)] == 5
    assert got[("hosta.org", 10)] == 2  # minutes 10, 11


def test_read_schema_cache(spark, tmp_path):
    """Second read of a micro-batch sink passes the cached schema (skips
    the per-read inference job) and returns the same schema."""
    from bib_dedupe_spark.streaming import dedup_stream as ds

    path = str(tmp_path / "sink")
    spark.createDataFrame([(1, "a")], ["x", "y"]).write.mode(
        "overwrite"
    ).parquet(f"{path}/_batch=0")

    ds._READ_SCHEMA_CACHE.pop(path, None)
    first = ds._read_parquet_cached_schema(spark, path)
    assert path in ds._READ_SCHEMA_CACHE
    second = ds._read_parquet_cached_schema(spark, path)
    assert second.schema == first.schema
    assert {f.name for f in second.schema} >= {"x", "y", "_batch"}


def test_corpus_is_empty_partition_dirs(spark, tmp_path):
    """Local-fs emptiness check answers from partition directories —
    excluding the current batch's own (possibly partial) partition."""
    from bib_dedupe_spark.streaming.dedup_stream import _corpus_is_empty

    path = str(tmp_path / "corpus")
    df = spark.createDataFrame([("a",)], ["ID"])
    df.write.mode("overwrite").parquet(f"{path}/_batch=0")
    full = spark.read.parquet(path)
    # only batch 0 exists: a RETRY of batch 0 must see an empty corpus
    assert _corpus_is_empty(full, path, batch_id=0)
    assert not _corpus_is_empty(full, path, batch_id=1)
