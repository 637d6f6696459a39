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
