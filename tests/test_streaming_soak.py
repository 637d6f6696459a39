"""Long-horizon streaming soak: many batches with BOTH sink compactions
interleaved mid-stream must be exactly-once — the final edge set equals a
never-compacted run over the identical batch sequence."""
import uuid

from bib_dedupe_spark.sources.webpages import synthesize_webpages
from bib_dedupe_spark.streaming.dedup_stream import link_batch

PAGE_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string,"
    " lang string, search_set string"
)

N_BATCHES = 20
COMPACT_AFTER = (6, 13)  # two stop→compact→resume cycles


def _edge_set(df):
    return sorted(
        (r["ID_1"], r["ID_2"], r["duplicate_label"]) for r in df.collect()
    )


def test_soak_compaction_exactly_once(spark, tmp_path):
    from bib_dedupe_spark.sources.io import (
        compact_corpus_index,
        compact_edges,
        read_all_edges,
    )

    rows, golden = synthesize_webpages(130, dup_rate=0.45, seed=23)
    assert golden
    # deterministic batch split; duplicates land across batch boundaries
    per = len(rows) // N_BATCHES
    batches = [
        rows[i * per : (i + 1) * per if i < N_BATCHES - 1 else len(rows)]
        for i in range(N_BATCHES)
    ]
    assert all(batches)

    def drive(root, compact: bool):
        corpus = f"{root}/corpus"
        edges = f"{root}/edges"
        keys = f"{root}/keys"
        for i, batch_rows in enumerate(batches):
            bdf = spark.createDataFrame(batch_rows, schema=PAGE_SCHEMA)
            link_batch(bdf, i, corpus, edges, keys)
            if compact and i in COMPACT_AFTER:
                sfx = uuid.uuid4().hex[:8]
                compact_corpus_index(
                    spark, keys, f"soak_keys_{sfx}", buckets=4
                )
                compact_edges(spark, edges, f"soak_edges_{sfx}", buckets=4)
        return edges

    edges_plain = drive(str(tmp_path / "plain"), compact=False)
    edges_compacted = drive(str(tmp_path / "compacted"), compact=True)

    plain = _edge_set(
        spark.read.parquet(edges_plain).drop("_batch")
    )
    compacted = _edge_set(read_all_edges(spark, edges_compacted))
    assert plain == compacted
    assert plain  # the soak actually produced edges
    # duplicate edges would mean a compaction double-count
    assert len(compacted) == len(set(compacted))
