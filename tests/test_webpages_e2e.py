"""End-to-end over the BASELINE input shape:
(url, warc_ts, html binary, text, lang) web-page table → extraction →
full pipeline → re-crawl duplicates recovered; extraction deterministic
(byte-identical text per url)."""
from bib_dedupe_spark import block, cluster, match, prep
from bib_dedupe_spark.sources.webpages import (
    records_from_webpages,
    webpages_dataframe,
)


def test_extraction_is_deterministic(spark):
    pages, _ = webpages_dataframe(spark, n_base=30, seed=9)
    rec1 = records_from_webpages(pages).orderBy("ID").collect()
    rec2 = records_from_webpages(pages).orderBy("ID").collect()
    assert rec1 == rec2
    byid = {r["ID"]: r for r in rec1}
    for row in pages.collect():
        rec = byid[row["url"]]
        # title is the first sentence of the page text, byte-identical
        assert rec["title"] == row["text"].split(".")[0]
        assert rec["abstract"] == row["text"][:400]


def test_webpage_pipeline_finds_recrawls(spark):
    pages, golden = webpages_dataframe(spark, n_base=60, dup_rate=0.4, seed=4)
    records = records_from_webpages(pages)
    prepared = prep(records)
    pairs = block(prepared, max_block_size=None)
    matched = match(pairs)
    found = {
        frozenset((r["ID_1"], r["ID_2"]))
        for r in matched.filter("duplicate_label = 'duplicate'").collect()
    }
    assert golden, "generator must inject duplicates"
    missing = golden - found
    extra = found - golden
    assert not missing, f"missed re-crawl pairs: {missing}"
    assert not extra, f"false-positive pairs: {extra}"

    components = cluster(matched)
    comp = {r["ID"]: r["component"] for r in components.collect()}
    for pair in golden:
        a, b = sorted(pair)
        assert comp[a] == comp[b]
