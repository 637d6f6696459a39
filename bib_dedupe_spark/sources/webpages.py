"""Web-page table adapter: the engine's target-domain front door.

BASELINE.json input_hint: the engine ingests an Iceberg-style table of
Common-Crawl-like web pages ``(url string, warc_ts timestamp, html binary,
text string, lang string)``. This module provides

* :func:`records_from_webpages` — the deterministic field-extraction stage
  mapping that table onto the all-string record model (SURVEY.md §7.2).
  Pure column expressions: the extracted text per url is byte-identical
  across runs and engines.
* :func:`records_from_documents` — same adaptation for the driver's
  ``documents`` test table (doc_id/text/lang/source/n_chars).
* :func:`synthesize_webpages` — deterministic (seeded) generator of a
  web-page table with labeled re-crawl/near-duplicate variants, used by
  tests and benchmarks; no external data.
"""
from __future__ import annotations

import hashlib
import random
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_WORDS = (
    "stream batch table scan filter join merge sort hash key value row "
    "column window group order query data part line customer vector spark "
    "small big fast slow agg the a"
).split()

# widen the vocabulary with deterministic synthetic words so that random
# titles are as mutually dissimilar as real web-page titles (a tiny vocab
# makes unrelated titles exceed fuzzy-similarity thresholds)
_SYLLABLES = (
    "an bel cor dun el fos gar hin ix jor kal lum mir nov op pra qui ros "
    "sul tor un vex wol yar zem bra cli dro fen gli"
).split()
_WORDS = _WORDS + [
    a + b for a in _SYLLABLES for b in _SYLLABLES[:12]
]

_HOSTS = (
    "news.example.org blog.sample.net docs.corpus.io archive.pages.dev "
    "wiki.mirror.co research.site.ai forum.board.me press.daily.fm "
    "shop.items.biz lab.bench.edu"
).split()

_LANGS = ["en", "en", "en", "de", "fr", "es", "zh"]


def records_from_webpages(pages: DataFrame) -> DataFrame:
    """(url, warc_ts, html, text, lang[, search_set]) → record model.

    Deterministic extraction: ID := url; title := first sentence; author /
    container_title := host tokens; year := crawl year; abstract := leading
    text window. All string, ''-missing.
    """
    host = F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1)
    first_sentence = F.element_at(F.split("text", r"\."), 1)
    search_set = (
        F.col("search_set")
        if "search_set" in pages.columns
        else F.lit("")
    )
    return pages.select(
        F.col("url").alias("ID"),
        F.lit("article").alias("ENTRYTYPE"),
        first_sentence.alias("title"),
        F.regexp_replace(host, r"\.", " ").alias("author"),
        F.year("warc_ts").cast("string").alias("year"),
        host.alias("journal"),
        F.lit("").alias("booktitle"),
        F.lit("").alias("series"),
        F.lit("").alias("volume"),
        F.lit("").alias("number"),
        F.lit("").alias("pages"),
        F.substring("text", 1, 400).alias("abstract"),
        F.lit("").alias("doi"),
        search_set.alias("search_set"),
    )


def records_from_documents(docs: DataFrame) -> DataFrame:
    """Driver ``documents`` table → record model (source → search_set)."""
    words = F.split("text", " ")
    return docs.select(
        F.col("doc_id").cast("string").alias("ID"),
        F.lit("article").alias("ENTRYTYPE"),
        F.array_join(F.slice(words, 1, 12), " ").alias("title"),
        F.concat(F.lit("author "), F.col("source")).alias("author"),
        (
            F.lit(1980) + F.pmod(F.col("doc_id"), F.lit(40))
        ).cast("string").alias("year"),
        F.concat(F.lit("journal of "), F.col("lang")).alias("journal"),
        F.lit("").alias("booktitle"),
        F.lit("").alias("series"),
        F.lit("").alias("volume"),
        F.lit("").alias("number"),
        F.lit("").alias("pages"),
        F.substring("text", 1, 300).alias("abstract"),
        F.lit("").alias("doi"),
        F.col("source").alias("search_set"),
    )


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def synthesize_webpages(
    n_base: int,
    dup_rate: float = 0.3,
    seed: int = 42,
) -> tuple:
    """Return (rows: list[dict], golden_pairs: set[frozenset[str]]).

    Each base page may get a re-crawl duplicate: same extracted content
    with crawl-time/url drift and light formatting drift that survives
    extraction equivalence. Deterministic in ``seed``.
    """
    rng = random.Random(seed)
    epoch = datetime(2023, 1, 1)
    rows: list = []
    golden: set = set()

    for i in range(n_base):
        host = rng.choice(_HOSTS)
        lang = rng.choice(_LANGS)
        title = _sentence(rng, rng.randint(6, 10))
        body = ". ".join(_sentence(rng, rng.randint(8, 14)) for _ in range(6))
        text = f"{title}. {body}"
        ts = epoch + timedelta(
            days=rng.randint(0, 365), seconds=rng.randint(0, 86399)
        )
        url = f"https://{host}/p/{hashlib.md5(f'{seed}:{i}'.encode()).hexdigest()[:12]}"
        html = f"<html><body><h1>{title}</h1><p>{body}</p></body></html>"
        rows.append(
            {
                "url": url,
                "warc_ts": ts,
                "html": html.encode("utf-8"),
                "text": text,
                "lang": lang,
                "search_set": "",
            }
        )

        if rng.random() < dup_rate:
            # re-crawl: same page content at a later timestamp, new capture
            dup_url = url + "?crawl=2"
            dup_ts = ts + timedelta(days=rng.randint(1, 30))
            drift = rng.random()
            dup_text = text if drift < 0.5 else text.capitalize()
            rows.append(
                {
                    "url": dup_url,
                    "warc_ts": dup_ts,
                    "html": html.replace("<h1>", "<h1 class=t>").encode(),
                    "text": dup_text,
                    "lang": lang,
                    "search_set": "",
                }
            )
            golden.add(frozenset((url, dup_url)))

    return rows, golden


def webpages_dataframe(
    spark: SparkSession, n_base: int, dup_rate: float = 0.3, seed: int = 42
) -> tuple:
    """Synthesized web-page table as a Spark DataFrame + golden pairs."""
    rows, golden = synthesize_webpages(n_base, dup_rate=dup_rate, seed=seed)
    schema = (
        "url string, warc_ts timestamp, html binary, text string,"
        " lang string, search_set string"
    )
    return spark.createDataFrame(rows, schema=schema), golden
