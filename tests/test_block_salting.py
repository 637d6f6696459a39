"""Hot-key handling in the blocking stage: the salted bucket join must
reproduce EXACTLY the unsalted pair set (full coverage, bounded groups);
the drop strategy must remove only hot-key pairs."""
import pandas as pd
import pytest

from bib_dedupe_spark.operators.block import blocking_key_stats, candidate_pairs
from bib_dedupe_spark.operators.prep import prep


@pytest.fixture(scope="module")
def skewed_prepared(spark):
    # 40 records sharing one author_first+year key (hot), plus distinct tail
    rows = []
    for i in range(40):
        rows.append(
            {
                "ID": f"h{i:03d}",
                "ENTRYTYPE": "article",
                "author": "Hotkey, Anna",
                "title": f"totally distinct title number {i} about topic {i}",
                "journal": f"venue {i}",
                "year": "2020",
                "volume": str(i),
                "number": "",
                "pages": "",
                "abstract": "",
                "doi": "",
            }
        )
    for i in range(10):
        rows.append(
            {
                "ID": f"c{i:03d}",
                "ENTRYTYPE": "article",
                "author": f"Cold{i}, Ben",
                "title": f"cold title {i} something else entirely",
                "journal": "journal of cold",
                "year": str(1990 + i),
                "volume": "1",
                "number": "",
                "pages": "",
                "abstract": "",
                "doi": "",
            }
        )
    return prep(spark.createDataFrame(pd.DataFrame(rows))).persist()


def _pair_set(df):
    return {
        (r["ID_1"], r["ID_2"], r["rule_idx"], r["require_title_overlap"])
        for r in df.collect()
    }


def test_salted_equals_unsalted(skewed_prepared):
    unlimited = _pair_set(candidate_pairs(skewed_prepared, max_block_size=None))
    salted = _pair_set(
        candidate_pairs(
            skewed_prepared, max_block_size=10, hot_key_strategy="salt"
        )
    )
    assert salted == unlimited
    # sanity: the hot key really is above the cap
    stats = blocking_key_stats(skewed_prepared)
    assert stats.filter("group_size > 10").count() > 0


def test_drop_strategy_removes_hot_pairs(skewed_prepared):
    unlimited = _pair_set(candidate_pairs(skewed_prepared, max_block_size=None))
    dropped = _pair_set(
        candidate_pairs(
            skewed_prepared, max_block_size=10, hot_key_strategy="drop"
        )
    )
    assert dropped < unlimited


def test_block_delta_equals_combined_restriction(spark):
    """block_delta(batch, corpus_keys, corpus) must produce exactly the
    pairs of block(corpus ∪ batch) that touch the batch — the delta-index
    path regenerates nothing and misses nothing."""
    import pandas as pd

    from bib_dedupe_spark import block as block_fn
    from bib_dedupe_spark import prep
    from bib_dedupe_spark.operators.block import block_delta, corpus_key_table
    from bib_dedupe_spark.sources.synthetic import generate

    records, _ = generate(n_base=120, seed=31)
    corpus_records = records[:90]
    batch_records = records[90:]
    corpus = prep(spark.createDataFrame(pd.DataFrame(corpus_records)))
    batch = prep(
        spark.createDataFrame(pd.DataFrame(batch_records)), validate=False
    )
    corpus_keys = corpus_key_table(corpus)

    delta = block_delta(batch, corpus_keys, corpus)

    combined = block_fn(
        corpus.unionByName(batch), max_block_size=None
    )
    batch_ids = {r["ID"] for r in batch.select("ID").collect()}
    want = {
        (r["ID_1"], r["ID_2"], r["block_rule"])
        for r in combined.select("ID_1", "ID_2", "block_rule").collect()
        if r["ID_1"] in batch_ids or r["ID_2"] in batch_ids
    }
    got = {
        (r["ID_1"], r["ID_2"], r["block_rule"])
        for r in delta.select("ID_1", "ID_2", "block_rule").collect()
    }
    assert got == want
    assert want, "test corpus produced no batch-touching pairs"


def _hot_corpus(spark, n_hot=30, n_cold=20):
    """Records sharing one giant (author_first, year) key + a cold tail."""
    import pandas as pd

    from bib_dedupe_spark import prep

    rows = []
    for i in range(n_hot):
        rows.append(
            {
                "ID": f"H{i:03d}",
                "ENTRYTYPE": "article",
                "author": "Shared, Sam",
                "title": f"hot record number {i} on subject {i}",
                "journal": f"venue {i}",
                "year": "2021",
                "volume": str(i),
                "number": "",
                "pages": "",
                "abstract": "",
                "doi": "",
            }
        )
    for i in range(n_cold):
        rows.append(
            {
                "ID": f"Z{i:03d}",
                "ENTRYTYPE": "article",
                "author": f"Cold{i}, Casey",
                "title": f"cold record {i} entirely different",
                "journal": "journal of misc",
                "year": str(1990 + i),
                "volume": "1",
                "number": "",
                "pages": "",
                "abstract": "",
                "doi": "",
            }
        )
    return prep(spark.createDataFrame(pd.DataFrame(rows)))


def test_block_delta_hot_key_salt_preserves_pairs(spark):
    """A degenerate key shared corpus-wide: salted delta must reproduce
    the uncapped delta pair set exactly (salting only bounds join
    groups, never changes output)."""
    from bib_dedupe_spark.operators.block import block_delta, corpus_key_table

    prepared = _hot_corpus(spark).persist()
    corpus = prepared.filter("ID < 'H020' OR ID >= 'Z'")
    batch = prepared.filter("ID >= 'H020' AND ID < 'Z'")
    corpus_keys = corpus_key_table(corpus)

    def pairset(df):
        return {
            (r["ID_1"], r["ID_2"], r["block_rule"])
            for r in df.select("ID_1", "ID_2", "block_rule").collect()
        }

    plain = pairset(block_delta(batch, corpus_keys, corpus))
    salted = pairset(
        block_delta(
            batch, corpus_keys, corpus,
            max_block_size=5, hot_key_strategy="salt",
        )
    )
    assert salted == plain and plain


def test_block_delta_hot_key_drop_matches_combined(spark):
    """Drop strategy: delta with combined-membership hot detection ==
    block(corpus ∪ batch, drop) restricted to batch-touching pairs."""
    from bib_dedupe_spark import block as block_fn
    from bib_dedupe_spark.operators.block import block_delta, corpus_key_table

    prepared = _hot_corpus(spark).persist()
    corpus = prepared.filter("ID < 'H020' OR ID >= 'Z'")
    batch = prepared.filter("ID >= 'H020' AND ID < 'Z'")
    batch_ids = {r["ID"] for r in batch.select("ID").collect()}

    delta = block_delta(
        batch, corpus_key_table(corpus), corpus,
        max_block_size=5, hot_key_strategy="drop",
    )
    combined = block_fn(
        corpus.unionByName(batch), max_block_size=5, hot_key_strategy="drop"
    )
    want = {
        (r["ID_1"], r["ID_2"], r["block_rule"])
        for r in combined.select("ID_1", "ID_2", "block_rule").collect()
        if r["ID_1"] in batch_ids or r["ID_2"] in batch_ids
    }
    got = {
        (r["ID_1"], r["ID_2"], r["block_rule"])
        for r in delta.select("ID_1", "ID_2", "block_rule").collect()
    }
    assert got == want
    # and the hot key really was dropped: no H-H pairs from the hot rule
    full = block_fn(corpus.unionByName(batch), max_block_size=None)
    assert full.count() > combined.count()


def test_surrogate_ids_equal_string_path(spark):
    """Surrogate-long blocking must reproduce the string-id pair set and
    attribution exactly, including string-order pair orientation, on a
    url-shaped-id corpus."""
    import pandas as pd

    from bib_dedupe_spark import block as block_fn
    from bib_dedupe_spark import prep

    from bib_dedupe_spark.sources.synthetic import generate

    records, _ = generate(n_base=150, seed=53, messy=True)
    for r in records:
        r["ID"] = f"https://site-{hash(r['ID']) % 97}.org/doc/{r['ID']}"
    prepared = prep(spark.createDataFrame(pd.DataFrame(records))).persist()

    def pairset(df):
        return {
            (r["ID_1"], r["ID_2"], r["block_rule"])
            for r in df.select("ID_1", "ID_2", "block_rule").collect()
        }

    plain = pairset(block_fn(prepared, surrogate_ids=False))
    surr = pairset(block_fn(prepared, surrogate_ids=True))
    assert surr == plain and plain
    # orientation: ID_1 < ID_2 in STRING order on every surrogate pair
    for a, b, _ in surr:
        assert a < b


def test_candidate_pairs_leaves_no_cache_behind(spark, skewed_prepared):
    """The hot-key table is driver-materialized, not persist()ed: streaming
    calls block()/block_delta() per micro-batch, and a lingering cached
    frame per call accumulates forever (ADVICE r3). After a salted run
    with cache=False, no NEW RDD may remain in the block manager."""
    skewed_prepared.count()  # settle the fixture's own persist
    sc = spark.sparkContext
    before = len(sc._jsc.sc().getRDDStorageInfo())
    candidate_pairs(
        skewed_prepared, max_block_size=10, cache=False
    ).count()
    after = len(sc._jsc.sc().getRDDStorageInfo())
    assert after == before


def test_salt_bucket_size_decoupled(skewed_prepared):
    """The salt BUCKET size (execution granularity) is decoupled from
    max_block_size (semantics): any bucket size must reproduce exactly
    the unsalted pair set, and groups between the bucket size and
    max_block_size route through the salted join too."""
    unlimited = _pair_set(candidate_pairs(skewed_prepared, max_block_size=None))
    for bucket in (3, 7, 100):
        salted = _pair_set(
            candidate_pairs(
                skewed_prepared,
                max_block_size=100,  # far above every group: nothing hot
                hot_key_strategy="salt",
                salt_bucket_size=bucket,
            )
        )
        assert salted == unlimited, bucket
    # drop-mode threshold stays max_block_size (NOT the bucket size)
    dropped = _pair_set(
        candidate_pairs(
            skewed_prepared,
            max_block_size=100,
            hot_key_strategy="drop",
        )
    )
    assert dropped == unlimited  # no group exceeds 100 -> nothing dropped


def test_hot_key_collect_bound_fails_loudly(skewed_prepared, monkeypatch):
    """A degenerate corpus with more hot keys than the driver-collect
    bound must raise a clear error instead of materializing an unbounded
    hot table on the driver."""
    import pytest

    from bib_dedupe_spark.operators import block as block_mod

    # the skewed fixture has several hot keys at threshold 10 (the one
    # author_first+year group blocks under multiple rules); squeeze the
    # bound below that count
    monkeypatch.setattr(block_mod, "HOT_KEY_COLLECT_LIMIT", 1)
    with pytest.raises(ValueError, match="hot-key threshold"):
        candidate_pairs(
            skewed_prepared, max_block_size=10, hot_key_strategy="salt"
        ).collect()


def _cross_refine_corpus(spark):
    """Degenerate corpus for the crossing-side word-join refinement:
    one corpus-wide (author_first, year) rto key holding shared-word
    titles (pairs pass the overlap prune), unique-word titles (pairs
    fail it), wildcards (single-word and empty titles — prune-exempt),
    and a same-DOI disjoint-title crossing pair (attribution recovery:
    survives via the DOI rule, attributed to the hot rto rule)."""
    import pandas as pd

    from bib_dedupe_spark import prep

    def rec(i, title, doi=""):
        return {
            "ID": f"X{i:03d}",
            "ENTRYTYPE": "article",
            "author": "Shared, Sam",
            "title": title,
            "journal": f"venue {i}",
            "year": "2021",
            "volume": "",
            "number": "",
            "pages": "",
            "abstract": "",
            "doi": doi,
        }

    rows = []
    for i in range(8):
        rows.append(rec(i, f"common theme heat mice cohort {i}"))
    for i in range(8, 72):
        rows.append(rec(i, f"uq{i}a uq{i}b uq{i}c uq{i}d uq{i}e"))
    rows.append(rec(72, "singleword"))
    rows.append(rec(73, ""))
    rows.append(rec(74, "alpha beta gamma delta", doi="10.1/same"))
    rows.append(rec(75, "epsilon zeta eta theta", doi="10.1/same"))
    return prep(spark.createDataFrame(pd.DataFrame(rows)))


def test_block_delta_crossing_refinement_matches_combined(spark):
    """Crossing-side refinement (forced via crossing_refine_min_pairs=0)
    must equal both the unrefined salted delta and block(corpus ∪ batch)
    restricted to batch-touching pairs."""
    from bib_dedupe_spark import block as block_fn
    from bib_dedupe_spark.operators.block import block_delta, corpus_key_table

    prepared = _cross_refine_corpus(spark).persist()
    # parity split: both sides hold shared-word, unique-word and special
    # rows (X072 wildcard → corpus, X073 empty title → batch, the
    # same-DOI pair X074/X075 crosses)
    corpus = prepared.filter("CAST(substring(ID, 2, 6) AS INT) % 2 = 0")
    batch = prepared.filter("CAST(substring(ID, 2, 6) AS INT) % 2 = 1")
    corpus_keys = corpus_key_table(corpus)
    batch_ids = {r["ID"] for r in batch.select("ID").collect()}

    def pairset(df):
        return {
            (r["ID_1"], r["ID_2"], r["block_rule"])
            for r in df.select("ID_1", "ID_2", "block_rule").collect()
        }

    from bib_dedupe_spark.operators import block as block_mod

    outcome = []
    orig = block_mod._refined_crossing_pairs

    def spy(*a, **k):
        res = orig(*a, **k)
        outcome.append(res is not None)
        return res

    block_mod._refined_crossing_pairs = spy
    try:
        refined = pairset(
            block_delta(
                batch, corpus_keys, corpus,
                max_block_size=5, hot_key_strategy="salt",
                crossing_refine_min_pairs=0,
            )
        )
    finally:
        block_mod._refined_crossing_pairs = orig
    assert outcome == [True], (
        "crossing refinement was not engaged (router sent every key "
        "back to the fan-out join) — the differential no longer pins "
        "the word-join generator"
    )
    plain = pairset(
        block_delta(
            batch, corpus_keys, corpus,
            max_block_size=5, hot_key_strategy="salt",
            refine_hot_keys=False,
        )
    )
    combined = block_fn(corpus.unionByName(batch), max_block_size=None)
    want = {
        (r["ID_1"], r["ID_2"], r["block_rule"])
        for r in combined.select("ID_1", "ID_2", "block_rule").collect()
        if r["ID_1"] in batch_ids or r["ID_2"] in batch_ids
    }
    prepared.unpersist()
    assert refined == plain == want
    assert want, "crossing-refinement corpus produced no pairs"
    # the recovery case is actually present: the same-DOI crossing pair
    # is attributed to an rto rule despite failing the overlap prune
    doi_pair = [p for p in want if {p[0], p[1]} == {"X074", "X075"}]
    assert doi_pair, "same-DOI crossing pair missing"
