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
