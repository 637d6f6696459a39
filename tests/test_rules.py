"""Rule-layer tests: every condition parses under F.expr on the full pair
schema (mirrors /root/reference/tests/conditions_test.py:18-64), and the
builders keep pandas-query semantics."""
import pytest
from pyspark.sql import functions as F

from bib_dedupe_spark import constants as C
from bib_dedupe_spark import rules


@pytest.fixture(scope="module")
def empty_scored(spark):
    cols = []
    for name in C.pair_columns():
        cols.append(f"`{name}` string")
    for name in C.SIM_FIELDS_FLOAT:
        cols.append(f"`{name}` double")
    cols.append(f"`{C.PAGE_RANGES_ADJACENT}` string")
    return spark.createDataFrame([], schema=", ".join(cols))


@pytest.mark.parametrize("idx", range(len(rules.DUPLICATE_CONDITIONS)))
def test_duplicate_condition_parses(empty_scored, idx):
    assert (
        empty_scored.filter(F.expr(rules.DUPLICATE_CONDITIONS[idx])).count()
        == 0
    )


@pytest.mark.parametrize("idx", range(len(rules.NON_DUPLICATE_CONDITIONS)))
def test_veto_condition_parses(empty_scored, idx):
    assert (
        empty_scored.filter(
            F.expr(rules.NON_DUPLICATE_CONDITIONS[idx])
        ).count()
        == 0
    )


def test_maybe_and_combined_predicates_parse(empty_scored):
    assert empty_scored.filter(F.expr(rules.MAYBE_CONDITION)).count() == 0
    assert empty_scored.filter(F.expr(rules.duplicate_predicate())).count() == 0
    assert empty_scored.filter(F.expr(rules.veto_predicate())).count() == 0


def test_rule_count_matches_reference():
    # 26 duplicate conditions, 8 vetoes (match_conditions.py:74-134)
    assert len(rules.DUPLICATE_CONDITIONS) == 26
    assert len(rules.NON_DUPLICATE_CONDITIONS) == 8


def test_builders():
    assert "volume_1 != volume_2" in rules.mismatch("volume")
    assert "(title = 1.0)" in rules.sim_match("title")
    assert "(title > 0.9)" in rules.sim_match("title", threshold=0.9)
    assert "doi_1 = ''" in rules.non_contradicting("doi")
