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


def test_min_abstract_sim_threshold_pinned_to_rules():
    """MIN_ABSTRACT_SIM_THRESHOLD must be the smallest similarity
    threshold any rule string applies to the abstract column; if a rule
    edit lowers a threshold, this catches the stale cutoff."""
    import re

    from bib_dedupe_spark import rules

    all_rules = " ".join(
        list(rules.DUPLICATE_CONDITIONS)
        + list(rules.NON_DUPLICATE_CONDITIONS)
        + [rules.MAYBE_CONDITION]
    )
    thresholds = [
        float(m)
        for m in re.findall(r"abstract\s*(?:>|>=)\s*([0-9.]+)", all_rules)
    ]
    equalities = re.findall(r"abstract\s*=\s*1\.0", all_rules)
    assert thresholds, "no abstract similarity thresholds found in rules"
    assert min(thresholds) == rules.MIN_ABSTRACT_SIM_THRESHOLD
    # the only other similarity comparison form is equality at 1.0
    others = re.findall(r"abstract\s*(?:<|<=|=)\s*(?!1\.0)[0-9.]", all_rules)
    assert not others, f"unexpected abstract comparison forms: {others}"
    assert equalities or thresholds


def test_sim_abstract_cutoff_rule_losslessness():
    """Randomized: for every pair, the cutoff value and the exact value
    agree on EVERY rule comparison (v > t for t >= 0.8, v = 1.0)."""
    import random

    from bib_dedupe_spark.kernels.similarity import sim_abstract

    rnd = random.Random(99)
    words = "alpha beta gamma delta eps zeta eta theta".split()
    for _ in range(120):
        n = rnd.randint(5, 80)
        a = " ".join(rnd.choice(words) for _ in range(n))
        if rnd.random() < 0.4:
            b = a[: max(4, int(len(a) * rnd.uniform(0.3, 1.0)))] + " ".join(
                rnd.choice(words) for _ in range(rnd.randint(0, n))
            )
        else:
            b = " ".join(rnd.choice(words) for _ in range(rnd.randint(5, 80)))
        exact = sim_abstract(a, b)
        fast = sim_abstract(a, b, partial_cutoff=80.0)
        assert fast <= exact + 1e-12
        if exact > 0.8:
            assert abs(fast - exact) < 1e-12
        for t in (0.8, 0.9, 0.95):
            assert (fast > t) == (exact > t)
        assert (fast == 1.0) == (exact == 1.0)


def test_factored_rule_plan_substitution_complete():
    """Every gate and piece fragment must disappear from the rewritten
    default predicates (a fragment surviving substitution means the flag
    column went unused and the factoring silently degraded)."""
    from bib_dedupe_spark import rules

    pieces, gates, rewrite = rules.factored_rule_plan()
    dup = rewrite(" OR ".join(rules.DUPLICATE_CONDITIONS))
    veto = rewrite("NOT (" + " OR ".join(rules.NON_DUPLICATE_CONDITIONS) + ")")
    for frag in list(rules._GATE_ATOMS.values()) + list(
        rules._PIECE_ATOMS.values()
    ):
        assert frag not in dup and frag not in veto
    # the gate flags themselves reference piece flags where possible
    assert any("_r_eq_" in sql or "_r_ne_" in sql for sql in gates.values())


def test_factored_match_equals_direct(spark):
    """Factored filter path == direct giant-predicate path, edge for edge."""
    import pandas as pd

    from bib_dedupe_spark import block, prep, rules
    from bib_dedupe_spark.operators.match import match, match_scored
    from bib_dedupe_spark.operators.sim import score
    from bib_dedupe_spark.sources.synthetic import generate

    records, _ = generate(n_base=120, seed=21)
    pairs = block(
        prep(spark.createDataFrame(pd.DataFrame(records))), max_block_size=None
    )
    scored = score(pairs)
    factored = match_scored(scored)  # persist=True -> factored path
    direct = match_scored(
        scored,
        duplicate_conditions=list(rules.DUPLICATE_CONDITIONS),
        non_duplicate_conditions=list(rules.NON_DUPLICATE_CONDITIONS),
        persist=False,
    )
    def edge_set(df):
        return {
            (r["ID_1"], r["ID_2"], r["duplicate_label"])
            for r in df.collect()
        }
    assert edge_set(factored) == edge_set(direct)
    scored.unpersist()
