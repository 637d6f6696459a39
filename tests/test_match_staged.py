"""Staged (lazy) similarity scoring: parity + the invariants it rests on.

The staged match path (operators/match.py:match_staged) decides most
pairs from cheap sims using rule BOUNDS with author/abstract pinned to
their extremes. That is sound only while:
  1. every author/abstract SIM atom in the duplicate + maybe rules is
     monotone non-decreasing and appears in a NOT-free context, and
  2. no veto condition reads the author/abstract SIM columns.
Both are pinned structurally here, and the end-to-end edge parity
(staged vs full scoring) is pinned on a messy corpus. The differential
tests (test_differential*.py) additionally pin the staged path against
the reference implementation.
"""
import re

import pandas as pd
import pytest

from bib_dedupe_spark import block, prep, rules
from bib_dedupe_spark.operators import sim
from bib_dedupe_spark.operators.match import match, match_scored, match_staged
from bib_dedupe_spark.sources.synthetic import generate


def _edges(df):
    return {
        (frozenset((r.ID_1, r.ID_2)), r.duplicate_label)
        for r in df.toPandas().itertuples()
    }


@pytest.fixture(scope="module")
def pairs(spark):
    records, _ = generate(n_base=200, seed=31, messy=True)
    prepared = prep(spark.createDataFrame(pd.DataFrame(records)))
    return block(prepared, max_block_size=None).persist()


def test_staged_matches_full_scoring(spark, pairs):
    full = match_scored(sim.score(pairs), persist=False)
    staged = match_staged(pairs)
    assert _edges(staged) == _edges(full)


def test_match_default_routes_staged(spark, pairs):
    # match() with the default rule set must give identical edges either way
    assert _edges(match(pairs)) == _edges(match(pairs, staged=False))


def test_staged_skips_most_expensive_pairs(spark, pairs):
    from bib_dedupe_spark.operators.match import staged_decision_stats

    stats = staged_decision_stats(pairs)
    assert stats["total"] > 0
    # the whole point: the expensive kernels run on a small remainder
    assert stats["undecided"] / stats["total"] < 0.35, stats
    assert (
        stats["certain_dup"]
        + stats["certain_maybe"]
        + stats["decided_drop"]
        + stats["undecided"]
        == stats["total"]
    )


def test_staged_plan_shape(spark, pairs):
    """Pin the staged plan's architecture: exactly TWO Arrow boundaries
    (cheap kernels, gated expensive kernels), one in-memory barrier, and
    no giant-tree duplication signatures (the optimized plan stays small
    enough to stringify quickly — the CollapseProject blowups of the
    design iterations produced multi-second plan dumps)."""
    import time

    out = match_staged(pairs)
    t0 = time.time()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert time.time() - t0 < 10
    assert "InMemoryTableScan" in plan
    # ABOVE the barrier: exactly one Arrow boundary (the gated expensive
    # kernels); the cheap-kernel boundary lives inside the cached subtree
    active = plan[: plan.index("InMemoryTableScan")]
    assert active.count("ArrowEvalPython") == 1, active[:800]
    # the heavy raw columns must not be cached (slim barrier); the scan's
    # column list is elided ("... N more fields"), so check the full
    # cached-relation output instead
    scan = plan[plan.index("InMemoryTableScan"):]
    first_line = scan[: scan.index("\n")]
    assert "abstract_1" not in first_line and "author_full_1" not in first_line
    # the persisted frame registered by cache_out carries the slim schema
    caches: list = []
    match_staged(pairs, cache_out=caches)
    cols = set(caches[0].columns)
    caches[0].unpersist()
    assert "_exp_in" in cols and "_decision" in cols
    assert not {"abstract_1", "abstract_2", "author_full_1"} & cols
    # keep-list projection: stage-2 label SQL never reads the long
    # title/container strings, so the barrier must not cache them either
    assert not {
        "title_1",
        "title_2",
        "container_title_1",
        "container_title_2",
    } & cols
    # ...but the short raw columns the maybe year-gap guard reads stay
    assert {"year_1", "year_2"} <= cols


# ---- structural invariants the bounds rely on ----------------------------

_UNKNOWN = re.compile(r"\b(author|abstract)\b")


def _not_scopes(sql: str):
    """Yield the parenthesized argument of every NOT(...) in sql."""
    for m in re.finditer(r"\bNOT\s*\(", sql):
        depth, start = 1, m.end()
        i = start
        while depth and i < len(sql):
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        yield sql[start : i - 1]


def test_unknown_sims_never_under_not():
    for cond in rules.DUPLICATE_CONDITIONS + [rules.MAYBE_CONDITION]:
        for scope in _not_scopes(cond):
            assert not _UNKNOWN.search(scope), (
                "author/abstract sim atom inside NOT(...) — the monotone "
                f"bound substitution would be unsound: {scope!r}"
            )


def test_unknown_sim_atoms_are_monotone_increasing():
    atom = re.compile(
        r"\b(?:author|abstract)\b\s*(>=|>|=)\s*(0?\.[0-9]+|1\.0|0\.9[0-9]*)"
    )
    for cond in rules.DUPLICATE_CONDITIONS + [rules.MAYBE_CONDITION]:
        stripped = atom.sub(" TRUE ", cond)
        assert not _UNKNOWN.search(stripped), (
            "author/abstract sim appears in a non `> t` / `= 1.0` form — "
            f"update the staged-match bounds analysis: {stripped!r}"
        )


def test_vetoes_read_no_expensive_sims():
    for cond in rules.NON_DUPLICATE_CONDITIONS:
        assert not rules.references_expensive(cond), cond


def test_substitution_touches_only_bare_tokens():
    sql = (
        "author > 0.7 AND author_1 != '' AND author_full_2 != 'x' "
        "AND abstract = 1.0 AND abstract_1 = abstract_2"
    )
    out = rules.substitute_expensive(sql, 1.0, 0.0)
    assert "author_1" in out and "author_full_2" in out
    assert "abstract_1 = abstract_2" in out
    assert "CAST(1.0 AS DOUBLE) > 0.7" in out
    assert "CAST(0.0 AS DOUBLE) = 1.0" in out


# ---- banded-cutoff plan-build guard ---------------------------------------


def test_validate_abstract_cutoff_accepts_default_rules():
    rules.validate_abstract_cutoff(
        rules.DUPLICATE_CONDITIONS
        + rules.NON_DUPLICATE_CONDITIONS
        + [rules.MAYBE_CONDITION],
        rules.MIN_ABSTRACT_SIM_THRESHOLD,
    )


@pytest.mark.parametrize(
    "bad",
    [
        "abstract > 0.5",
        "abstract >= 0.79",
        "abstract < 0.9",
        "abstract != 0.95",
        "0.5 < abstract",
        "abstract * 2 > 1.9",
    ],
)
def test_validate_abstract_cutoff_rejects(bad):
    with pytest.raises(ValueError, match="abstract"):
        rules.validate_abstract_cutoff([bad], rules.MIN_ABSTRACT_SIM_THRESHOLD)


def test_monotone_validator():
    assert rules.monotone_in_expensive(
        rules.DUPLICATE_CONDITIONS + [rules.MAYBE_CONDITION]
    )
    assert rules.monotone_in_expensive(["author > 0.9 AND title > 0.8"])
    assert rules.monotone_in_expensive(["abstract = 1.0 OR author >= 0.85"])
    # non-monotone / unrecognized forms refuse
    assert not rules.monotone_in_expensive(["author < 0.5"])
    assert not rules.monotone_in_expensive(["abstract = 0.5"])
    assert not rules.monotone_in_expensive(["NOT (author > 0.9)"])
    assert not rules.monotone_in_expensive(["author * 2 > 1.8"])
    assert not rules.monotone_in_expensive(
        ["title > 0.8 AND NOT (x = 1 OR abstract > 0.9)"]
    )


def test_custom_monotone_rules_staged_parity(spark, pairs):
    """A monotone custom rule set is admitted to the staged path and must
    produce exactly the full-scoring edges; a non-monotone one falls back
    (and explicit staged=True for it raises)."""
    custom_dup = [
        "author > 0.9 AND title > 0.9 AND abstract > 0.9",
        rules.DUPLICATE_CONDITIONS[0],
    ]
    staged_edges = _edges(match(pairs, duplicate_conditions=custom_dup))
    full_edges = _edges(
        match(pairs, duplicate_conditions=custom_dup, staged=False)
    )
    assert staged_edges == full_edges

    bad = ["author < 0.5 AND title > 0.9"]
    # falls back silently on the default path...
    out = match(pairs, duplicate_conditions=bad, abstract_cutoff=0.0)
    out.count()
    # ...and refuses an explicit staged request
    with pytest.raises(ValueError, match="monotone"):
        match(
            pairs,
            duplicate_conditions=bad,
            staged=True,
            abstract_cutoff=0.0,
        )


def test_match_rejects_low_custom_abstract_rule(spark, pairs):
    with pytest.raises(ValueError, match="abstract"):
        match(pairs, duplicate_conditions=["abstract > 0.5"])
    # explicit exact scoring opts out of the guard (and must run)
    out = match(
        pairs,
        duplicate_conditions=["title > 0.99 AND abstract > 0.5"],
        abstract_cutoff=0.0,
    )
    out.count()  # plan must execute


# ---- staged barrier drops raw columns: stage-2 SQL must not read them ----


def test_custom_rule_reading_raw_author_falls_back(spark, pairs):
    """A rule monotone in the sims but reading a RAW author column (legal
    on the full path) must not route staged — the barrier drops
    author_full_* before stage 2 resolves the label expression. Auto
    routing falls back to full scoring; explicit staged=True raises."""
    raw_rule = [
        "author > 0.9 AND author_full_1 <> '' AND author_full_2 <> ''"
    ]
    out = match(pairs, duplicate_conditions=raw_rule)
    out.count()  # would AnalysisException on the staged path
    assert _edges(out) == _edges(
        match(pairs, duplicate_conditions=raw_rule, staged=False)
    )
    with pytest.raises(ValueError, match="raw"):
        match(pairs, duplicate_conditions=raw_rule, staged=True)


def test_custom_veto_reading_raw_author_still_staged(spark, pairs):
    """Vetoes may read raw author/abstract columns: _veto is computed
    exactly in stage 1 and CACHED through the barrier, so stage 2 never
    re-reads the raw columns. Such a rule set stays on the staged path
    with edge parity."""
    from bib_dedupe_spark.operators.match import _stage2_reads_dropped_raw

    veto = ["author_full_1 <> author_full_2 AND year_1 <> year_2"]
    assert not _stage2_reads_dropped_raw(None, tuple(veto))
    assert _edges(match(pairs, non_duplicate_conditions=veto)) == _edges(
        match(pairs, non_duplicate_conditions=veto, staged=False)
    )


def test_default_rules_stage2_free_of_dropped_raw():
    """The default rule set's raw author/abstract fragments must all be
    factored into stage-1 piece flags — the staged default path depends
    on it (the barrier drops the raw columns)."""
    from bib_dedupe_spark.operators.match import _stage2_reads_dropped_raw

    assert not _stage2_reads_dropped_raw(None, None)


@pytest.mark.parametrize("at_cutoff", ["abstract >= 0.8", "abstract = 0.8"])
def test_validate_abstract_cutoff_strict_at_boundary(at_cutoff):
    """The kernel is exact only STRICTLY above the cutoff; `>=`/`=` with
    the threshold exactly AT it can flip fire→no-fire and must reject.
    `> cutoff` remains safe."""
    with pytest.raises(ValueError, match="abstract"):
        rules.validate_abstract_cutoff([at_cutoff], 0.8)
    rules.validate_abstract_cutoff(["abstract > 0.8"], 0.8)
