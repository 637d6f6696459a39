"""Match stage: scored pairs → labeled duplicate/maybe edge list.

Behavioral spec: /root/reference/bib_dedupe/match.py:86-176. The scored
pair table is persisted once and consumed by two fused Catalyst filters
(the 26-way duplicate disjunction minus the 8-way veto, and the maybe
classifier), then the maybe set is anti-joined against the true set.

Staged (lazy) scoring — the default pipeline path: the expensive
author + abstract kernels dominate per-pair cost, but the default rule
set is monotone non-decreasing in both sims (rules.py bounds section),
and every veto reads only raw columns + cheap sims. So match() first
scores the CHEAP sims for every pair, evaluates the rule set twice with
the unknowns pinned to their extremes (author=abstract=0 → lower bound,
=1 → upper bound), and labels immediately every pair whose verdict the
bounds already decide. Only the undecided remainder — typically a few
percent — pays the author/abstract kernels, then goes through the exact
filters. Edge output is bit-identical to full scoring (pinned by
tests/test_match_staged.py differential parity).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from bib_dedupe_spark import constants as C
from bib_dedupe_spark import rules
from bib_dedupe_spark.operators import sim

EDGE_COLUMNS = ["ID_1", "search_set_1", "search_set_2", "ID_2", C.DUPLICATE_LABEL]


def match(
    pairs_df: DataFrame,
    duplicate_conditions: list | None = None,
    non_duplicate_conditions: list | None = None,
    persist: bool = True,
    staged: bool | None = None,
    abstract_cutoff: float | None = None,
) -> DataFrame:
    """Score similarities, evaluate the rule set, label edges.

    ``staged`` — None (default) uses the lazy cheap-sims-first plan for
    the default rule set and falls back to full scoring for custom rule
    lists (whose monotonicity in author/abstract we cannot assume).
    ``abstract_cutoff`` — see sim.score; custom rule lists are validated
    against the banded-kernel cutoff at plan-build time and raise with
    guidance if any abstract comparison could be affected.
    """
    custom = (
        duplicate_conditions is not None or non_duplicate_conditions is not None
    )
    if custom:
        cutoff = (
            sim._ABSTRACT_CUTOFF if abstract_cutoff is None else abstract_cutoff
        )
        if cutoff > 0.0:
            rules.validate_abstract_cutoff(
                (duplicate_conditions or rules.DUPLICATE_CONDITIONS)
                + (non_duplicate_conditions or rules.NON_DUPLICATE_CONDITIONS)
                + [rules.MAYBE_CONDITION],
                cutoff / 100.0,
            )
    if staged is None:
        staged = not custom and persist
    if staged and not custom:
        return match_staged(pairs_df, abstract_cutoff=abstract_cutoff)

    scored = sim.score(pairs_df, abstract_cutoff=abstract_cutoff)
    return match_scored(
        scored,
        duplicate_conditions=duplicate_conditions,
        non_duplicate_conditions=non_duplicate_conditions,
        persist=persist,
    )


def match_staged(
    pairs_df: DataFrame, abstract_cutoff: float | None = None
) -> DataFrame:
    """Lazy two-stage rule evaluation over the DEFAULT rule set.

    Stage 1 (every pair): cheap sims + three flag columns —
      _veto   exact (vetoes read no expensive sim),
      _dup_hi/_dup_lo  rule bounds with author=abstract pinned to 1/0,
      _mb_hi/_mb_lo    maybe bounds likewise.
    Decided labels come straight off the flags; only pairs where the
    bounds disagree are scored with the expensive kernels and re-run
    through the exact filters. The persisted stage-1 frame is slim: the
    pair columns + cheap sims + 5 booleans.
    """
    dup_sql = " OR ".join(rules.DUPLICATE_CONDITIONS)
    veto_fire_sql = " OR ".join(rules.NON_DUPLICATE_CONDITIONS)
    maybe_sql = rules.MAYBE_CONDITION

    # bounds: monotone substitution (see rules.py); factor the repeated
    # raw-column PIECE fragments afterwards so Catalyst analyzes a small
    # tree — fragments containing the substituted tokens simply stay
    # inline and constant-fold. (Gate-level factoring is skipped here:
    # most gates read author and no longer match after substitution.)
    pieces, _gates, _rw = rules.factored_rule_plan()
    # the author/abstract `= 1.0` pieces reference sim columns that don't
    # exist before stage 2 (and can't appear in the substituted bounds)
    pieces = {
        name: sql
        for name, sql in pieces.items()
        if not rules.references_expensive(sql)
    }

    def _rewrite_pieces(sql: str) -> str:
        for pname, psql in pieces.items():
            sql = sql.replace(psql, f" ({pname}) ")
        return sql

    # NULL discipline — mirror the exact path's filter semantics (a NULL
    # predicate drops the row): the upper bounds coalesce NULL→true (can't
    # rule the label out), the lower bounds NULL→false (can't rule it in),
    # and _veto NULL→true matches filter(NOT fire) dropping NULL-fire rows.
    bound_cols = {
        "_dup_hi": rules.substitute_expensive(dup_sql, 1.0, 1.0),
        "_dup_lo": rules.substitute_expensive(dup_sql, 0.0, 0.0),
        "_mb_hi": rules.substitute_expensive(maybe_sql, 1.0, 1.0),
        "_mb_lo": rules.substitute_expensive(maybe_sql, 0.0, 0.0),
    }
    bound_cols = {
        k: f"COALESCE(({_rewrite_pieces(v)}), {'true' if k.endswith('_hi') else 'false'})"
        for k, v in bound_cols.items()
    }
    bound_cols["_veto"] = (
        f"COALESCE(({_rewrite_pieces(veto_fire_sql)}), true)"
    )

    cheap = sim.score_cheap(pairs_df)
    cheap = cheap.withColumns(
        {name: F.expr(sql) for name, sql in pieces.items()}
    )
    cheap = cheap.withColumns(
        {name: F.expr(sql) for name, sql in bound_cols.items()}
    ).drop(*pieces.keys())
    cheap = cheap.persist(StorageLevel.MEMORY_AND_DISK)

    dup_possible = F.col("_dup_hi") & ~F.col("_veto")
    dup_certain = F.col("_dup_lo") & ~F.col("_veto")

    certain_dup = cheap.filter(dup_certain)
    certain_maybe = cheap.filter(
        ~dup_possible & F.col("_mb_lo")
    )
    undecided = cheap.filter(
        (dup_possible & ~dup_certain)
        | (~dup_possible & F.col("_mb_hi") & ~F.col("_mb_lo"))
    )

    # stage 2: expensive sims + exact (unfactored — the remainder is
    # small, the analysis cost is paid once) rules on the undecided pairs
    full = sim.score_expensive(undecided, abstract_cutoff=abstract_cutoff)
    und_dup = full.filter(F.expr(dup_sql)).filter(~F.col("_veto"))
    und_maybe = full.filter(F.expr(maybe_sql))

    def _edges(df: DataFrame, label: str) -> DataFrame:
        return (
            df.dropDuplicates(["ID_1", "ID_2"])
            .withColumn(C.DUPLICATE_LABEL, F.lit(label))
            .select(*EDGE_COLUMNS)
        )

    true_pairs = _edges(certain_dup, C.DUPLICATE).unionByName(
        _edges(und_dup, C.DUPLICATE)
    )
    maybe_pairs = (
        _edges(certain_maybe, C.MAYBE)
        .unionByName(_edges(und_maybe, C.MAYBE))
        .join(
            true_pairs.select("ID_1", "ID_2"),
            ["ID_1", "ID_2"],
            "left_anti",
        )
    )
    return true_pairs.unionByName(maybe_pairs)


def staged_decision_stats(pairs_df: DataFrame) -> dict:
    """How many pairs the cheap-sim bounds decide, per bucket.

    Observability for the staged plan: one aggregate job over the cheap
    stage-1 frame, no expensive kernels. Keys: total, certain_dup,
    certain_maybe, decided_drop, undecided.
    """
    dup_sql = " OR ".join(rules.DUPLICATE_CONDITIONS)
    veto_fire_sql = " OR ".join(rules.NON_DUPLICATE_CONDITIONS)
    maybe_sql = rules.MAYBE_CONDITION
    flags = {
        "_dup_hi": f"COALESCE(({rules.substitute_expensive(dup_sql, 1.0, 1.0)}), true)",
        "_dup_lo": f"COALESCE(({rules.substitute_expensive(dup_sql, 0.0, 0.0)}), false)",
        "_mb_hi": f"COALESCE(({rules.substitute_expensive(maybe_sql, 1.0, 1.0)}), true)",
        "_mb_lo": f"COALESCE(({rules.substitute_expensive(maybe_sql, 0.0, 0.0)}), false)",
        "_veto": f"COALESCE(({veto_fire_sql}), true)",
    }
    cheap = sim.score_cheap(pairs_df).withColumns(
        {name: F.expr(sql) for name, sql in flags.items()}
    )
    dup_possible = F.col("_dup_hi") & ~F.col("_veto")
    dup_certain = F.col("_dup_lo") & ~F.col("_veto")
    row = cheap.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(dup_certain.cast("long")).alias("certain_dup"),
        F.sum((~dup_possible & F.col("_mb_lo")).cast("long")).alias(
            "certain_maybe"
        ),
        F.sum(
            (
                (dup_possible & ~dup_certain)
                | (~dup_possible & F.col("_mb_hi") & ~F.col("_mb_lo"))
            ).cast("long")
        ).alias("undecided"),
        F.sum(
            (~dup_possible & ~F.col("_mb_hi")).cast("long")
        ).alias("decided_drop"),
    ).first()
    return {k: int(row[k] or 0) for k in row.asDict()}


def match_scored(
    scored: DataFrame,
    duplicate_conditions: list | None = None,
    non_duplicate_conditions: list | None = None,
    persist: bool = True,
) -> DataFrame:
    """Rule evaluation over an already-scored pair table."""
    dup_sql = " OR ".join(duplicate_conditions or rules.DUPLICATE_CONDITIONS)
    veto_sql = "NOT (" + " OR ".join(
        non_duplicate_conditions or rules.NON_DUPLICATE_CONDITIONS
    ) + ")"
    maybe_sql = rules.MAYBE_CONDITION

    if persist and duplicate_conditions is None and non_duplicate_conditions is None:
        # default rule set: factor repeated fragments into flag columns so
        # Catalyst analyzes a ~10x smaller filter tree per call (the flags
        # are bit-identical rewrites; custom rule lists keep the direct
        # path since their text is not built from the module fragments).
        # Requires persist: the cached relation materializes the flags as
        # physical attributes — without the cache boundary CollapseProject
        # would inline every flag back into the filters and the optimizer
        # would rebuild (and duplicate) the giant tree.
        pieces, gates, rewrite = rules.factored_rule_plan()
        scored = scored.withColumns(
            {name: F.expr(sql) for name, sql in pieces.items()}
        ).withColumns({name: F.expr(sql) for name, sql in gates.items()})
        dup_sql = rewrite(dup_sql)
        veto_sql = rewrite(veto_sql)
        maybe_sql = rewrite(maybe_sql)

    if persist:
        # both the true-pair and maybe-pair filters consume the scored
        # table; score once (the sim UDF is the expensive stage)
        scored = scored.persist(StorageLevel.MEMORY_AND_DISK)

    true_pairs = (
        scored.filter(F.expr(dup_sql))
        .filter(F.expr(veto_sql))
        .dropDuplicates()
        .withColumn(C.DUPLICATE_LABEL, F.lit(C.DUPLICATE))
        .select(*EDGE_COLUMNS)
    )

    maybe_pairs = (
        scored.filter(F.expr(maybe_sql))
        .dropDuplicates()
        .join(
            true_pairs.select("ID_1", "ID_2"),
            ["ID_1", "ID_2"],
            "left_anti",
        )
        .withColumn(C.DUPLICATE_LABEL, F.lit(C.MAYBE))
        .select(*EDGE_COLUMNS)
    )

    return true_pairs.unionByName(maybe_pairs)
