"""Match stage: scored pairs → labeled duplicate/maybe edge list.

Behavioral spec: /root/reference/bib_dedupe/match.py:86-176. The scored
pair table is persisted once and consumed by two fused Catalyst filters
(the 26-way duplicate disjunction minus the 8-way veto, and the maybe
classifier), then the maybe set is anti-joined against the true set.
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
) -> DataFrame:
    """Score similarities, evaluate the rule set, label edges."""
    scored = sim.score(pairs_df)
    return match_scored(
        scored,
        duplicate_conditions=duplicate_conditions,
        non_duplicate_conditions=non_duplicate_conditions,
        persist=persist,
    )


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
