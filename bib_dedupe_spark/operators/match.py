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

import re
from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from bib_dedupe_spark import constants as C
from bib_dedupe_spark import rules
from bib_dedupe_spark.operators import sim

EDGE_COLUMNS = ["ID_1", "search_set_1", "search_set_2", "ID_2", C.DUPLICATE_LABEL]

# raw columns whose payload the staged path gates into _exp_in; the
# barrier's keep-list projection (_stage2_keep_columns) never retains
# them, so stage-2 rule SQL must not read them
_DROPPED_RAW_RE = re.compile(
    r"\b(?:author(?:_full)?_[12]|abstract_[12])\b", re.IGNORECASE
)


def _stage2_reads_dropped_raw(
    duplicate_conditions: tuple | None,
    non_duplicate_conditions: tuple | None,
) -> bool:
    """True if the staged stage-2 label SQL would reference a raw column
    the barrier drops.

    The default rule set's raw author/abstract fragments are all factored
    into stage-1 piece flags, but a custom rule like
    ``author > 0.9 AND author_full_1 <> ''`` is monotone in the sims yet
    keeps a raw reference in the rewritten duplicate/maybe SQL — running
    it staged would fail post-barrier with an unresolved column. (Vetoes
    are immune: stage 2 reuses the cached exact ``_veto`` boolean.)
    """
    _, _, dup_rw, _veto_rw, maybe_rw = _staged_plan_sql(
        duplicate_conditions, non_duplicate_conditions
    )
    return bool(_DROPPED_RAW_RE.search(dup_rw + " " + maybe_rw))


def match(
    pairs_df: DataFrame,
    duplicate_conditions: list | None = None,
    non_duplicate_conditions: list | None = None,
    persist: bool = True,
    staged: bool | None = None,
    abstract_cutoff: float | None = None,
    cache_out: list | None = None,
) -> DataFrame:
    """Score similarities, evaluate the rule set, label edges.

    ``staged`` — None (default) uses the lazy cheap-sims-first plan for
    the default rule set and for custom rule lists that are PROVABLY
    monotone in the expensive sims (rules.monotone_in_expensive); other
    custom rules fall back to full scoring.
    ``abstract_cutoff`` — see sim.score; custom rule lists are validated
    against the banded-kernel cutoff at plan-build time and raise with
    guidance if any abstract comparison could be affected.
    ``cache_out`` — collects internally persisted frames for the caller
    to unpersist after consumption (streaming micro-batch hygiene).
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
        # custom rule lists are admitted to the staged path only when the
        # hi/lo bound substitution is provably sound for them: duplicate +
        # maybe predicates monotone non-decreasing in the expensive sims,
        # vetoes not reading them at all. Anything unrecognized falls back
        # to full scoring.
        if custom:
            staged = persist and rules.monotone_in_expensive(
                (duplicate_conditions or rules.DUPLICATE_CONDITIONS)
                + [rules.MAYBE_CONDITION]
            ) and not any(
                rules.references_expensive(v)
                for v in (
                    non_duplicate_conditions or rules.NON_DUPLICATE_CONDITIONS
                )
            ) and not _stage2_reads_dropped_raw(
                tuple(duplicate_conditions) if duplicate_conditions else None,
                tuple(non_duplicate_conditions)
                if non_duplicate_conditions
                else None,
            )
        else:
            staged = persist
    elif staged and custom:
        # explicit staged=True with custom rules: refuse unsound plans
        if not rules.monotone_in_expensive(
            (duplicate_conditions or rules.DUPLICATE_CONDITIONS)
            + [rules.MAYBE_CONDITION]
        ) or any(
            rules.references_expensive(v)
            for v in (
                non_duplicate_conditions or rules.NON_DUPLICATE_CONDITIONS
            )
        ):
            raise ValueError(
                "staged=True requires rules whose author/abstract sim "
                "references are monotone (`> t`, `>= t`, `= 1.0`, no NOT) "
                "and vetoes that do not read those sims; pass staged=False "
                "for full scoring"
            )
        if _stage2_reads_dropped_raw(
            tuple(duplicate_conditions) if duplicate_conditions else None,
            tuple(non_duplicate_conditions)
            if non_duplicate_conditions
            else None,
        ):
            raise ValueError(
                "staged=True: a duplicate/maybe rule reads a raw "
                "author/abstract column (author_1/2, author_full_1/2, "
                "abstract_1/2) that the staged barrier drops; pass "
                "staged=False for full scoring"
            )
    if staged:
        return match_staged(
            pairs_df,
            abstract_cutoff=abstract_cutoff,
            cache_out=cache_out,
            duplicate_conditions=duplicate_conditions,
            non_duplicate_conditions=non_duplicate_conditions,
        )

    scored = sim.score(pairs_df, abstract_cutoff=abstract_cutoff)
    return match_scored(
        scored,
        duplicate_conditions=duplicate_conditions,
        non_duplicate_conditions=non_duplicate_conditions,
        persist=persist,
    )


@lru_cache(maxsize=8)
def _staged_plan_sql(
    duplicate_conditions: tuple | None = None,
    non_duplicate_conditions: tuple | None = None,
):
    """Precomputed SQL for the staged path (pure string work, cached).

    Streaming calls match() once per micro-batch; the substitution +
    piece-rewrite passes are deterministic functions of the rule set
    (default when the tuples are None), so they are built once per
    process per rule set. Callers must have established monotonicity
    (rules.monotone_in_expensive) before requesting a custom plan.
    """
    dup_sql = " OR ".join(duplicate_conditions or rules.DUPLICATE_CONDITIONS)
    veto_fire_sql = " OR ".join(
        non_duplicate_conditions or rules.NON_DUPLICATE_CONDITIONS
    )
    maybe_sql = rules.MAYBE_CONDITION

    pieces, _gates, _rw = rules.factored_rule_plan()
    cheap_pieces = {
        name: sql
        for name, sql in pieces.items()
        if not rules.references_expensive(sql)
    }

    def _rw_pieces(sql: str) -> str:
        for pname, psql in cheap_pieces.items():
            sql = sql.replace(psql, f" ({pname}) ")
        return sql

    bound_cols = {
        "_dup_hi": rules.substitute_expensive(dup_sql, 1.0, 1.0),
        "_dup_lo": rules.substitute_expensive(dup_sql, 0.0, 0.0),
        "_mb_hi": rules.substitute_expensive(maybe_sql, 1.0, 1.0),
        "_mb_lo": rules.substitute_expensive(maybe_sql, 0.0, 0.0),
    }
    bound_cols = {
        k: f"COALESCE(({_rw_pieces(v)}), {'true' if k.endswith('_hi') else 'false'})"
        for k, v in bound_cols.items()
    }
    bound_cols["_veto"] = f"COALESCE(({_rw_pieces(veto_fire_sql)}), true)"
    return (
        cheap_pieces,
        bound_cols,
        _rw_pieces(dup_sql),
        f"COALESCE(({_rw_pieces(veto_fire_sql)}), true)",
        _rw_pieces(maybe_sql),
    )


def _staged_plan_cols(
    duplicate_conditions: tuple | None,
    non_duplicate_conditions: tuple | None,
):
    """Parsed Column objects for the staged plan, memoized per gateway.

    The SQL strings were already lru_cached (_staged_plan_sql), but
    parsing them into JVM expression trees cost ~1 s of driver time per
    call — a per-micro-batch fixed cost in streaming. Unresolved Columns
    are immutable and reusable across DataFrames, so build them once per
    rule set per JVM.
    """
    from bib_dedupe_spark.plancache import cached_fragment

    def _build():
        cheap_pieces, bound_cols, dup_rw, _veto_rw, maybe_rw = (
            _staged_plan_sql(duplicate_conditions, non_duplicate_conditions)
        )
        return (
            {name: F.expr(sql) for name, sql in cheap_pieces.items()},
            {name: F.expr(sql) for name, sql in bound_cols.items()},
            F.expr(dup_rw),
            F.expr(maybe_rw),
        )

    return cached_fragment(
        ("match.staged_cols", duplicate_conditions, non_duplicate_conditions),
        _build,
    )


_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _stage2_keep_columns(
    columns: list,
    duplicate_conditions: tuple | None,
    non_duplicate_conditions: tuple | None,
) -> list:
    """Columns the staged barrier must materialize, in frame order.

    Everything else is dropped BEFORE the persist: the label stage only
    reads the edge columns, the decision/veto flags, the gated expensive
    input struct, and whatever identifiers the rewritten stage-2 SQL
    still references (cheap sims + piece flags + a handful of short raw
    columns like year/pages — never the long title/container strings,
    whose payload lives in the piece flags already). At ~1M pairs this
    roughly halves the barrier's cached bytes, which is the staged
    path's bandwidth-bound term.
    """
    _, _, dup_rw, _veto_rw, maybe_rw = _staged_plan_sql(
        duplicate_conditions, non_duplicate_conditions
    )
    # case-insensitive: Spark resolves identifiers case-insensitively, so
    # a rule spelled 'YEAR_1 = year_2' must keep the year_1 column
    referenced = {
        i.lower() for i in _IDENT_RE.findall(dup_rw + " " + maybe_rw)
    }
    required = set(EDGE_COLUMNS) | {"_decision", "_veto", "_exp_in"}
    return [c for c in columns if c in required or c.lower() in referenced]


def match_staged(
    pairs_df: DataFrame,
    abstract_cutoff: float | None = None,
    cache_out: list | None = None,
    duplicate_conditions: list | None = None,
    non_duplicate_conditions: list | None = None,
) -> DataFrame:
    """Lazy rule evaluation over the DEFAULT rule set — ONE linear plan.

    Per pair: cheap sims, then five bound flags —
      _veto   exact (vetoes read no expensive sim),
      _dup_hi/_dup_lo  rule bounds with author=abstract pinned to 1/0,
      _mb_hi/_mb_lo    maybe bounds likewise.
    Pairs the bounds decide are labeled straight off the flags. Only the
    undecided remainder pays the expensive author/abstract kernels: the
    kernel inputs are GATED (non-undecided rows ship empty strings
    through the Arrow boundary), so both transfer and compute scale with
    the undecided fraction, and the whole match is a single projection
    pipeline — no cache, no join-back, no union; nothing is scanned
    twice. A pair satisfying both duplicate and maybe takes the
    duplicate label (the CASE order), exactly like the exact path's
    anti-join.

    Bound construction: monotone substitution (see rules.py) with the
    repeated raw-column PIECE fragments factored into flag columns so
    Catalyst analyzes a small tree; the NULL discipline mirrors the
    exact path's filter semantics (upper bounds coalesce NULL→true,
    lower bounds NULL→false, _veto NULL→true == filter(NOT fire)
    dropping NULL-fire rows). All of it is precomputed string work —
    see _staged_plan_sql.

    ``cache_out`` — when given, the internally persisted stage-1 frame
    is appended to it; long-running callers (streaming micro-batches)
    MUST unpersist those after consuming the result, or caches
    accumulate per batch.
    """
    cheap_piece_cols, bound_col_cols, dup_rw_col, maybe_rw_col = (
        _staged_plan_cols(
            tuple(duplicate_conditions) if duplicate_conditions else None,
            tuple(non_duplicate_conditions)
            if non_duplicate_conditions
            else None,
        )
    )

    dup_possible = F.col("_dup_hi") & ~F.col("_veto")
    dup_certain = F.col("_dup_lo") & ~F.col("_veto")

    # Ordered decision chain, minimal bound references (each branch
    # assumes the previous ones failed, so 'undecided' simplifies to
    # dup_possible OR _mb_hi):
    decision = (
        F.when(dup_certain, F.lit(C.DUPLICATE))
        .when(~dup_possible & F.col("_mb_lo"), F.lit(C.MAYBE))
        .when(dup_possible | F.col("_mb_hi"), F.lit("undecided"))
        .otherwise(F.lit(""))
    )

    df = sim.score_cheap(pairs_df)
    df = df.withColumns(cheap_piece_cols)
    df = df.withColumns(bound_col_cols)
    df = df.withColumn("_decision", decision)
    # gate the expensive-kernel inputs BEFORE the persist: decided rows
    # store '' in the struct, and the heavy raw author/abstract columns
    # never enter the cache at all — at ~1M pairs this cuts the barrier's
    # I/O ~8x (it was the non-scaling floor of the staged path)
    df = df.withColumn(
        "_exp_in",
        sim.gated_expensive_inputs(F.col("_decision") == "undecided"),
    )
    df = df.select(
        # keep-list projection: only what the post-barrier label stage
        # reads survives into the cache (_veto stays — it is exact in
        # stage 1, so stage 2 reuses the cached boolean instead of
        # re-evaluating the veto SQL against dropped raw columns; the
        # other bound flags and ALL unreferenced raw columns — notably
        # the long title/container strings — are projected away)
        *_stage2_keep_columns(
            df.columns,
            tuple(duplicate_conditions) if duplicate_conditions else None,
            tuple(non_duplicate_conditions)
            if non_duplicate_conditions
            else None,
        )
    )
    # MATERIALIZATION BARRIER — load-bearing, not an optimization knob:
    # PythonUDF is a plain expression, so without this persist
    # CollapseProject inlines the (large) bound trees into every
    # downstream reference — the expensive-stage gate, each label branch —
    # which blows up optimizer time and has OOM'd driver-side plan
    # transforms (cluster's per-iteration checkpoints). With the persist,
    # _decision and the piece flags are physical attributes and every
    # downstream tree is small. The piece flags stay cached (booleans)
    # because the exact stage-2 label below references them.
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    if cache_out is not None:
        cache_out.append(df)

    # expensive sims from the pre-gated struct: decided rows shipped ''
    # and their outputs are never read (the label CASE hits a decided
    # branch first)
    df = sim.score_expensive(
        df,
        abstract_cutoff=abstract_cutoff,
        inputs_struct=F.col("_exp_in"),
    ).drop("_exp_in")

    und = F.col("_decision") == "undecided"
    label = (
        F.when(F.col("_decision") == C.DUPLICATE, F.lit(C.DUPLICATE))
        .when(F.col("_decision") == C.MAYBE, F.lit(C.MAYBE))
        .when(
            und & dup_rw_col & ~F.col("_veto"),
            F.lit(C.DUPLICATE),
        )
        .when(
            und & maybe_rw_col,
            F.lit(C.MAYBE),
        )
    )
    return (
        df.withColumn(C.DUPLICATE_LABEL, label)
        .filter(F.col(C.DUPLICATE_LABEL).isNotNull())
        .select(*EDGE_COLUMNS)
        .dropDuplicates(["ID_1", "ID_2"])
    )


def staged_decision_stats(pairs_df: DataFrame) -> dict:
    """How many pairs the cheap-sim bounds decide, per bucket.

    Observability for the staged plan: one aggregate job over the cheap
    stage-1 frame, no expensive kernels. Keys: total, certain_dup,
    certain_maybe, decided_drop, undecided.
    """
    cheap_pieces, bound_cols, _dup, _veto, _mb = _staged_plan_sql()
    cheap = (
        sim.score_cheap(pairs_df)
        .withColumns({n: F.expr(s) for n, s in cheap_pieces.items()})
        .withColumns({n: F.expr(s) for n, s in bound_cols.items()})
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
