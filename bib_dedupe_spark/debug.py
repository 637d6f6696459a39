"""Pair-level rule diagnostics (the reference's `bib-dedupe debug` CLI).

Behavioral spec: /root/reference/bib_dedupe/match.py:49-83 (__print_details)
and debug.py:84-97 — given one candidate pair, show its similarity vector
and exactly which duplicate / veto conditions fired.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bib_dedupe_spark import constants as C
from bib_dedupe_spark import rules


def explain_pair(scored_df: DataFrame, id_1: str, id_2: str) -> dict:
    """Evaluate every rule against one scored pair.

    Returns {"similarities": {...}, "duplicate_conditions_matched": [...],
    "veto_conditions_matched": [...], "verdict": "duplicate"|"maybe"|"no"}.
    """
    pair = scored_df.filter(
        (F.col("ID_1") == id_1) & (F.col("ID_2") == id_2)
    ).persist()
    if pair.limit(1).count() == 0:
        pair.unpersist()
        return {"error": f"pair ({id_1}, {id_2}) not in scored table"}

    sims = pair.select(*C.SIM_FIELDS).first().asDict()

    dup_hits = [
        cond
        for cond in rules.DUPLICATE_CONDITIONS
        if pair.filter(F.expr(cond)).limit(1).count() > 0
    ]
    veto_hits = [
        cond
        for cond in rules.NON_DUPLICATE_CONDITIONS
        if pair.filter(F.expr(cond)).limit(1).count() > 0
    ]
    is_maybe = pair.filter(F.expr(rules.MAYBE_CONDITION)).limit(1).count() > 0
    pair.unpersist()

    if dup_hits and not veto_hits:
        verdict = C.DUPLICATE
    elif is_maybe:
        verdict = C.MAYBE
    else:
        verdict = "no"
    return {
        "similarities": sims,
        "duplicate_conditions_matched": dup_hits,
        "veto_conditions_matched": veto_hits,
        "verdict": verdict,
    }


def component_summaries(
    components_df: DataFrame, records_df: DataFrame, min_size: int = 2
) -> DataFrame:
    """Browsable component list: size + member ids + sample title.

    The distributed analogue of the reference debug CLI's component
    picker (/root/reference/bib_dedupe/debug.py:72-97): instead of a
    driver-side unique() over a CSV, a groupBy summary you can order,
    filter, and page through at any scale.
    """
    sized = (
        components_df.groupBy(C.COMPONENT)
        .agg(
            F.count("*").alias("size"),
            F.sort_array(F.collect_list(C.ID)).alias("members"),
        )
        .filter(F.col("size") >= min_size)
    )
    titles = records_df.select(
        F.col(C.ID).alias(C.COMPONENT), F.col(C.TITLE).alias("sample_title")
    )
    return sized.join(titles, C.COMPONENT, "left").orderBy(
        F.desc("size"), C.COMPONENT
    )


def explain_component(
    records_df: DataFrame, component_ids: list, verbose: bool = True
) -> dict:
    """Re-run prep→block→match on one component's members and explain
    every candidate pair (reference debug.py:84-97 semantics: subset,
    re-match with verbosity, print components)."""
    from bib_dedupe_spark import block, prep
    from bib_dedupe_spark.operators import sim
    from bib_dedupe_spark.operators.cluster import cluster
    from bib_dedupe_spark.operators.match import match_scored

    subset = records_df.filter(F.col(C.ID).isin(list(component_ids)))
    prepared = prep(subset, validate=False)
    pairs = block(prepared, max_block_size=None)
    # debug output is read by humans: request EXACT abstract sims (the
    # pipeline's banded kernel returns lower bounds below the rule cutoff)
    scored = sim.score(pairs, abstract_cutoff=0.0).persist()
    matched = match_scored(scored, persist=False)

    pair_ids = [
        (r["ID_1"], r["ID_2"])
        for r in scored.select("ID_1", "ID_2").collect()
    ]
    explanations = {
        f"{a} | {b}": explain_pair(scored, a, b) for a, b in pair_ids
    }
    comps = {}
    for r in cluster(matched).collect():
        comps.setdefault(r[C.COMPONENT], []).append(r[C.ID])
    scored.unpersist()
    result = {
        "members": sorted(component_ids),
        "candidate_pairs": pair_ids,
        "explanations": explanations,
        "clusters": {k: sorted(v) for k, v in comps.items()},
    }
    if verbose:
        import json

        print(json.dumps(result, indent=1, default=str))
    return result


def run_debug_cli(args, spark) -> None:
    """`python -m bib_dedupe_spark debug` — component browser.

    Non-interactive by default (prints the component table); with
    --component it explains one component; with --interactive it prompts
    for a component id on stdin like the reference CLI.
    """
    from bib_dedupe_spark.sources.io import read_records

    records = read_records(spark, args.records, fmt=args.format)
    if args.pair:
        from bib_dedupe_spark import prep
        from bib_dedupe_spark.operators import sim as sim_op
        from bib_dedupe_spark import block as block_op

        prepared = prep(
            records.filter(F.col(C.ID).isin(list(args.pair))), validate=False
        )
        scored = sim_op.score(
            block_op(prepared, max_block_size=None), abstract_cutoff=0.0
        )
        import json

        print(json.dumps(explain_pair(scored, *args.pair), indent=1, default=str))
        return

    if not args.components:
        raise SystemExit(
            "debug: --components <parquet path> is required unless --pair "
            "ID1 ID2 is given (pair mode explains one candidate pair; "
            "component mode browses the clustered output)"
        )
    components = spark.read.parquet(args.components)
    summary = component_summaries(components, records, min_size=args.min_size)
    rows = summary.limit(args.limit).collect()
    print(f"{'component':<28} {'size':>4}  members")
    for r in rows:
        members = ",".join(r["members"][:6]) + ("…" if r["size"] > 6 else "")
        print(f"{r['component']:<28} {r['size']:>4}  {members}")

    target = args.component
    if target is None and args.interactive:
        target = input("component id to explain (empty to quit): ").strip()
    if target:
        members = next(
            (r["members"] for r in rows if r["component"] == target), None
        )
        if members is None:
            row = (
                summary.filter(F.col(C.COMPONENT) == target).limit(1).collect()
            )
            members = row[0]["members"] if row else None
        if members is None:
            print(f"component {target!r} not found")
            return
        explain_component(records, members)
