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
