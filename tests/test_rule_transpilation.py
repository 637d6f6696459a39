"""Per-rule transpilation check: every duplicate/veto condition selects
the SAME rows under Spark SQL as the reference's pandas query string,
evaluated over one scored pair table from the messy corpus.

This pins the rule-by-rule SQL translation (parenthesization, string
semantics, NULL handling) independently of the end-to-end match parity.
"""
import sys
from pathlib import Path

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bib_dedupe_spark import block, prep, rules
from bib_dedupe_spark.operators.sim import score
from bib_dedupe_spark.sources.synthetic import generate
from tests.reference_cases import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)

_SHIMS = str(Path(__file__).parent / "_shims")


@pytest.fixture(scope="module")
def scored_tables(spark):
    """(spark scored DF with row key, pandas twin with reference dtypes)."""
    records, _ = generate(n_base=150, seed=31, messy=True)
    prepared = prep(spark.createDataFrame(pd.DataFrame(records)))
    scored = score(block(prepared, max_block_size=None)).persist()

    pdf = scored.toPandas()
    # reference dtype contract (match.py:160-165): sims float, rest str
    from bib_dedupe_spark import constants as C

    for col in C.SIM_FIELDS_FLOAT:
        pdf[col] = pdf[col].astype(float)
    for col in set(pdf.columns) - set(C.SIM_FIELDS_FLOAT):
        pdf[col] = pdf[col].astype(str)
    return scored, pdf


def _reference_rules():
    for p in (_SHIMS, str(REFERENCE_ROOT)):
        if p not in sys.path:
            sys.path.insert(0, p)
    import bib_dedupe.match_conditions as mc

    return mc.duplicate_conditions, mc.non_duplicate_conditions


def _pair_keys(df) -> set:
    return set(zip(df["ID_1"], df["ID_2"]))


@pytest.mark.parametrize("idx", range(26))
def test_duplicate_rule_transpiles(scored_tables, idx):
    scored, pdf = scored_tables
    ref_dup, _ = _reference_rules()
    want = _pair_keys(pdf.query(ref_dup[idx], engine="python"))
    got_rows = (
        scored.filter(F.expr(rules.DUPLICATE_CONDITIONS[idx]))
        .select("ID_1", "ID_2")
        .collect()
    )
    got = {(r["ID_1"], r["ID_2"]) for r in got_rows}
    assert got == want, f"duplicate rule {idx} row-set mismatch"


@pytest.mark.parametrize("idx", range(8))
def test_veto_rule_transpiles(scored_tables, idx):
    scored, pdf = scored_tables
    _, ref_veto = _reference_rules()
    want = _pair_keys(pdf.query(ref_veto[idx], engine="python"))
    got_rows = (
        scored.filter(F.expr(rules.NON_DUPLICATE_CONDITIONS[idx]))
        .select("ID_1", "ID_2")
        .collect()
    )
    got = {(r["ID_1"], r["ID_2"]) for r in got_rows}
    assert got == want, f"veto rule {idx} row-set mismatch"
