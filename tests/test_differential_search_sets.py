"""Differential test with populated search_sets.

Same-set pair pruning (block F3) is order-independent and must match the
reference exactly; the clustering search-set constraint is order-
dependent in the reference (DFS visit order), so cluster parity is
asserted only when no constraint binds — matched-edge parity is asserted
unconditionally.
"""
import sys
from pathlib import Path

import pandas as pd
import pytest

from bib_dedupe_spark import block, match, prep
from bib_dedupe_spark.sources.synthetic import generate
from tests.reference_cases import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)

_SHIMS = str(Path(__file__).parent / "_shims")


def test_search_set_pipeline_parity(spark):
    for p in (_SHIMS, str(REFERENCE_ROOT)):
        if p not in sys.path:
            sys.path.insert(0, p)
    import bib_dedupe.block as ref_block
    import bib_dedupe.match as ref_match
    import bib_dedupe.prep as ref_prep

    records, _ = generate(n_base=150, seed=47)
    # assign overlapping search sets: duplicates usually land in
    # different sets (same-set pairs are pruned at blocking)
    for i, rec in enumerate(records):
        rec["search_set"] = f"set{i % 3}"

    records_pd = pd.DataFrame(records)
    prep_ref = ref_prep.prep(records_pd.copy(), cpu=1)
    pairs_ref = ref_block.block(prep_ref.copy(), cpu=1)
    matched_ref = ref_match.match(pairs_ref.copy(), cpu=1)

    prepared = prep(spark.createDataFrame(records_pd))
    pairs = block(prepared, max_block_size=None)
    matched = match(pairs)

    got_pairs = {
        frozenset((r["ID_1"], r["ID_2"]))
        for r in pairs.select("ID_1", "ID_2").collect()
    }
    want_pairs = {
        frozenset((a, b))
        for a, b in zip(pairs_ref["ID_1"], pairs_ref["ID_2"])
    }
    assert got_pairs == want_pairs  # F3 pruning identical

    got_edges = {
        (frozenset((r.ID_1, r.ID_2)), r.duplicate_label)
        for r in matched.toPandas().itertuples()
    }
    want_edges = {
        (frozenset((r.ID_1, r.ID_2)), r.duplicate_label)
        for r in matched_ref.itertuples()
    }
    assert got_edges == want_edges
