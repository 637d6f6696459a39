"""Differential test on a MESSY corpus + merge-stage parity.

Real-world formatting noise (semicolon authors, resolver DOIs,
parenthesized volumes, lettered pages, ISO-date years, HTML/withdrawn
titles, copyright-tailed abstracts) flows through both pipelines; every
stage including the final merge/survivorship must agree with the
reference exactly.
"""
import sys
from pathlib import Path

import pandas as pd
import pytest

from bib_dedupe_spark import block, cluster, match, merge, prep
from bib_dedupe_spark.sources.synthetic import generate
from tests.reference_cases import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)

_SHIMS = str(Path(__file__).parent / "_shims")


@pytest.fixture(scope="module")
def ref():
    for p in (_SHIMS, str(REFERENCE_ROOT)):
        if p not in sys.path:
            sys.path.insert(0, p)
    import bib_dedupe.block as ref_block
    import bib_dedupe.cluster as ref_cluster
    import bib_dedupe.match as ref_match
    import bib_dedupe.merge as ref_merge
    import bib_dedupe.prep as ref_prep

    return ref_prep, ref_block, ref_match, ref_cluster, ref_merge


@pytest.fixture(scope="module")
def corpus():
    records, golden = generate(n_base=220, seed=23, messy=True)
    return records, golden


def test_messy_pipeline_and_merge_parity(spark, ref, corpus):
    ref_prep, ref_block, ref_match, ref_cluster, ref_merge = ref
    records, _ = corpus
    records_pd = pd.DataFrame(records)

    # ---- reference
    prep_ref = ref_prep.prep(records_pd.copy(), cpu=1)
    pairs_ref = ref_block.block(prep_ref.copy(), cpu=1)
    matched_ref = ref_match.match(pairs_ref.copy(), cpu=1)
    clusters_ref = ref_cluster.get_connected_components(matched_ref)
    merged_ref = ref_merge.merge(
        records_pd.copy(), duplicate_id_sets=clusters_ref
    )

    # ---- spark
    records_df = spark.createDataFrame(records_pd)
    prepared = prep(records_df)
    pairs = block(prepared, max_block_size=None)
    matched = match(pairs)
    components = cluster(matched)
    merged = merge(records_df, components)

    # stage parity: prep (field-exact)
    got_prep = prepared.toPandas().sort_values("ID").reset_index(drop=True)
    want_prep = prep_ref.sort_values("ID").reset_index(drop=True)
    for col in want_prep.columns:
        want = ["" if pd.isna(v) else str(v) for v in want_prep[col]]
        got = ["" if pd.isna(v) else str(v) for v in got_prep[col]]
        assert got == want, f"prep column mismatch on messy corpus: {col}"

    # matched-edge parity
    got_edges = {
        (frozenset((r.ID_1, r.ID_2)), r.duplicate_label)
        for r in matched.toPandas().itertuples()
    }
    want_edges = {
        (frozenset((r.ID_1, r.ID_2)), r.duplicate_label)
        for r in matched_ref.itertuples()
    }
    assert got_edges == want_edges

    # cluster parity
    comp_pd = components.toPandas()
    got_clusters = {
        frozenset(g["ID"]) for _, g in comp_pd.groupby("component")
    }
    assert got_clusters == {frozenset(c) for c in clusters_ref}

    # merge parity: same surviving rows, same merged field values
    got_merged = merged.toPandas().sort_values("ID").reset_index(drop=True)
    want_merged = merged_ref.sort_values("ID").reset_index(drop=True)
    assert list(got_merged["ID"]) == list(want_merged["ID"])
    for col in ("title", "author", "year", "journal", "pages", "origin"):
        if col not in want_merged.columns:
            continue
        want = ["" if pd.isna(v) else str(v) for v in want_merged[col]]
        got = ["" if pd.isna(v) else str(v) for v in got_merged[col]]
        assert got == want, f"merge column mismatch: {col}"
