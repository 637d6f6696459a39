"""Differential test: Spark engine vs the reference pandas pipeline.

The reference at /root/reference is executed directly (its missing
``rapidfuzz``/``number_parser`` deps are satisfied by shims backed by this
repo's kernels — which are themselves pinned by the reference's own exact
golden values). Both pipelines run on the same deterministic synthetic
corpus; prep output, blocked pair set, matched edge set, and final
clusters must agree.
"""
import sys
from pathlib import Path

import pandas as pd
import pytest

from bib_dedupe_spark import block, cluster, match, prep
from bib_dedupe_spark.sources.synthetic import generate
from tests.reference_cases import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)

_SHIMS = str(Path(__file__).parent / "_shims")


@pytest.fixture(scope="module")
def reference_modules():
    for p in (_SHIMS, str(REFERENCE_ROOT)):
        if p not in sys.path:
            sys.path.insert(0, p)
    import bib_dedupe.block as ref_block
    import bib_dedupe.cluster as ref_cluster
    import bib_dedupe.match as ref_match
    import bib_dedupe.prep as ref_prep

    return ref_prep, ref_block, ref_match, ref_cluster


@pytest.fixture(scope="module")
def corpus():
    records, golden = generate(n_base=150, seed=7)
    return records, golden


@pytest.fixture(scope="module")
def reference_run(reference_modules, corpus):
    ref_prep, ref_block, ref_match, ref_cluster = reference_modules
    records, _ = corpus
    records_df = pd.DataFrame(records)
    prep_df = ref_prep.prep(records_df.copy(), cpu=1)
    pairs_df = ref_block.block(prep_df.copy(), cpu=1)
    matched_df = ref_match.match(pairs_df.copy(), cpu=1)
    components = ref_cluster.get_connected_components(matched_df)
    return prep_df, pairs_df, matched_df, components


@pytest.fixture(scope="module")
def spark_run(spark, corpus):
    records, _ = corpus
    records_df = spark.createDataFrame(pd.DataFrame(records))
    prepared = prep(records_df)
    pairs = block(prepared, max_block_size=None)
    matched = match(pairs)
    components = cluster(matched)
    return (
        prepared.toPandas(),
        pairs.toPandas(),
        matched.toPandas(),
        components.toPandas(),
    )


def test_prep_parity(reference_run, spark_run):
    ref = reference_run[0].sort_values("ID").reset_index(drop=True)
    got = spark_run[0].sort_values("ID").reset_index(drop=True)
    assert list(ref["ID"]) == list(got["ID"])
    for col in ref.columns:
        ref_vals = ["" if pd.isna(v) else str(v) for v in ref[col]]
        got_vals = ["" if pd.isna(v) else str(v) for v in got[col]]
        assert ref_vals == got_vals, f"prep column mismatch: {col}"


def test_block_parity(reference_run, spark_run):
    ref_pairs = {
        frozenset((a, b))
        for a, b in zip(reference_run[1]["ID_1"], reference_run[1]["ID_2"])
    }
    got_pairs = {
        frozenset((a, b))
        for a, b in zip(spark_run[1]["ID_1"], spark_run[1]["ID_2"])
    }
    assert got_pairs == ref_pairs


def test_match_parity(reference_run, spark_run):
    ref_edges = {
        (frozenset((r.ID_1, r.ID_2)), r.duplicate_label)
        for r in reference_run[2].itertuples()
    }
    got_edges = {
        (frozenset((r.ID_1, r.ID_2)), r.duplicate_label)
        for r in spark_run[2].itertuples()
    }
    assert got_edges == ref_edges


def test_cluster_parity(reference_run, spark_run):
    ref_clusters = {frozenset(c) for c in reference_run[3]}
    comp = spark_run[3]
    got_clusters = {
        frozenset(group["ID"])
        for _, group in comp.groupby("component")
    }
    # reference components include singletons only if they appear in edges;
    # ours behave identically (built from the same edge list)
    assert got_clusters == ref_clusters
