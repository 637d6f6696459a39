"""Differential on the WEBTEXT flow: Common-Crawl-style pages extracted
to the record model, then linked by BOTH engines.

Same contract as test_differential, but the corpus is
synthesize_webpages → records_from_webpages — the exact input shape of
BASELINE.json's input_hint (url, warc_ts, html, text, lang) — so the
parity claim covers the web-page identity path (ID := url, host-derived
authors/containers, crawl-year), not just the bibliographic generator.
"""
import sys
from pathlib import Path

import pandas as pd
import pytest

from bib_dedupe_spark import block, cluster, match, prep
from bib_dedupe_spark.sources.webpages import (
    records_from_webpages,
    synthesize_webpages,
)
from tests.reference_cases import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)

_SHIMS = str(Path(__file__).parent / "_shims")


def test_webpages_pipeline_differential(spark):
    for p in (_SHIMS, str(REFERENCE_ROOT)):
        if p not in sys.path:
            sys.path.insert(0, p)
    import bib_dedupe.block as ref_block
    import bib_dedupe.cluster as ref_cluster
    import bib_dedupe.match as ref_match
    import bib_dedupe.prep as ref_prep

    rows, golden = synthesize_webpages(120, dup_rate=0.3, seed=23)
    pages = spark.createDataFrame(
        rows,
        schema=(
            "url string, warc_ts timestamp, html binary, text string,"
            " lang string, search_set string"
        ),
    )
    records_sdf = records_from_webpages(pages)
    records_pd = records_sdf.toPandas()

    # reference run on the SAME extracted records
    prep_ref = ref_prep.prep(records_pd.copy(), cpu=1)
    pairs_ref = ref_block.block(prep_ref.copy(), cpu=1)
    matched_ref = ref_match.match(pairs_ref.copy(), cpu=1)
    comps_ref = ref_cluster.get_connected_components(matched_ref)

    prepared = prep(records_sdf)
    pairs = block(prepared, max_block_size=None)
    matched = match(pairs)
    components = cluster(matched)

    got_pairs = {
        frozenset((r["ID_1"], r["ID_2"]))
        for r in pairs.select("ID_1", "ID_2").collect()
    }
    want_pairs = {
        frozenset((a, b)) for a, b in zip(pairs_ref["ID_1"], pairs_ref["ID_2"])
    }
    assert got_pairs == want_pairs

    got_edges = {
        (frozenset((r["ID_1"], r["ID_2"])), r["duplicate_label"])
        for r in matched.select("ID_1", "ID_2", "duplicate_label").collect()
    }
    want_edges = {
        (frozenset((a, b)), lab)
        for a, b, lab in zip(
            matched_ref["ID_1"],
            matched_ref["ID_2"],
            matched_ref["duplicate_label"],
        )
    }
    assert got_edges == want_edges

    comps = {}
    for r in components.collect():
        comps.setdefault(r["component"], set()).add(r["ID"])
    got_clusters = {frozenset(v) for v in comps.values() if len(v) > 1}
    want_clusters = {frozenset(c) for c in comps_ref if len(c) > 1}
    assert got_clusters == want_clusters

    # sanity: the corpus actually exercises linkage
    assert want_clusters and golden
