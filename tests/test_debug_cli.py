"""Component browser / pair explainer (reference `bib-dedupe debug`)."""
import pandas as pd

from bib_dedupe_spark import block, prep
from bib_dedupe_spark.debug import component_summaries, explain_component, explain_pair
from bib_dedupe_spark.operators import sim
from bib_dedupe_spark.operators.cluster import cluster
from bib_dedupe_spark.operators.match import match
from bib_dedupe_spark.sources.synthetic import generate


def test_component_browser_and_explain(spark):
    records, golden = generate(n_base=40, seed=5)
    rdf = spark.createDataFrame(pd.DataFrame(records))
    matched = match(block(prep(rdf), max_block_size=None))
    comps = cluster(matched)

    summary = component_summaries(comps, rdf).collect()
    assert summary, "no multi-member components found"
    top = summary[0]
    assert top["size"] >= 2
    assert sorted(top["members"]) == top["members"]
    assert top["sample_title"]  # representative's title joined in

    detail = explain_component(rdf, top["members"], verbose=False)
    assert detail["members"] == top["members"]
    assert detail["candidate_pairs"], "subset re-match found no pairs"
    any_exp = next(iter(detail["explanations"].values()))
    assert any_exp["verdict"] in ("duplicate", "maybe", "no")
    assert "similarities" in any_exp
    # the re-clustered subset reproduces the component
    assert sorted(sum(detail["clusters"].values(), [])) == top["members"]


def test_explain_pair_not_found(spark):
    records, _ = generate(n_base=10, seed=6)
    rdf = spark.createDataFrame(pd.DataFrame(records))
    scored = sim.score(block(prep(rdf), max_block_size=None))
    out = explain_pair(scored, "nope1", "nope2")
    assert "error" in out
