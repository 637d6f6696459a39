"""Maybe export/import round-trip tests (maybe_cases semantics)."""
from bib_dedupe_spark.operators.maybe import export_maybe, import_maybe


def _matched(spark):
    return spark.createDataFrame(
        [
            ("a", "", "", "b", "duplicate"),
            ("b", "", "", "c", "maybe"),  # cluster rep of b is a
            ("d", "", "", "e", "maybe"),
            ("x", "", "", "y", "duplicate"),
        ],
        ["ID_1", "search_set_1", "search_set_2", "ID_2", "duplicate_label"],
    )


def _records(spark):
    rows = [
        (i, f"author {i}", f"title {i}", "", "2020", "", "", "", "", "")
        for i in ["a", "b", "c", "d", "e", "x", "y"]
    ]
    return spark.createDataFrame(
        rows,
        [
            "ID",
            "author",
            "title",
            "container_title",
            "year",
            "volume",
            "number",
            "pages",
            "doi",
            "abstract",
        ],
    )


def test_export_maybe_remaps_to_cluster_representative(spark):
    export = export_maybe(_matched(spark), _records(spark))
    rows = export.collect()
    # two maybe pairs → four member rows
    assert len(rows) == 4
    clusters = {}
    for r in rows:
        clusters.setdefault(r["cluster_ID"], set()).add(r["ID"])
    # the b-c maybe pair is remapped to (a, c): a is b's duplicate rep
    assert {frozenset(v) for v in clusters.values()} == {
        frozenset(("a", "c")),
        frozenset(("d", "e")),
    }
    assert all(r["duplicate_label"] == "maybe" for r in rows)
    assert all(0.0 <= r["similarity_score"] <= 1.0 for r in rows)


def test_import_maybe_promotes_and_drops(spark):
    matched = _matched(spark)
    export = export_maybe(matched, _records(spark))
    # reviewer confirms only the (d, e) cluster
    reviewed = export.withColumn(
        "duplicate_label",
        (
            export["ID"].isin("d", "e").cast("string")
        ),
    )
    from pyspark.sql import functions as F

    reviewed = export.withColumn(
        "duplicate_label",
        F.when(F.col("ID").isin("d", "e"), "duplicate").otherwise("maybe"),
    )
    updated = import_maybe(matched, reviewed)
    rows = {(r["ID_1"], r["ID_2"]): r["duplicate_label"] for r in updated.collect()}
    assert rows[("a", "b")] == "duplicate"  # untouched
    assert rows[("d", "e")] == "duplicate"  # promoted
    assert ("b", "c") not in rows  # unconfirmed maybe dropped
    assert rows[("x", "y")] == "duplicate"


def test_maybe_csv_rotation_round_trip(spark, tmp_path):
    """Two successive exports must not clobber a reviewer's edits: the
    first (edited) file rotates to a timestamped sibling, and the rotated
    edits still drive import_maybe (maybe_cases.py:133-142 convention)."""
    from datetime import datetime

    from bib_dedupe_spark.operators.maybe import export_maybe, import_maybe
    from bib_dedupe_spark.sources.io import read_maybe_cases, write_maybe_cases

    matched = spark.createDataFrame(
        [
            ("r1", "r2", "maybe"),
            ("r3", "r4", "maybe"),
        ],
        ["ID_1", "ID_2", "duplicate_label"],
    )
    records = spark.createDataFrame(
        [
            ("r1", "smith j", "alpha beta"),
            ("r2", "smith j", "alpha beta gamma"),
            ("r3", "jones k", "delta"),
            ("r4", "brown l", "epsilon"),
        ],
        ["ID", "author", "title"],
    )
    review = export_maybe(matched, records)
    path = str(tmp_path / "maybe_cases.csv")

    rotated = write_maybe_cases(review, path)
    assert rotated is None  # nothing to rotate on first export

    # the reviewer confirms the r1-r2 cluster by editing the file
    import pandas as pd

    edited = pd.read_csv(path)
    mask = edited["ID"].isin(["r1", "r2"])
    edited.loc[mask, "duplicate_label"] = "duplicate"
    edited.to_csv(path, index=False)

    # a second export rotates the edited file instead of clobbering it
    rotated = write_maybe_cases(review, path, now=datetime(2026, 8, 16, 12, 0, 0))
    assert rotated is not None and rotated.endswith("maybe_cases_20260816120000.csv")
    saved = pd.read_csv(rotated)
    assert (saved.loc[saved["ID"].isin(["r1", "r2"]), "duplicate_label"]
            == "duplicate").all()
    fresh = pd.read_csv(path)
    assert (fresh["duplicate_label"] == "maybe").all()

    # the rotated (edited) review still round-trips through import_maybe
    out = import_maybe(matched, read_maybe_cases(spark, rotated))
    labels = {(r["ID_1"], r["ID_2"]): r["duplicate_label"] for r in out.collect()}
    assert labels == {("r1", "r2"): "duplicate"}


def test_human_in_the_loop_end_to_end(spark, tmp_path):
    """Full reviewer story: pipeline -> maybe review csv -> reviewer edit
    -> import -> recluster -> merge. The confirmed maybe pair must end up
    merged; the rejected one must stay separate."""
    import pandas as pd

    from bib_dedupe_spark import block, prep
    from bib_dedupe_spark.operators.cluster import cluster
    from bib_dedupe_spark.operators.match import match
    from bib_dedupe_spark.operators.maybe import export_maybe, import_maybe
    from bib_dedupe_spark.operators.merge import merge
    from bib_dedupe_spark.sources.io import read_maybe_cases, write_maybe_cases
    from bib_dedupe_spark.sources.synthetic import generate

    records, _ = generate(n_base=80, seed=29)
    rdf = spark.createDataFrame(pd.DataFrame(records))
    prepared = prep(rdf)
    matched = match(block(prepared, max_block_size=None)).persist()
    maybes = matched.filter("duplicate_label = 'maybe'")
    if maybes.limit(1).count() == 0:
        import pytest

        pytest.skip("corpus produced no maybe pairs at this seed")

    review = export_maybe(matched, prepared)
    path = str(tmp_path / "maybe_cases.csv")
    write_maybe_cases(review, path)

    # the reviewer confirms exactly one cluster
    edited = pd.read_csv(path)
    first_cluster = edited["cluster_ID"].iloc[0]
    confirmed_ids = set(
        edited.loc[edited["cluster_ID"] == first_cluster, "ID"]
    )
    edited.loc[edited["cluster_ID"] == first_cluster, "duplicate_label"] = (
        "duplicate"
    )
    edited.to_csv(path, index=False)

    updated = import_maybe(matched, read_maybe_cases(spark, path))
    assert updated.filter("duplicate_label = 'maybe'").count() == 0

    components = cluster(updated)
    comp_of = {r["ID"]: r["component"] for r in components.collect()}
    a, b = sorted(confirmed_ids)
    assert comp_of.get(a) == comp_of.get(b), "confirmed pair not clustered"

    merged = merge(prepared, components)
    ids = {r["ID"] for r in merged.select("ID").collect()}
    assert a in ids and b not in ids  # min-ID survived the merge
    matched.unpersist()


def test_maybe_export_row_guard(spark, tmp_path):
    """write_maybe_cases is a DRIVER-side csv collect; a runaway maybe
    rule must hit the row guard instead of OOMing the driver."""
    import pytest

    from bib_dedupe_spark.sources.io import write_maybe_cases

    big = spark.range(0, 50).selectExpr("id as cluster_ID", "'maybe' as duplicate_label")
    path = str(tmp_path / "review.csv")
    with pytest.raises(ValueError, match="maybe-cases export"):
        write_maybe_cases(big, path, max_rows=10)
    # explicit opt-outs still export
    write_maybe_cases(big, path, max_rows=None)
    assert (tmp_path / "review.csv").exists()
    write_maybe_cases(big, str(tmp_path / "review2.csv"), max_rows=50)
    assert (tmp_path / "review2.csv").exists()
