"""Golden tests for field normalizers (exact string equality).

Cases lifted from /root/reference/tests/prep_test.py via AST.
"""
import pytest

from bib_dedupe_spark.functions import authors, containers, fields, schema_fix, titles
from tests.reference_cases import prep_cases, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)


@pytest.mark.parametrize("raw,expected", prep_cases("test_prep_authors"))
def test_norm_author(raw, expected):
    assert authors.norm_author(raw) == expected


@pytest.mark.parametrize("raw,expected", prep_cases("test_prep_container_title"))
def test_norm_container_title(raw, expected):
    assert containers.norm_container_title(raw) == expected


@pytest.mark.parametrize("raw,expected", prep_cases("test_prep_title"))
def test_norm_title(raw, expected):
    assert titles.norm_title(raw) == expected


@pytest.mark.parametrize("raw,expected", prep_cases("test_prep_volume"))
def test_norm_volume(raw, expected):
    assert fields.norm_volume(raw) == expected


@pytest.mark.parametrize("raw,expected", prep_cases("test_prep_number"))
def test_norm_number(raw, expected):
    assert fields.norm_number(raw) == expected


@pytest.mark.parametrize("raw,expected", prep_cases("test_prep_pages"))
def test_norm_pages(raw, expected):
    assert fields.norm_pages(raw) == expected


@pytest.mark.parametrize("raw,expected", prep_cases("test_prep_abstract"))
def test_norm_abstract(raw, expected):
    assert fields.norm_abstract(raw) == expected


@pytest.mark.parametrize("raw,expected", prep_cases("test_prep_doi"))
def test_norm_doi(raw, expected):
    assert fields.norm_doi(raw) == expected


@pytest.mark.parametrize("case", prep_cases("test_fix_schema_misalignments"))
def test_fix_schema_row(case):
    row = case["row"]
    title, journal, volume, number, pages, year = schema_fix.fix_row(
        row.get("title", ""),
        row.get("journal", ""),
        row.get("volume", ""),
        row.get("number", ""),
        row.get("pages", ""),
        row.get("year", ""),
    )
    got = {
        "title": title,
        "journal": journal,
        "volume": volume,
        "number": number,
        "pages": pages,
        "year": year,
    }
    for key, expected in case["expected"].items():
        assert got[key] == expected, f"{case['id']}: {key}"


def test_journal_variants_engine_owned(tmp_path, monkeypatch):
    """The library never reads a reference checkout: a CONFIGURED path
    that is missing raises; with nothing configured, the engine's bundled
    starter table loads (one-time warning); strict mode refuses the
    bundled fallback (round-2 verdict: behavior-affecting coupling to the
    reference checkout removed from defaults)."""
    import warnings

    import pytest as _pytest

    from bib_dedupe_spark.functions import containers

    missing = str(tmp_path / "nope.csv")
    # configured-but-missing is always an error (arg or env var)
    with _pytest.raises(FileNotFoundError, match="journal-variants"):
        containers.load_journal_variants(path=missing)
    monkeypatch.setenv("BIB_DEDUPE_JOURNAL_VARIANTS", missing)
    containers._variants_cache = None
    try:
        with _pytest.raises(FileNotFoundError, match="journal-variants"):
            containers.load_journal_variants()

        # nothing configured -> bundled starter table, loudly
        monkeypatch.delenv("BIB_DEDUPE_JOURNAL_VARIANTS")
        containers._variants_cache = None
        containers._warned_bundled = False
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            got = containers.load_journal_variants()
        assert got.get("british medical journal") == "bmj"
        assert len(got) >= 30
        assert any("bundled starter" in str(w.message) for w in caught)

        # strict refuses the bundled fallback
        containers._variants_cache = None
        with _pytest.raises(FileNotFoundError, match="strict"):
            containers.load_journal_variants(strict=True)
        monkeypatch.setenv("BIB_DEDUPE_JOURNAL_VARIANTS_STRICT", "1")
        containers._variants_cache = None
        with _pytest.raises(FileNotFoundError, match="strict"):
            containers.load_journal_variants()
    finally:
        containers._variants_cache = None
        containers._warned_bundled = False

    # the bundled table lives inside the package, not in any checkout
    assert containers._BUNDLED_VARIANTS_PATH.is_file()
    assert "bib_dedupe_spark" in str(containers._BUNDLED_VARIANTS_PATH)


def test_journal_variants_env_path(tmp_path, monkeypatch):
    """BIB_DEDUPE_JOURNAL_VARIANTS points at an engine-owned table."""
    from bib_dedupe_spark.functions import containers

    own = tmp_path / "variants.csv"
    own.write_text("journal,title_variant\nBMJ,British Medical Journal\n")
    monkeypatch.setenv("BIB_DEDUPE_JOURNAL_VARIANTS", str(own))
    containers._variants_cache = None
    try:
        got = containers.load_journal_variants()
        assert got == {"british medical journal": "bmj"}
    finally:
        containers._variants_cache = None


def test_bundled_structural_abbreviation_coverage(monkeypatch):
    """NLM-style abbreviation ↔ full-title pairs must normalize
    IDENTICALLY with the BUNDLED table alone (no env var): the
    abbreviation-expansion generator (functions/abbrev_gen.py) derives
    these variant rows from the engine-owned canonical seed list — no
    reference CSV involved. Reference behavior:
    prep_container_title.py:145-161."""
    import warnings

    from bib_dedupe_spark.functions import containers

    monkeypatch.delenv("BIB_DEDUPE_JOURNAL_VARIANTS", raising=False)
    containers._variants_cache = None
    containers._warned_bundled = True
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            bundled = containers.load_journal_variants()
        # curated starter + generated structural rows
        assert len(bundled) >= 90, len(bundled)
        pairs = [
            # the structurally interesting class: abbreviation words
            # SHORTER than the cascade's 4-char prefix
            ("New England Journal of Medicine", "N Engl J Med"),
            ("Deutsche Medizinische Wochenschrift", "Dtsch Med Wochenschr"),
            ("Annals of Internal Medicine", "Ann Intern Med"),
            ("Proceedings of the National Academy of Sciences",
             "Proc Natl Acad Sci"),
            ("Acta Psychiatrica Scandinavica", "Acta Psychiatr Scand"),
            ("Archives of General Psychiatry", "Arch Gen Psychiatry"),
            ("Journal of Infectious Diseases", "J Infect Dis"),
            ("South African Medical Journal", "S Afr Med J"),
            ("Annals of the Rheumatic Diseases", "Ann Rheum Dis"),
            ("Archives of Disease in Childhood", "Arch Dis Child"),
        ]
        for full, abbrev in pairs:
            a = containers.norm_container_title(full, bundled)
            b = containers.norm_container_title(abbrev, bundled)
            assert a == b, f"{full!r} -> {a!r} but {abbrev!r} -> {b!r}"
    finally:
        containers._variants_cache = None


def test_abbrev_generator_prunes_redundant_rows():
    """generate_variants emits a row ONLY when the cascade would not
    already unify the pair — 'J Clin Oncol' collapses to the same 4-char
    prefixes as its full title, so it must be pruned."""
    from bib_dedupe_spark.functions import abbrev_gen, containers

    assert (
        abbrev_gen.generate_variants(
            "Journal of Clinical Oncology",
            normalizer=containers.norm_container_title,
        )
        == []
    )
    out = abbrev_gen.generate_variants(
        "New England Journal of Medicine",
        normalizer=containers.norm_container_title,
    )
    assert out == ["n engl j med"]
    # single-word titles are never abbreviated (ISO-4 rule)
    assert abbrev_gen.nlm_abbreviation("Nature") == "nature"
    # short abbreviations are suppressed (substring false-hit risk)
    assert (
        abbrev_gen.generate_variants(
            "Cancer Research",
            normalizer=containers.norm_container_title,
        )
        == []
    )
