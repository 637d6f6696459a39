"""Plan-fragment cache: memoization + gateway-keyed invalidation."""


def test_cached_fragment_memoizes(spark):
    from bib_dedupe_spark import plancache

    calls = []

    def build():
        calls.append(1)
        return object()

    a = plancache.cached_fragment(("t", 1), build)
    b = plancache.cached_fragment(("t", 1), build)
    assert a is b and len(calls) == 1
    # a different key builds fresh
    c = plancache.cached_fragment(("t", 2), build)
    assert c is not a and len(calls) == 2


def test_cached_fragment_invalidates_on_new_gateway(spark, monkeypatch):
    from bib_dedupe_spark import plancache

    calls = []

    def build():
        calls.append(1)
        return object()

    a = plancache.cached_fragment(("g",), build)
    # simulate a fresh JVM gateway: stale JVM handles must not be reused
    monkeypatch.setattr(plancache, "_gateway_key", lambda: "other-gateway")
    b = plancache.cached_fragment(("g",), build)
    assert b is not a and len(calls) == 2


def test_key_entries_column_reused_across_calls(spark):
    """The blocking key-entries Column (a ~0.5 s py4j build) must be the
    same object across candidate-generation calls within one JVM."""
    from bib_dedupe_spark.operators.block import _key_entries_column

    assert _key_entries_column() is _key_entries_column()
