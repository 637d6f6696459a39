"""Connected-components stress test: a larger random graph checked
against a driver-side union-find oracle."""
import random


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for node in list(parent):
        comp.setdefault(find(node), set()).add(node)
    return {frozenset(v) for v in comp.values()}


def test_cc_matches_union_find_on_random_graph(spark):
    from bib_dedupe_spark.operators.cluster import connected_components

    rng = random.Random(99)
    n_nodes = 3000
    edges = []
    # mixture: long chains (worst case for label propagation), random
    # edges, and a few hub stars
    for i in range(0, 900, 3):
        edges.append((f"n{i:05d}", f"n{i+1:05d}"))
        edges.append((f"n{i+1:05d}", f"n{i+2:05d}"))
    for _ in range(2500):
        a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if a != b:
            edges.append((f"n{a:05d}", f"n{b:05d}"))
    hub = "n00001"
    for _ in range(300):
        edges.append((hub, f"n{rng.randrange(n_nodes):05d}"))

    want = _union_find_components(edges)

    df = spark.createDataFrame(edges, ["src", "dst"])
    got_rows = connected_components(df).collect()
    got = {}
    for r in got_rows:
        got.setdefault(r["component"], set()).add(r["ID"])
    got_sets = {frozenset(v) for v in got.values()}
    assert got_sets == want
    # min-ID labeling invariant
    for comp, members in got.items():
        assert comp == min(members)
