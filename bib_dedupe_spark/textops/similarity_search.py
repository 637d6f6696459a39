"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; sign-LSH bucketed search
as the scale path (bucket equi-join instead of a cross join). All plans
are native column expressions — the dot products run inside whole-stage
codegen via ``aggregate``/``zip_with``, no Python UDFs.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a, b):
    return _dot(a, b) / F.sqrt(_dot(a, a) * _dot(b, b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: queries × corpus cross join + per-query window.

    Correctness baseline — O(|Q|·|C|); use :func:`lsh_topk` at scale or
    broadcast the query side when |Q| is small (Spark auto-broadcasts
    below the threshold; the cross join is then map-side only).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def sign_lsh_bucket(vec_col, n_planes: int = 16):
    """Sign-bit bucket over the first ``n_planes`` dimensions.

    A deterministic random-hyperplane LSH with axis-aligned planes — for
    learned embeddings whose coordinates are roughly isotropic this gives
    the usual LSH recall/bucket-size trade-off with zero randomness to
    reproduce across engines.
    """
    return F.array_join(
        F.transform(
            F.slice(vec_col, 1, n_planes),
            lambda x: F.when(x >= 0, "1").otherwise("0"),
        ),
        "",
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 20_000,
    iterations: int = 10,
):
    """Deterministic coarse quantizer: Lloyd k-means on a bounded sample.

    The sample is an UNBIASED deterministic hash slice —
    ``xxhash64(id) % p == 0`` with ``p`` sized from a corpus count — not
    a low-id top-k (ids can correlate with content; a TakeOrdered sample
    would concentrate on one content region). The filter is a plain
    predicate the scan prunes on; sampled rows are sorted by id on the
    driver for a reproducible init, and Lloyd iterations run in numpy on
    the driver — the corpus itself never leaves the executors. Returns an
    (n_lists, dim) numpy array of L2-normalized centroids.
    """
    import numpy as np
    from pyspark.sql import functions as F

    n = corpus.select(id_col).count()
    p = max(1, n // max(sample_size, 1))
    rows = (
        corpus.select(id_col, vec_col)
        .filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(p)) == 0)
        .limit(sample_size)
        .collect()
    )
    rows.sort(key=lambda r: r[id_col])
    data = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    data /= np.maximum(np.linalg.norm(data, axis=1, keepdims=True), 1e-12)
    centroids = data[: min(n_lists, len(data))].copy()
    for _ in range(iterations):
        sims = data @ centroids.T
        assign = sims.argmax(axis=1)
        for j in range(len(centroids)):
            members = data[assign == j]
            if len(members):
                c = members.mean(axis=0)
                centroids[j] = c / max(np.linalg.norm(c), 1e-12)
    return centroids


def _ivf_assign_udf(centroids, top: int = 1):
    """Vectorized pandas UDF: nearest-centroid list ids (numpy matmul)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    flat = centroids.tolist()

    @pandas_udf("array<int>")
    def assign(vecs):
        import pandas as pd

        cents = np.array(flat, dtype=np.float64)
        mat = np.array([list(v) for v in vecs], dtype=np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ cents.T
        order = np.argsort(-sims, axis=1, kind="stable")[:, :top]
        return pd.Series(order.tolist())

    return assign


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their nearest-centroid
    list; each query probes its ``n_probe`` closest lists. The cross join
    becomes an equi-join on list id — the classic inverted-file ANN shape,
    with the heavy assignment math inside a vectorized (numpy) pandas UDF.
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_lists=n_lists, id_col=id_col, vec_col=vec_col
        )

    assign1 = _ivf_assign_udf(centroids, top=1)
    assign_probe = _ivf_assign_udf(centroids, top=n_probe)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.element_at(assign1(F.col(vec_col)), 1).alias("list_id"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(assign_probe(F.col(vec_col))).alias("list_id"),
    )
    scored = (
        q.join(c, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _random_plane_buckets_udf(
    dim: int, n_planes: int, n_tables: int, seed: int, planes=None
):
    """Vectorized pandas UDF: one sign-bucket string per hash table.

    Hyperplanes default to seeded Gaussian draws (deterministic across
    runs); pass ``planes`` (an (n_tables, dim, n_planes) nested list) to
    pin them explicitly — e.g. integer planes an external SQL oracle can
    reproduce. The per-row work is one (batch × dim) @ (dim × planes)
    matmul per table — numpy inside an Arrow batch, never per-row Python.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    fixed = (
        [[list(map(float, row)) for row in table] for table in planes]
        if planes is not None
        else None
    )

    @pandas_udf("array<string>")
    def buckets(vecs):
        import pandas as pd

        if fixed is not None:
            plane_arr = np.array(fixed, dtype=np.float64)
        else:
            rng = np.random.default_rng(seed)
            plane_arr = rng.normal(size=(n_tables, dim, n_planes))
        mat = np.array([list(v) for v in vecs], dtype=np.float64)
        out = []
        for t in range(n_tables):
            bits = (mat @ plane_arr[t]) >= 0
            out.append(
                np.array(
                    [f"{t}:" + "".join("1" if b else "0" for b in row)
                     for row in bits]
                )
            )
        return pd.Series(np.stack(out, axis=1).tolist())

    return buckets


def lsh_candidate_pairs(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 1,
    dim: int | None = None,
    seed: int = 13,
    planes=None,
) -> DataFrame:
    """LSH collide pairs — the candidate set before any scoring.

    One row per distinct (query_id, neighbor_id) that shares a bucket in
    ANY table, with the vectors carried as (qv, cv) for downstream
    scoring. ``planes`` pins explicit hyperplanes (nested
    (n_tables, dim, n_planes) list) — the oracle-testable entry point.
    """
    if n_tables <= 1 and planes is None:
        bucket = sign_lsh_bucket(F.col(vec_col), n_planes)
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            bucket.alias("bucket"),
        )
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            bucket.alias("bucket"),
        )
        return (
            q.join(c, "bucket")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", "qv", "cv")
        )
    if dim is None:
        row = corpus.select(F.size(vec_col).alias("d")).first()
        dim = row["d"]
    buckets = _random_plane_buckets_udf(
        dim, n_planes, n_tables, seed, planes=planes
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(buckets(F.col(vec_col))).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.explode(buckets(F.col(vec_col))).alias("bucket"),
    )
    return (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
        # a pair colliding in several tables must count once
        .dropDuplicates(["query_id", "neighbor_id"])
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 1,
    dim: int | None = None,
    seed: int = 13,
) -> DataFrame:
    """Approximate top-k: candidates share a sign-LSH bucket.

    ``n_tables=1`` (default) keeps the original axis-aligned bucket — a
    pure-SQL expression, oracle-replicable. ``n_tables>1`` switches to
    the standard multi-table random-hyperplane scheme (seeded Gaussian
    planes in a vectorized pandas UDF): a pair is a candidate if it
    collides in ANY table, which converts per-table miss probability p
    into p^L — the recall lever single-table sign bits lack. The join
    stays an equi-join on (table, bucket); candidates dedupe in the
    ranking window. Raise recall by adding tables or lowering
    ``n_planes`` (bigger buckets); both trade compute for recall.
    """
    cand = lsh_candidate_pairs(
        queries,
        corpus,
        id_col=id_col,
        vec_col=vec_col,
        n_planes=n_planes,
        n_tables=n_tables,
        dim=dim,
        seed=seed,
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
