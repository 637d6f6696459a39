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


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
) -> DataFrame:
    """Approximate top-k: candidates share the sign-LSH bucket.

    The cross join becomes an equi-join on the bucket key; recall can be
    raised by lowering ``n_planes`` (bigger buckets) or multiprobing.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        sign_lsh_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        sign_lsh_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
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
