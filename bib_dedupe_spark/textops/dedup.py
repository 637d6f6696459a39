"""Large-scale text deduplication operators (training-data pipeline).

All-native Spark plans (no Python UDFs): hashing is md5-based so results
are engine-portable and deterministic; every operator returns a DataFrame
and composes with the record-linkage pipeline. Designed for the 100 TB
path: shingling is an explode (map-side), minhash is a partial-aggregable
groupBy, LSH candidates come from an equi-join on band signatures —
shuffle keys are (band, signature), which salts naturally because the
signature space is wide.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Full-content duplicate groups: fingerprint, representative, members."""
    return (
        df.withColumn("fingerprint", F.md5(F.col(text_col)))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("representative"),
            F.count("*").alias("n_copies"),
            F.array_sort(F.collect_list(id_col)).alias("members"),
        )
        .filter(F.col("n_copies") > 1)
    )


def shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 3,
) -> DataFrame:
    """Distinct word n-gram shingles per document (explode, no shuffle)."""
    words = F.split(F.col(text_col), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - (size - 1), F.lit(0))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + off) for off in range(size)]
        ),
    )
    return df.filter(F.size(words) >= size).select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(grams)).alias("shingle"),
    )


def minhash_signatures(
    shingled: DataFrame, n_hashes: int = 32
) -> DataFrame:
    """Per-(doc, seed) minwise md5 hash — one partial-aggregable groupBy."""
    seeded = shingled.select(
        "doc",
        F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed"),
        "shingle",
    )
    hashed = seeded.select(
        "doc",
        "seed",
        F.md5(F.concat_ws("|", F.col("seed").cast("string"), "shingle")).alias(
            "h"
        ),
    )
    return hashed.groupBy("doc", "seed").agg(F.min("h").alias("minhash"))


def lsh_candidates(
    signatures: DataFrame, n_hashes: int = 32, bands: int = 8
) -> DataFrame:
    """Banded LSH: docs sharing any band signature become candidates."""
    rows_per_band = n_hashes // bands
    banded = (
        signatures.withColumn(
            "band", F.floor(F.col("seed") / rows_per_band).cast("int")
        )
        .groupBy("doc", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
                    lambda s: s["minhash"],
                ),
                "",
            ).alias("sig")
        )
    )
    left = banded.select(F.col("doc").alias("id1"), "band", "sig")
    right = banded.select(F.col("doc").alias("id2"), "band", "sig")
    return (
        left.join(right, ["band", "sig"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 32,
    bands: int = 8,
    shingle_size: int = 3,
    min_jaccard: float | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, optionally verified by exact Jaccard."""
    sh = shingles(df, text_col, id_col, shingle_size)
    candidates = lsh_candidates(
        minhash_signatures(sh, n_hashes), n_hashes, bands
    )
    if min_jaccard is None:
        return candidates
    scored = ngram_jaccard(candidates, sh)
    return scored.filter(
        F.col("shared") / F.col("union_size") >= min_jaccard
    ).select("id1", "id2")


def ngram_jaccard(pairs: DataFrame, shingled: DataFrame) -> DataFrame:
    """Exact shingle-Jaccard for candidate pairs (integer counts)."""
    counts = shingled.groupBy("doc").agg(F.count("*").alias("n_sh"))
    s1 = shingled.select(F.col("doc").alias("id1"), "shingle")
    s2 = shingled.select(F.col("doc").alias("id2"), "shingle")
    shared = (
        pairs.join(s1, "id1")
        .join(s2, ["id2", "shingle"])
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("shared"))
    )
    c1 = counts.select(F.col("doc").alias("id1"), F.col("n_sh").alias("n1"))
    c2 = counts.select(F.col("doc").alias("id2"), F.col("n_sh").alias("n2"))
    return (
        pairs.join(shared, ["id1", "id2"], "left")
        .fillna({"shared": 0})
        .join(c1, "id1")
        .join(c2, "id2")
        .select(
            "id1",
            "id2",
            "shared",
            (F.col("n1") + F.col("n2") - F.col("shared")).alias("union_size"),
        )
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
) -> DataFrame:
    """Per-document SimHash bit-string over distinct tokens (md5 planes)."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(F.split(F.col(text_col), r"\s+"))).alias(
            "t"
        ),
    )
    hexv = F.expr(
        "(instr('0123456789abcdef', substring(md5(t),1,1)) - 1) * 4096"
        " + (instr('0123456789abcdef', substring(md5(t),2,1)) - 1) * 256"
        " + (instr('0123456789abcdef', substring(md5(t),3,1)) - 1) * 16"
        " + (instr('0123456789abcdef', substring(md5(t),4,1)) - 1)"
    )
    contribs = toks.select("doc", hexv.alias("hv")).select(
        "doc",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"),
        "hv",
    ).select(
        "doc",
        "j",
        (
            2
            * (
                F.floor(F.col("hv") / F.pow(F.lit(2), F.col("j"))).cast(
                    "long"
                )
                % 2
            )
            - 1
        ).alias("contrib"),
    )
    sums = contribs.groupBy("doc", "j").agg(F.sum("contrib").alias("s"))
    return sums.groupBy("doc").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "j",
                            F.when(F.col("s") > 0, "1")
                            .otherwise("0")
                            .alias("b"),
                        )
                    )
                ),
                lambda s: s["b"],
            ),
            "",
        ).alias("simhash")
    )


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    max_hamming: int = 2,
    n_blocks: int = 4,
) -> DataFrame:
    """SimHash near-dups via block-permutation candidate join.

    Splits the signature into ``n_blocks`` substrings; two docs within
    ``max_hamming`` must share at least one block when
    ``max_hamming < n_blocks`` (pigeonhole) — the candidate join is an
    equi-join per block, then Hamming distance is verified natively.
    """
    sigs = simhash(df, text_col, id_col, bits)
    block_len = bits // n_blocks
    blocked = sigs.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.substring(
                            "simhash", b * block_len + 1, block_len
                        ).alias("key"),
                    )
                    for b in range(n_blocks)
                ]
            )
        ).alias("e"),
    ).select("doc", "simhash", F.col("e.blk").alias("blk"), F.col("e.key").alias("key"))
    left = blocked.select(
        F.col("doc").alias("id1"), F.col("simhash").alias("sig1"), "blk", "key"
    )
    right = blocked.select(
        F.col("doc").alias("id2"), F.col("simhash").alias("sig2"), "blk", "key"
    )
    cands = (
        left.join(right, ["blk", "key"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "sig1", "sig2")
        .distinct()
    )
    hamming = F.size(
        F.filter(
            F.zip_with(
                F.split("sig1", ""),
                F.split("sig2", ""),
                lambda a, b: a != b,
            ),
            lambda x: x,
        )
    )
    return cands.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("id1", "id2", "hamming")
