"""Clustering stage: distributed connected components on the edge list.

Behavioral spec: /root/reference/bib_dedupe/cluster.py:78-120 (recursive
DFS over a driver-local adjacency dict, with a same-search_set expansion
constraint at :56-64). The DFS neither distributes nor survives deep
chains; here we run the large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond") as an iterative DataFrame
job: O(log² n) rounds, each a pair of groupBy shuffles, with per-round
``localCheckpoint`` (or persisted parquet checkpoints for resumability)
to truncate lineage.

Output: ``DataFrame[ID, component]`` where component = min node id of the
component — matching the reference's sorted-first-ID cluster identity.

Same-search_set constraint: the reference excludes a node from a component
when its non-empty search_set is already present, in DFS visit order. We
run unconstrained CC first, then deterministically split extra same-set
members (all but the min-ID holder of each (component, set)) into
singleton components — equivalent on all non-adversarial inputs since
same-set pairs were already pruned at blocking (block.py:127-149).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bib_dedupe_spark import constants as C


def _symmetrize(edges: DataFrame) -> DataFrame:
    fwd = edges.select(F.col("src"), F.col("dst"))
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionByName(rev)


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every larger neighbor of u to u's minimum neighborhood node.

    Join-based (no collect_set): hub nodes with huge neighborhoods stream
    through the join instead of materializing one giant array per node.
    """
    nbrs = _symmetrize(edges)
    mins = nbrs.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    return (
        nbrs.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Within each node's smaller-neighbor star, link all to the minimum."""
    oriented = _symmetrize(edges).filter(F.col("dst") < F.col("src"))
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    relink = (
        oriented.join(mins, "src")
        .filter(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    self_link = mins.select("src", F.col("m").alias("dst"))
    return relink.unionByName(self_link).distinct()


def connected_components(
    edges: DataFrame,
    max_iterations: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Edge list (src, dst) → DataFrame[ID, component] (min-id labeling).

    ``checkpoint_dir`` switches per-iteration lineage truncation from
    localCheckpoint to resumable parquet checkpoints (see lineage.py).
    """
    spark = edges.sparkSession
    current = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    current = current.localCheckpoint()

    for iteration in range(max_iterations):
        grown = _large_star(current).localCheckpoint()
        # converged when large-star adds nothing new: after a small-star
        # pass the graph is an out-degree≤1 forest, where this implies the
        # star fixpoint (any chain still produces a new shortcut edge)
        if iteration > 0:
            changed = (
                grown.join(current, ["src", "dst"], "left_anti")
                .limit(1)
                .count()
            )
            if changed == 0:
                break
        current = _small_star(grown)
        if checkpoint_dir is not None:
            path = f"{checkpoint_dir}/cc_iter_{iteration}"
            current.write.mode("overwrite").parquet(path)
            current = spark.read.parquet(path)
        else:
            current = current.localCheckpoint()

    membership = _symmetrize(current).groupBy("src").agg(
        F.min("dst").alias("root")
    )
    return membership.select(
        F.col("src").alias(C.ID),
        F.least(F.col("src"), F.col("root")).alias(C.COMPONENT),
    )


def cluster(
    matched_df: DataFrame,
    label: str = C.DUPLICATE,
    enforce_search_sets: bool = True,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Labeled edge list → DataFrame[ID, component].

    Only edges carrying ``label`` participate (cluster.py:98). Components
    are identified by their minimum member ID.
    """
    edges = matched_df.filter(F.col(C.DUPLICATE_LABEL) == label).select(
        F.col("ID_1").alias("src"), F.col("ID_2").alias("dst")
    )

    components = connected_components(edges, checkpoint_dir=checkpoint_dir)

    if not enforce_search_sets:
        return components

    # search_set lookup from the edge endpoints (cluster.py:102-106)
    sets_df = (
        matched_df.filter(F.col(C.DUPLICATE_LABEL) == label)
        .select(
            F.col("ID_1").alias(C.ID), F.col("search_set_1").alias("sset")
        )
        .unionByName(
            matched_df.filter(F.col(C.DUPLICATE_LABEL) == label).select(
                F.col("ID_2").alias(C.ID), F.col("search_set_2").alias("sset")
            )
        )
        .groupBy(C.ID)
        .agg(F.max("sset").alias("sset"))
    )

    labeled = components.join(sets_df, C.ID, "left").fillna({"sset": ""})
    from pyspark.sql.window import Window

    w = Window.partitionBy(C.COMPONENT, "sset").orderBy(C.ID)
    ranked = labeled.withColumn(
        "_rank",
        F.when(F.col("sset") == "", F.lit(1)).otherwise(
            F.row_number().over(w)
        ),
    )
    # extra same-set members leave the component (become singletons)
    return ranked.select(
        C.ID,
        F.when(F.col("_rank") == 1, F.col(C.COMPONENT))
        .otherwise(F.col(C.ID))
        .alias(C.COMPONENT),
    )
