#!/usr/bin/env python3
"""Instrumented staged-match stage timings at one parallelism level.

Usage: python scripts/staged_probe.py <cores> [n_records]

Splits the staged match into its physical stages and times each:
  stage1  cheap sims + bound flags + gated-input projection + persist
  stage2  expensive kernels on undecided + label + dedupe (reads cache)
so the non-scaling term in scaling_bench's staged_load can be located.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 2
n_records = int(sys.argv[2]) if len(sys.argv) > 2 else 80000

import pandas as pd  # noqa: E402

from bib_dedupe_spark.session import get_spark  # noqa: E402

spark = get_spark(
    app_name=f"staged-probe-{cores}",
    master=f"local[{cores}]",
    shuffle_partitions=cores * 2,
    extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "10000"},
)
spark.sparkContext.setLogLevel("ERROR")

from bib_dedupe_spark import block  # noqa: E402
from bib_dedupe_spark.operators.prep import prep  # noqa: E402
from bib_dedupe_spark.sources.synthetic import generate  # noqa: E402


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


records, _ = generate(n_base=n_records, seed=7)
prepared = prep(
    spark.createDataFrame(pd.DataFrame(records)).repartition(cores * 2)
).persist()
prepared.count()
pairs = block(prepared, max_block_size=2000).repartition(cores * 4).persist()
n_pairs = pairs.count()

from pyspark.sql import functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

from bib_dedupe_spark import constants as C  # noqa: E402
from bib_dedupe_spark.operators import sim  # noqa: E402
from bib_dedupe_spark.operators.match import (  # noqa: E402
    EDGE_COLUMNS,
    _stage2_keep_columns,
    _staged_plan_cols,
)

# warm workers
materialize(sim.score(pairs.sample(0.02, seed=1)))

out = {"cores": cores, "n_pairs": n_pairs, "passes": []}
for _ in range(2):
    cheap_piece_cols, bound_col_cols, dup_rw_col, maybe_rw_col = (
        _staged_plan_cols(None, None)
    )
    dup_possible = F.col("_dup_hi") & ~F.col("_veto")
    dup_certain = F.col("_dup_lo") & ~F.col("_veto")
    decision = (
        F.when(dup_certain, F.lit(C.DUPLICATE))
        .when(~dup_possible & F.col("_mb_lo"), F.lit(C.MAYBE))
        .when(dup_possible | F.col("_mb_hi"), F.lit("undecided"))
        .otherwise(F.lit(""))
    )

    t0 = time.time()
    df = sim.score_cheap(pairs)
    df = df.withColumns(cheap_piece_cols)
    df = df.withColumns(bound_col_cols)
    df = df.withColumn("_decision", decision)
    df = df.withColumn(
        "_exp_in",
        sim.gated_expensive_inputs(F.col("_decision") == "undecided"),
    )
    df = df.select(*_stage2_keep_columns(df.columns, None, None))
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    n_cached = df.count()
    t1 = time.time()

    df2 = sim.score_expensive(df, inputs_struct=F.col("_exp_in")).drop("_exp_in")
    und = F.col("_decision") == "undecided"
    label = (
        F.when(F.col("_decision") == C.DUPLICATE, F.lit(C.DUPLICATE))
        .when(F.col("_decision") == C.MAYBE, F.lit(C.MAYBE))
        .when(und & dup_rw_col & ~F.col("_veto"), F.lit(C.DUPLICATE))
        .when(und & maybe_rw_col, F.lit(C.MAYBE))
    )
    edges = (
        df2.withColumn(C.DUPLICATE_LABEL, label)
        .filter(F.col(C.DUPLICATE_LABEL).isNotNull())
        .select(*EDGE_COLUMNS)
        .dropDuplicates(["ID_1", "ID_2"])
    )
    materialize(edges)
    t2 = time.time()
    n_und = df.filter(und).count()
    t3 = time.time()
    df.unpersist()
    out["passes"].append(
        {
            "stage1_s": round(t1 - t0, 2),
            "stage2_s": round(t2 - t1, 2),
            "total_s": round(t2 - t0, 2),
            "n_cached": n_cached,
            "n_undecided": n_und,
            "undecided_count_s": round(t3 - t2, 2),
            "load_avg": round(os.getloadavg()[0], 1),
        }
    )

print(json.dumps(out))
spark.stop()
