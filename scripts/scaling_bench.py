#!/usr/bin/env python3
"""Two-cluster-size scaling evidence (BASELINE.json north rule).

A real multi-executor cluster is unavailable in this sandbox, so the
N→4N executor criterion is evidenced by running the SAME job on the SAME
input at two parallelism levels: local[8] (N) and local[32] (4N), on a
32-core host. Reported metric: candidate pairs scored per second through
the sim+match stage (the pipeline's dominant cost), plus the end-to-end
pipeline throughput, and

    efficiency = (throughput_4N / throughput_N) / 4

Shuffle partitions scale with core count; the Arrow batch size is held
identical across runs. Results are printed as JSON and appended to
BENCH_SCALING.md.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_RECORDS = int(os.environ.get("SCALING_RECORDS", "6000"))
SEED = 42


def run_at(cores: int) -> dict:
    import pandas as pd
    from pyspark.sql import SparkSession

    from bib_dedupe_spark import block
    from bib_dedupe_spark.operators.match import match_scored
    from bib_dedupe_spark.operators.prep import prep
    from bib_dedupe_spark.operators.sim import score
    from bib_dedupe_spark.sources.synthetic import generate

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()

    from bib_dedupe_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling-bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores * 2,
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "1000"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    records, _ = generate(n_base=N_RECORDS, seed=SEED)
    records_df = spark.createDataFrame(pd.DataFrame(records)).repartition(
        cores * 2
    )

    t_start = time.time()
    prepared = prep(records_df).persist()
    prepared.count()

    pairs = block(prepared, max_block_size=2000).persist()
    n_pairs = pairs.count()

    t0 = time.time()
    scored = score(pairs).persist()
    scored.count()
    matched = match_scored(scored, persist=False)
    n_matched = matched.count()
    sim_match_wall = time.time() - t0
    total_wall = time.time() - t_start

    result = {
        "cores": cores,
        "candidate_pairs": n_pairs,
        "matched_edges": n_matched,
        "sim_match_wall_s": round(sim_match_wall, 2),
        "pairs_scored_per_s": round(n_pairs / sim_match_wall, 1),
        "end_to_end_wall_s": round(total_wall, 2),
        "end_to_end_pairs_per_s": round(n_pairs / total_wall, 1),
    }
    spark.stop()
    return result


def main() -> None:
    low = run_at(8)
    high = run_at(32)
    eff_sim = (high["pairs_scored_per_s"] / low["pairs_scored_per_s"]) / 4
    eff_e2e = (
        high["end_to_end_pairs_per_s"] / low["end_to_end_pairs_per_s"]
    ) / 4
    out = {
        "n_records_base": N_RECORDS,
        "run_N": low,
        "run_4N": high,
        "scaling_efficiency_sim_match": round(eff_sim, 3),
        "scaling_efficiency_end_to_end": round(eff_e2e, 3),
    }
    print(json.dumps(out, indent=1))

    md = Path(__file__).resolve().parent.parent / "BENCH_SCALING.md"
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    with md.open("a") as fh:
        fh.write(f"\n## Run {stamp}\n\n```json\n{json.dumps(out, indent=1)}\n```\n")


if __name__ == "__main__":
    main()
