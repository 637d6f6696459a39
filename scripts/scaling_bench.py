#!/usr/bin/env python3
"""Two-cluster-size scaling evidence (BASELINE.json north rule).

A real multi-executor cluster is unavailable in this sandbox, so the
N→4N executor criterion is evidenced by running the SAME job on the SAME
input at two parallelism levels (default local[2] vs local[8]; set
SCALING_N to change). Reported metric: candidate pairs scored per second
through the similarity stage at the BASELINE-mandated ≥500k-pair load,
plus end-to-end pipeline throughput, and

    efficiency = (throughput_4N / throughput_N) / 4

NOTE on the host: this sandbox is co-tenanted (idle load average ~8-12 of
32 cores), so parallelism levels are chosen to fit inside the free-core
budget, each level runs in its own subprocess/JVM, the two levels are
interleaved twice, and the best pass per level is reported (the
least-contended window). Shuffle partitions scale with core count; Arrow
batch size is held identical. Results are printed as JSON and appended
to BENCH_SCALING.md.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Load sizes track engine speed: after the round-3 kernel + staged-match
# speedups the old 15k-record sim load ran ~2 s walls at N cores — pure
# fixed cost, unmeasurable scaling (the Amdahl trap BENCH_SCALING.md run D
# documented). Keep the timed section ≥ 45 s at the LOW parallelism level.
N_RECORDS = int(os.environ.get("SCALING_RECORDS", "12000"))
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
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "10000"},
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

    # dominant-stage load: a bigger corpus's NATURAL blocked pairs
    # (replicated pairs would hit the per-side kernel caches dishonestly)
    big_records, _ = generate(
        n_base=int(os.environ.get("SCALING_THROUGHPUT_RECORDS", "80000")),
        seed=7,
    )
    big_prepared = prep(
        spark.createDataFrame(pd.DataFrame(big_records)).repartition(
            cores * 2
        )
    ).persist()
    big_prepared.count()
    big_pairs = (
        block(big_prepared, max_block_size=2000)
        .repartition(cores * 4)
        .persist()
    )
    n_big = big_pairs.count()

    def materialize(df):
        # noop write evaluates every column — a bare count() would let
        # Catalyst prune the scoring UDF away entirely
        df.write.format("noop").mode("overwrite").save()

    materialize(score(big_pairs.sample(0.05, seed=1)))  # warm workers
    sim_big_wall = None
    for _ in range(2):  # steady-state: best of two timed passes
        t0 = time.time()
        materialize(score(big_pairs))
        wall = time.time() - t0
        sim_big_wall = wall if sim_big_wall is None else min(sim_big_wall, wall)

    # staged decision throughput: the pipeline-default lazy path (cheap
    # sims everywhere, expensive kernels only on bound-undecided pairs)
    from bib_dedupe_spark.operators.match import match as match_lazy

    staged_wall = None
    for _ in range(2):
        # unpersist between passes — identical logical plans would let
        # pass 2 reuse pass 1's internal cache (warm, not a measurement)
        caches = []
        t0 = time.time()
        materialize(match_lazy(big_pairs, cache_out=caches))
        wall = time.time() - t0
        for df in caches:
            df.unpersist()
        staged_wall = wall if staged_wall is None else min(staged_wall, wall)

    result = {
        "cores": cores,
        "candidate_pairs": n_pairs,
        "matched_edges": n_matched,
        "sim_match_wall_s": round(sim_match_wall, 2),
        "pairs_scored_per_s": round(n_pairs / sim_match_wall, 1),
        "end_to_end_wall_s": round(total_wall, 2),
        "end_to_end_pairs_per_s": round(n_pairs / total_wall, 1),
        "sim_load_pairs": n_big,
        "sim_load_wall_s": round(sim_big_wall, 2),
        "sim_load_pairs_per_s": round(n_big / sim_big_wall, 1),
        "staged_load_wall_s": round(staged_wall, 2),
        "staged_load_pairs_per_s": round(n_big / staged_wall, 1),
    }
    spark.stop()
    return result


def _run_subprocess(cores: int) -> dict:
    """Each measurement gets its own JVM: local-mode SparkSessions share
    the driver JVM within a process, so heap sizing and GC state would
    otherwise leak from the first run into the second."""
    import subprocess

    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--cores", str(cores)],
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def _better(a: dict | None, b: dict) -> dict:
    if a is None or b["sim_load_pairs_per_s"] > a["sim_load_pairs_per_s"]:
        return b
    return a


def main() -> None:
    if "--cores" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--cores") + 1])
        print(json.dumps(run_at(cores)))
        return

    n_low = int(os.environ.get("SCALING_N", "2"))
    n_high = n_low * 4
    low = high = None
    for _ in range(2):  # interleave to dodge co-tenant load spikes
        low = _better(low, _run_subprocess(n_low))
        high = _better(high, _run_subprocess(n_high))
    eff_sim = (
        high["sim_load_pairs_per_s"] / low["sim_load_pairs_per_s"]
    ) / 4
    eff_staged = (
        high["staged_load_pairs_per_s"] / low["staged_load_pairs_per_s"]
    ) / 4
    eff_e2e = (
        high["end_to_end_pairs_per_s"] / low["end_to_end_pairs_per_s"]
    ) / 4
    out = {
        "n_records_base": N_RECORDS,
        "throughput_records": int(
            os.environ.get("SCALING_THROUGHPUT_RECORDS", "80000")
        ),
        "host_note": (
            "co-tenanted 32-core sandbox (idle load ~8-12); levels chosen"
            " to fit the free-core budget, best of 2 interleaved passes"
        ),
        "run_N": low,
        "run_4N": high,
        "scaling_efficiency_sim_scoring": round(eff_sim, 3),
        "scaling_efficiency_staged_match": round(eff_staged, 3),
        "scaling_efficiency_end_to_end": round(eff_e2e, 3),
    }
    print(json.dumps(out, indent=1))

    md = Path(__file__).resolve().parent.parent / "BENCH_SCALING.md"
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    with md.open("a") as fh:
        fh.write(f"\n## Run {stamp}\n\n```json\n{json.dumps(out, indent=1)}\n```\n")


if __name__ == "__main__":
    main()
