"""Block-stage probe at >=50k records: plain vs ID-bucketed prepared input.

Measures the block stage wall time on both layouts and verifies from the
executed plan that the bucketed run performs its two pair-enrichment
joins without exchanging the (big) records side. Usage:

    python scripts/block_probe.py [n_records]

Co-tenanted host: compare the two numbers to each other, not across runs.
"""
from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from bib_dedupe_spark.session import get_spark

    spark = get_spark(
        app_name="block-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bib_dedupe_spark import block, prep
    from bib_dedupe_spark.sources.io import write_records_bucketed
    from bib_dedupe_spark.sources.synthetic import generate

    records, _ = generate(n_base=n_base, seed=7)
    rdf = spark.createDataFrame(pd.DataFrame(records)).repartition(cpus * 2)
    prepared = prep(rdf).persist()
    n_records = prepared.count()

    # ---- plain parquet layout
    plain_path = "/tmp/block_probe_plain"
    prepared.write.mode("overwrite").parquet(plain_path)
    plain = spark.read.parquet(plain_path)
    t0 = time.time()
    n_pairs_plain = block(plain, max_block_size=2000).count()
    t_plain = time.time() - t0

    # ---- bucketed layout (enrichment joins co-located on ID)
    spark.sql("DROP TABLE IF EXISTS block_probe_bucketed")
    write_records_bucketed(
        prepared, "block_probe_bucketed", buckets=cpus * 2, bucket_col="ID"
    )
    bucketed = spark.table("block_probe_bucketed")
    pairs_b = block(bucketed, max_block_size=2000)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pairs_b.explain()
    plan = buf.getvalue()
    t0 = time.time()
    n_pairs_bucketed = pairs_b.count()
    t_bucketed = time.time() - t0

    bucketed_scans = plan.count("Bucketed: true")
    print(
        json.dumps(
            {
                "records": n_records,
                "pairs": n_pairs_plain,
                "pairs_bucketed": n_pairs_bucketed,
                "block_plain_s": round(t_plain, 2),
                "block_bucketed_s": round(t_bucketed, 2),
                "bucketed_scans_in_plan": bucketed_scans,
                "exchanges_plain": None,
                "exchanges_bucketed": plan.count("Exchange"),
            }
        )
    )
    assert n_pairs_plain == n_pairs_bucketed, "layouts must agree"
    spark.stop()


if __name__ == "__main__":
    main()
