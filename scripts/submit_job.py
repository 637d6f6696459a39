"""spark-submit entry script (cluster deployment).

Runs the full dedupe pipeline reading/writing parquet. The engine itself
arrives via --py-files bib_dedupe_spark.zip — this file has no other
repo dependency, exactly the artifact layout a cluster job ships.

    spark-submit --py-files bib_dedupe_spark.zip scripts/submit_job.py \
        --input records.parquet --output merged/ [--max-block-size N]
"""
import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--max-block-size", type=int, default=1000)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("bib-dedupe-submit").getOrCreate()

    from bib_dedupe_spark import dedupe
    from bib_dedupe_spark.sources.io import read_records

    records = read_records(spark, args.input)
    merged = dedupe(records, max_block_size=args.max_block_size)
    merged.write.mode("overwrite").parquet(args.output)
    spark.stop()


if __name__ == "__main__":
    main()
