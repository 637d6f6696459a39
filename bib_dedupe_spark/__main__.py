"""spark-submit entry point.

Deployment per the north rule: ``spark-submit --py-files bib_dedupe_spark.zip
-m`` style execution on a multi-executor cluster. Subcommands cover the
pipeline end-to-end and stage-wise:

    python -m bib_dedupe_spark dedupe   --input records.parquet --output merged/
    python -m bib_dedupe_spark pipeline --input records.parquet --output run1/ \
        --checkpoint-dir ckpt/           # resumable, per-stage checkpoints
    python -m bib_dedupe_spark extract  --input pages.parquet --output records/
"""
from __future__ import annotations

import argparse


def _build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="bib_dedupe_spark")
    sub = parser.add_subparsers(dest="command", required=True)

    for name in ("dedupe", "pipeline", "extract"):
        p = sub.add_parser(name)
        p.add_argument("--input", required=True, help="input table path")
        p.add_argument("--output", required=True, help="output path")
        p.add_argument("--format", default="parquet", choices=["parquet", "csv", "json"])
        p.add_argument("--max-block-size", type=int, default=1000)
        if name == "pipeline":
            p.add_argument(
                "--checkpoint-dir",
                required=True,
                help="per-stage checkpoint root (resume on restart)",
            )

    dbg = sub.add_parser(
        "debug", help="component browser / pair explainer (reference `bib-dedupe debug`)"
    )
    dbg.add_argument("--records", required=True, help="records table path")
    dbg.add_argument("--components", help="DataFrame[ID, component] parquet")
    dbg.add_argument("--format", default="parquet", choices=["parquet", "csv", "json"])
    dbg.add_argument("--component", help="explain this component id")
    dbg.add_argument("--pair", nargs=2, metavar=("ID_1", "ID_2"), help="explain one pair")
    dbg.add_argument("--min-size", type=int, default=2)
    dbg.add_argument("--limit", type=int, default=25)
    dbg.add_argument(
        "--interactive", action="store_true", help="prompt for a component id"
    )
    return parser


def main(argv: list | None = None) -> None:
    args = _build_parser().parse_args(argv)

    from bib_dedupe_spark import dedupe
    from bib_dedupe_spark.session import get_spark
    from bib_dedupe_spark.sources.io import read_records, write_records

    spark = get_spark(app_name=f"bib-dedupe-{args.command}")

    if args.command == "debug":
        from bib_dedupe_spark.debug import run_debug_cli

        run_debug_cli(args, spark)
        return

    if args.command == "extract":
        from bib_dedupe_spark.sources.webpages import records_from_webpages

        pages = spark.read.format(args.format).load(args.input)
        write_records(records_from_webpages(pages), args.output)
        return

    records = read_records(spark, args.input, fmt=args.format)
    if args.command == "dedupe":
        merged = dedupe(records, max_block_size=args.max_block_size)
    else:  # pipeline (resumable)
        from bib_dedupe_spark.lineage import run_pipeline

        merged = run_pipeline(
            spark,
            records,
            args.checkpoint_dir,
            max_block_size=args.max_block_size,
        )
    write_records(merged, args.output)


if __name__ == "__main__":
    main()
