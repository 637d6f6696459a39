"""Incremental-linkage cost probe: per-batch wall vs corpus size.

Usage: python scripts/incremental_probe.py [n_batches] [batch_records]
       (defaults 10 x 2000; env INCR_COMPACT_EVERY=k compacts the key
        index into the bucketed table every k batches, 0 = never;
        env INCR_HOT=1 switches to DEGENERATE numeric hosts — every
        record shares one author blocking key, the shape whose
        batch×corpus fan-out otherwise grows with the corpus — and
        INCR_HOT_STRATEGY=drop|salt picks the block_delta policy)

Feeds equal-sized record batches through link_batch() against an
accumulating corpus and reports each batch's wall time. The claim under
test is the SCALE.md one: per-batch cost is O(|batch| + matched keys),
NOT O(|corpus|) — the wall must stay ~flat while the corpus grows 10x.
Appends the JSON result to BENCH_SCALING.md alongside the scaling runs.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    batch_records = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    compact_every = int(os.environ.get("INCR_COMPACT_EVERY", "0"))
    hot = os.environ.get("INCR_HOT", "") == "1"
    hot_strategy = os.environ.get("INCR_HOT_STRATEGY", "drop")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

    from bib_dedupe_spark.session import get_spark

    spark = get_spark(
        app_name="incremental-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bib_dedupe_spark.sources.io import compact_corpus_index
    from bib_dedupe_spark.sources.synthetic import generate
    from bib_dedupe_spark.streaming.dedup_stream import link_batch

    records, _ = generate(n_base=n_batches * batch_records, seed=99)
    # synthetic records -> the webpages shape link_batch expects
    import tempfile

    work = tempfile.mkdtemp(prefix="incr_probe_")
    corpus_path = f"{work}/corpus"
    edges_path = f"{work}/edges"
    keys_path = f"{work}/corpus_keys"

    # unique per run: a previous run's orphaned warehouse dir would fail
    # saveAsTable with LOCATION_ALREADY_EXISTS
    index_table = "incr_probe_index_" + Path(work).name.split("_")[-1]
    spark.sql(f"DROP TABLE IF EXISTS {index_table}")

    walls = []
    corpus_sizes = []
    for b in range(n_batches):
        chunk = records[b * batch_records : (b + 1) * batch_records]
        # diverse ALPHABETIC hosts: author/container keys derive from the
        # host, and prep strips digits — numeric host names collapse every
        # record to one degenerate author key (the hot-key shape that
        # test_block_salting's delta hot-key tests now cover explicitly)
        def _host(rid: str) -> str:
            if hot:
                # digits are stripped by prep -> every record collapses
                # to one degenerate author key (the hot-key shape)
                return f"h{hash(rid) % 5000}"
            return "".join(
                chr(ord("a") + int(d)) for d in str(hash(rid) % 99991)
            )

        pages = pd.DataFrame(
            {
                "url": [
                    f"https://{_host(r['ID'])}.org/{r['ID']}"
                    for r in chunk
                ],
                "warc_ts": pd.Timestamp("2026-01-01"),
                "html": [b"" for _ in chunk],
                "text": [
                    "\n".join(
                        str(r.get(k) or "")
                        for k in (
                            "title",
                            "author",
                            "journal",
                            "booktitle",
                            "year",
                            "volume",
                            "number",
                            "pages",
                            "abstract",
                            "doi",
                        )
                    )
                    for r in chunk
                ],
                "lang": "en",
            }
        )
        batch_df = spark.createDataFrame(pages)
        t0 = time.time()
        link_batch(
            batch_df, b, corpus_path, edges_path, keys_path,
            max_block_size=2000,
            hot_key_strategy=hot_strategy if hot else "salt",
        )
        walls.append(round(time.time() - t0, 2))
        corpus_sizes.append((b + 1) * batch_records)
        if compact_every and (b + 1) % compact_every == 0:
            compact_corpus_index(spark, keys_path, index_table, buckets=16)
        print(f"batch {b}: corpus={corpus_sizes[-1]} wall={walls[-1]}s",
              flush=True)

    if n_batches < 7:
        raise SystemExit(
            "need >= 7 batches for disjoint early/late windows"
        )
    head = sum(walls[1:4]) / 3  # skip batch 0 (no corpus, warmup)
    tail = sum(walls[-3:]) / 3
    out = {
        "n_batches": n_batches,
        "batch_records": batch_records,
        "compact_every": compact_every,
        "hot_corpus": hot,
        "hot_strategy": hot_strategy if hot else None,
        "per_batch_wall_s": walls,
        "early_mean_s": round(head, 2),
        "late_mean_s": round(tail, 2),
        "late_over_early": round(tail / head, 3) if head else None,
    }
    print(json.dumps(out))
    md = Path(__file__).resolve().parent.parent / "BENCH_SCALING.md"
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    with md.open("a") as fh:
        fh.write(
            f"\n## Incremental-linkage probe {stamp}\n\n```json\n"
            f"{json.dumps(out, indent=1)}\n```\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
