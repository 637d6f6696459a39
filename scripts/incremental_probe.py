"""Incremental-linkage cost probe: per-batch wall vs corpus size.

Usage: python scripts/incremental_probe.py [n_batches] [batch_records]
       (defaults 10 x 2000; env INCR_COMPACT_EVERY=k compacts the key
        index into the bucketed table every k batches, 0 = never;
        env INCR_HOT=1 switches to DEGENERATE numeric hosts — every
        record shares one author blocking key, the shape whose
        batch×corpus fan-out otherwise grows with the corpus — and
        INCR_HOT_STRATEGY=drop|salt picks the block_delta policy;
        env INCR_SPLIT=1 additionally runs a SECOND stream at 1/4 the
        batch size and solves the per-batch fixed vs per-record
        variable cost split from the two steady-state walls, plus
        batches/hour capacity at each size)

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


def run_stream(
    spark,
    records,
    n_batches: int,
    batch_records: int,
    hot: bool,
    hot_strategy: str,
    compact_every: int,
    quiet: bool = False,
) -> list:
    """Feed ``n_batches`` equal batches through link_batch; per-batch walls."""
    import tempfile

    from bib_dedupe_spark.sources.io import compact_corpus_index, compact_edges
    from bib_dedupe_spark.streaming.dedup_stream import link_batch

    work = tempfile.mkdtemp(prefix="incr_probe_")
    corpus_path = f"{work}/corpus"
    edges_path = f"{work}/edges"
    keys_path = f"{work}/corpus_keys"

    # unique per run: a previous run's orphaned warehouse dir would fail
    # saveAsTable with LOCATION_ALREADY_EXISTS
    index_table = "incr_probe_index_" + Path(work).name.split("_")[-1]
    edges_table = "incr_probe_edges_" + Path(work).name.split("_")[-1]
    spark.sql(f"DROP TABLE IF EXISTS {index_table}")
    spark.sql(f"DROP TABLE IF EXISTS {edges_table}")

    def _host(rid: str) -> str:
        if hot:
            # digits are stripped by prep -> every record collapses
            # to one degenerate author key (the hot-key shape)
            return f"h{hash(rid) % 5000}"
        # diverse ALPHABETIC hosts: author/container keys derive from the
        # host, and prep strips digits — numeric host names collapse every
        # record to one degenerate author key (the hot-key shape that
        # test_block_salting's delta hot-key tests cover explicitly)
        return "".join(
            chr(ord("a") + int(d)) for d in str(hash(rid) % 99991)
        )

    walls = []
    compact_walls = []
    for b in range(n_batches):
        chunk = records[b * batch_records : (b + 1) * batch_records]
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
        if compact_every and (b + 1) % compact_every == 0:
            # BOTH sinks, like a production stop→compact→resume cycle;
            # the wall is tracked separately so batches/hour can be
            # reported with compaction amortized over the interval
            t0 = time.time()
            compact_corpus_index(spark, keys_path, index_table, buckets=16)
            compact_edges(spark, edges_path, edges_table, buckets=16)
            compact_walls.append(round(time.time() - t0, 2))
        if not quiet:
            print(
                f"batch {b}: corpus={(b + 1) * batch_records} "
                f"wall={walls[-1]}s",
                flush=True,
            )
    return walls, compact_walls


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    batch_records = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    compact_every = int(os.environ.get("INCR_COMPACT_EVERY", "0"))
    hot = os.environ.get("INCR_HOT", "") == "1"
    hot_strategy = os.environ.get("INCR_HOT_STRATEGY", "drop")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    split = os.environ.get("INCR_SPLIT", "") == "1"

    from bib_dedupe_spark.session import get_spark

    spark = get_spark(
        app_name="incremental-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bib_dedupe_spark.sources.synthetic import generate

    # INCR_VOCAB=zipf switches titles to the realistic-entropy pool —
    # with INCR_HOT=1 this is the regime the crossing-side word-join
    # refinement targets (degenerate blocking key, entropic titles);
    # the default dense pool makes every fan-out pair share words, where
    # the est router correctly keeps the fan-out join
    vocab = os.environ.get("INCR_VOCAB", "dense")
    records, _ = generate(
        n_base=n_batches * batch_records, seed=99, title_vocab=vocab
    )

    walls, compact_walls = run_stream(
        spark, records, n_batches, batch_records, hot, hot_strategy,
        compact_every,
    )

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
        "batches_per_hour": round(3600 / tail, 1),
        "records_per_hour": round(3600 / tail * batch_records),
    }
    if compact_walls:
        # compaction cost amortized over the batches between compactions
        amortized = tail + sum(compact_walls) / len(compact_walls) / max(
            compact_every, 1
        )
        out["compaction"] = {
            "walls_s": compact_walls,
            "amortized_batch_s": round(amortized, 2),
            "batches_per_hour_amortized": round(3600 / amortized, 1),
            "records_per_hour_amortized": round(
                3600 / amortized * batch_records
            ),
        }

    if split:
        # second stream at 4x the batch size: two steady-state walls at
        # two batch sizes solve wall(B) = fixed + variable_per_record * B
        # (the larger contrast conditions the solve — at small batches
        # the wall is almost entirely fixed cost and the difference
        # drowns in co-tenant noise)
        big_b = batch_records * 4
        records_big, _ = generate(n_base=n_batches * big_b, seed=101)
        walls_big, _cw = run_stream(
            spark,
            records_big,
            n_batches,
            big_b,
            hot,
            hot_strategy,
            compact_every,
            quiet=True,
        )
        tail_big = sum(walls_big[-3:]) / 3
        var_per_rec = (tail_big - tail) / (big_b - batch_records)
        fixed = tail - var_per_rec * batch_records
        out["split"] = {
            "big_batch_records": big_b,
            "big_late_mean_s": round(tail_big, 2),
            "fixed_cost_s_per_batch": round(fixed, 2),
            "variable_cost_ms_per_record": round(var_per_rec * 1000, 3),
            "fixed_fraction_at_batch": round(fixed / tail, 3) if tail else None,
            "big_batches_per_hour": round(3600 / tail_big, 1),
            "big_records_per_hour": round(3600 / tail_big * big_b),
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
