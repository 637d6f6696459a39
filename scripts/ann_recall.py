"""ANN recall measurement: IVF / sign-LSH vs exact brute force.

Usage: python scripts/ann_recall.py [n_corpus] [n_queries]
       (defaults 100_000 x 200; env SPARK_GRAFT_CPUS sets parallelism)

The oracle-checked ANN queries prove CORRECTNESS at toy scale; this
probe supplies the missing evidence at realistic vector counts: recall@k
of ivf_topk (n_probe sweep) and lsh_topk (n_planes sweep) against
brute_force_topk ground truth, plus wall times — the recall/cost curve a
deployment picks its operating point from. Synthetic corpus: clustered
Gaussians (deterministic), the shape real embedding spaces approximate
and the regime where IVF's coarse quantizer is meaningful.

Appends the JSON result to SCALE.md.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_vectors(
    n: int,
    n_queries: int,
    dim: int = 64,
    n_clusters: int = 64,
    seed: int = 7,
    n_planted: int = 3,
):
    """Clustered Gaussians + PLANTED near-duplicates of each query.

    The planted copies (cos ~0.93-0.97) model the retrieval case this
    engine exists for — near-dup detection — and make recall@k measure
    finding genuinely-similar items rather than ranking within isotropic
    noise (where any sublinear method degrades toward random).
    Returns (vectors, query_ids, planted_pair_set).
    """
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, size=n)
    # noise vectors scaled to a fixed NORM (a raw N(0,I) draw in 64-d has
    # norm ~8 — added unscaled it swamps the unit center entirely):
    # within-cluster cos ~0.78, planted-near-dup cos ~0.95
    cluster_noise = rng.normal(size=(n, dim)) * (0.8 / np.sqrt(dim))
    vecs = centers[assign] + cluster_noise
    vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    step = n // n_queries
    query_ids = [i * step for i in range(n_queries)]
    planted = set()
    for q in query_ids:
        for j in range(1, n_planted + 1):
            t = q + j
            v = vecs[q] + rng.normal(size=dim) * (0.3 / np.sqrt(dim))
            vecs[t] = v / max(np.linalg.norm(v), 1e-12)
            planted.add((q, t))
    return vecs.astype(np.float32), query_ids, planted


def pair_set(df) -> set:
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def main() -> None:
    n_corpus = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    k = 10
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))

    from bib_dedupe_spark.session import get_spark
    from bib_dedupe_spark.textops.similarity_search import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
        train_ivf_centroids,
    )

    spark = get_spark(
        app_name="ann-recall",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")

    vecs, query_ids, planted = make_vectors(n_corpus, n_queries)
    corpus = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(n_corpus), "embedding": [list(map(float, v)) for v in vecs]}
        )
    ).persist()
    corpus.count()
    qset = set(query_ids)
    queries = corpus.filter(F_col("vec_id").isin(list(qset))).persist()
    nq = queries.count()

    # warm the Arrow/pandas-UDF path once so the first timed pass is not
    # charged JVM+Python worker startup
    tiny = corpus.limit(64).persist()
    ivf_topk(tiny, tiny, k=2, n_lists=4, n_probe=2).count()
    lsh_topk(tiny, tiny, k=2, n_planes=4, n_tables=2).count()
    tiny.unpersist()

    t0 = time.time()
    truth = brute_force_topk(queries, corpus, k=k).persist()
    n_truth = truth.count()
    t_bf = time.time() - t0
    truth_set = pair_set(truth)
    n_planted = len(planted)

    out = {
        "n_corpus": n_corpus,
        "n_queries": nq,
        "k": k,
        "dim": 64,
        "brute_force_wall_s": round(t_bf, 2),
        "ivf": [],
        "lsh": [],
    }

    n_lists = 64
    centroids = train_ivf_centroids(corpus, n_lists=n_lists)
    for n_probe in (1, 2, 4, 8, 16):
        t0 = time.time()
        approx = ivf_topk(
            queries, corpus, k=k, n_lists=n_lists, n_probe=n_probe,
            centroids=centroids,
        )
        got = pair_set(approx)
        wall = time.time() - t0
        out["ivf"].append(
            {
                "n_lists": n_lists,
                "n_probe": n_probe,
                "recall_at_10": round(len(got & truth_set) / n_truth, 4),
                "near_dup_recall": round(len(got & planted) / n_planted, 4),
                "wall_s": round(wall, 2),
            }
        )
        print(out["ivf"][-1], flush=True)

    for n_planes, n_tables in ((12, 1), (16, 4), (12, 4), (12, 8), (10, 8)):
        t0 = time.time()
        approx = lsh_topk(
            queries, corpus, k=k, n_planes=n_planes, n_tables=n_tables
        )
        got = pair_set(approx)
        wall = time.time() - t0
        out["lsh"].append(
            {
                "n_planes": n_planes,
                "n_tables": n_tables,
                "recall_at_10": round(len(got & truth_set) / n_truth, 4),
                "near_dup_recall": round(len(got & planted) / n_planted, 4),
                "wall_s": round(wall, 2),
            }
        )
        print(out["lsh"][-1], flush=True)

    print(json.dumps(out))
    md = Path(__file__).resolve().parent.parent / "SCALE.md"
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    with md.open("a") as fh:
        fh.write(
            f"\n## ANN recall probe {stamp}\n\n```json\n"
            f"{json.dumps(out, indent=1)}\n```\n"
        )
    spark.stop()


from pyspark.sql.functions import col as F_col  # noqa: E402

if __name__ == "__main__":
    main()
