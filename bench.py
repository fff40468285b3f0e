#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is exact-kNN throughput (queries/sec, k=10) — the
BASELINE.json target. Scaling-efficiency evidence (local[8] vs
local[32]) lives in scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from covertree_spark import queries as Q  # noqa: E402
from covertree_spark.plans import metrics as M  # noqa: E402
from covertree_spark.plans.session import get_spark, release_intermediates  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "geo_knn",
    "knn_over_index",
    "geo_ball_join",
    "emb_knn",
    "emb_ball_join",
    "cosine_topk",
    "emb_neardup",
    "dedup_exact",
    "ngram_jaccard",
    "minhash_neardup",
    "simhash_neardup",
    "tile_histogram",
    "pip_convex",
]


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="covertree-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    cat = Q.catalog()

    # warmup: JVM, python workers, parquet footers — not part of any
    # query's cost at a real deployment (long-lived session)
    for t in ("documents", "embeddings"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    cat["tile_assign"][0](spark, SF_DIR).count()

    # prepared layouts (cell assignment + persisted points + broadcast
    # stats) are the amortized ingest/build phase — timed separately
    # from queries, like the reference's build-vs-query split
    prep: dict[str, float] = {}
    for kind, fn in (("geo", Q._geo_points), ("emb", Q._emb_points),
                     ("unit", Q._unit_points)):
        t0 = time.time()
        fn(spark, SF_DIR)
        prep[kind] = round(time.time() - t0, 3)

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    dist_comps: dict[str, int] = {}
    for name in BENCH_QUERIES:
        fn, _sql = cat[name]
        # fresh dist_comps accumulator per query (reference efficiency
        # metric, include/point_vector.h:11 via rgraph.py:168-176);
        # install BEFORE plan build so UDF closures capture it
        acc = M.install(spark)
        snap = M.driver_snapshot()
        t0 = time.time()
        counts[name] = fn(spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)
        dist_comps[name] = int(acc.value) + M.driver_delta(snap)
        release_intermediates()  # drop operator-persisted intermediates

    # headline: exact geo kNN queries/sec (every doc row is a query)
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    qps = n_docs / timings["geo_knn"] if timings["geo_knn"] > 0 else 0.0

    print(
        json.dumps(
            {
                "metric": "exact_knn_queries_per_sec_k10",
                "value": round(qps, 2),
                "unit": "sec",
                "queries": timings,
                "prep": prep,
                "counts": counts,
                "dist_comps": dist_comps,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
