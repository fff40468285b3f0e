#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "q/s", "queries": {...}, "sf": ...}

Protocol (round-2 VERDICT #1/#3/#8): every query runs TWICE per
invocation — the first (cold) run pays plan compilation + python-worker
spin-up, the second (warm) run is the steady-state cost a long-lived
deployment sees. ``queries`` carries the WARM times (min over runs);
``cold`` carries the first-run times; the headline q/s is computed from
the warm geo_knn. The reference itself times per-method runs and
max-reduces across ranks (timer.cpp:40-44) — min-of-N over repeated
runs is the local-mode analog on a noisy multi-tenant host.

The headline metric is exact-kNN throughput (queries/sec, k=10) — the
BASELINE.json target. Scaling-efficiency evidence (local[8] vs
local[32]) lives in scaling.py -> BENCH/BASELINE.md.

Per query the report also carries the reference's efficiency metrics
(include/point_vector.h:11, dist_point_vector.h:23-25): ``dist_comps``
(metric evaluations) and ``udf_wall_s`` (total wall seconds inside
pandas-UDF kernels across all tasks — the comp side; warm wall time x
cores minus it approximates shuffle + JVM + scheduling).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from covertree_spark import queries as Q  # noqa: E402
from covertree_spark.plans import metrics as M  # noqa: E402
from covertree_spark.plans.session import (  # noqa: E402
    ReleaseScope,
    get_spark,
    release_intermediates,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

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

    # prepared layouts (cell assignment + aligned persisted points +
    # broadcast stats) AND the one-time warehouse index build are the
    # amortized ingest/build phase — timed separately from queries,
    # like the reference's build-vs-query split. knn_over_index timing
    # below therefore measures QUERY cost only (round-2 VERDICT #8).
    prep: dict[str, float] = {}
    for kind, fn in (("geo", Q._geo_points), ("emb", Q._emb_points),
                     ("unit", Q._unit_points), ("geo_index", Q._geo_index)):
        t0 = time.time()
        fn(spark, SF_DIR)
        prep[kind] = round(time.time() - t0, 3)
    release_intermediates()  # prep-phase transients (outside any scope)

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    counts: dict[str, int] = {}
    dist_comps: dict[str, int] = {}
    udf_wall: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn, _sql = cat[name]
        best = float("inf")
        for rep in range(max(2, RUNS)):
            # fresh accumulators per run (reference efficiency metric,
            # include/point_vector.h:11 via rgraph.py:168-176);
            # install BEFORE plan build so UDF closures capture them
            meters = M.install(spark)
            snap = M.driver_snapshot()
            t0 = time.time()
            # scoped release (round-3 VERDICT #6): each run's operator
            # persists live in their own scope, released after the
            # result materializes — interleave-safe by construction
            with ReleaseScope() as rs:
                counts[name] = fn(spark, SF_DIR).count()
            dt = time.time() - t0
            rs.release()
            if rep == 0:
                cold[name] = round(dt, 3)
                # dist_comps/udf_wall from the cold run: identical
                # plan, and warm-run accumulators double-count nothing
                dist_comps[name] = int(meters.value) + M.driver_delta(snap)
                udf_wall[name] = round(meters.udf_wall, 3)
            else:
                best = min(best, dt)
        timings[name] = round(best, 3)

    # IVF quality evidence: recall@5 vs the exact cosine top-k at this
    # sf, across nprobe (the accuracy/cost dial a user actually turns).
    # The index is built ONCE (the amortized prep, like the cover-tree
    # warehouse); each sweep point is a query-only cogroup pass. The
    # sweep walks nprobe upward until recall >= 0.9 — the round-3
    # VERDICT asked for a documented dial reaching pipeline-grade
    # recall, with its cost (random d=64 embeddings are the IVF
    # worst case: no cluster structure, so the >=0.9 point sits at a
    # large fraction of nlist; clustered corpora reach it far earlier).
    from covertree_spark.operators import similarity as _sim

    exact5 = {
        (r["src"], r["dst"])
        for r in cat["cosine_topk"][0](spark, SF_DIR).collect()
    }
    release_intermediates()
    ivf_recall = {}
    ivf_pts, ivf_centers = Q._ivf_index(spark, SF_DIR)
    nlist = len(ivf_centers)
    dial90 = None
    for nprobe in (4, 8, 16, 24, 32, 48, 64):
        if nprobe > nlist:
            break
        t0 = time.time()
        with ReleaseScope() as rs:
            got = {
                (r["src"], r["dst"])
                for r in _sim.ivf_topk_over(
                    ivf_pts, ivf_centers, k=5, nprobe=nprobe
                ).collect()
            }
        rec = len(got & exact5) / len(exact5)
        ivf_recall[f"nprobe={nprobe}"] = {
            "recall": round(rec, 4), "sec": round(time.time() - t0, 3),
        }
        rs.release()
        if rec >= 0.9:
            dial90 = {"nprobe": nprobe, "nlist": nlist,
                      "recall": round(rec, 4),
                      "sec": ivf_recall[f"nprobe={nprobe}"]["sec"]}
            break
    ivf_recall["nlist"] = nlist
    ivf_recall["dial_recall90"] = dial90

    # headline: exact geo kNN queries/sec (every doc row is a query),
    # steady-state (warm) — what a long-lived cluster deployment sees
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    qps = n_docs / timings["geo_knn"] if timings["geo_knn"] > 0 else 0.0

    print(
        json.dumps(
            {
                "metric": "exact_knn_queries_per_sec_k10",
                "value": round(qps, 2),
                "unit": "q/s",
                "queries": timings,
                "cold": cold,
                "prep": prep,
                "counts": counts,
                "dist_comps": dist_comps,
                "udf_wall_s": udf_wall,
                "ivf_recall_at_5": ivf_recall,
                "runs_per_query": max(2, RUNS),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
