#!/usr/bin/env python
"""Scaling-efficiency evidence for BASELINE's two-cluster-size rule.

No real cluster exists in this sandbox, so (per the driver protocol)
the SAME job runs at two parallelism levels — local[8] (N) and
local[32] (4N) — on the SAME deterministic input, and we report
per-phase throughput plus efficiency = (T_N / T_4N) / 4 to
BENCH/BASELINE.md. Phases measured (the BASELINE targets):

  build : pages -> points -> cells -> per-cell cover-tree construction
          (persisted CSR index)
  knn   : exact k=10 kNN self-join over all points (count forces the
          full two-phase plan incl. the top-k merge shuffle)

Each level runs in a fresh subprocess (a JVM's local[N] is fixed at
startup). Outputs are checked identical across levels (parallelism
invariance — the reference's test.sh property).

Usage: python scaling.py [--n 400000] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))

WORKER = r'''
import json, os, sys, time
sys.path.insert(0, {repo!r})
from covertree_spark.plans.session import get_spark
from covertree_spark.sources.pages import blob_points
from covertree_spark.operators.partition import assign_voronoi_cells, voronoi_centers
from covertree_spark.operators.index import build_trees
from covertree_spark.operators.knn import knn_self_join
import pyspark.sql.functions as F

cpus = {cpus}
n = {n}
n_clusters = {res}  # reused CLI slot: number of blob clusters / cells
d = 32
out = {out!r}
spark = get_spark(app_name=f"scaling-{{cpus}}", cpus=cpus,
                  shuffle_partitions=max(cpus * 2, 16))
spark.sparkContext.setLogLevel("ERROR")

pages_path = {pages_path!r}
if not os.path.exists(pages_path + "/_SUCCESS"):
    blob_points(spark, n, d=d, n_clusters=n_clusters, partitions=64
                ).write.mode("overwrite").parquet(pages_path)

raw = spark.read.parquet(pages_path).select("id", "vec")
centers = voronoi_centers(raw, k=n_clusters, sample_size=8192)
pts = assign_voronoi_cells(raw, centers).persist()
npts = pts.count()  # materialize inputs BEFORE timing

# min-of-3 per phase: the host is multi-tenant and run-to-run noise
# reaches 50%; the minimum is the interference-free estimate
t_build = float("inf")
for rep in range(3):
    t0 = time.time()
    trees = build_trees(pts, d=d)
    trees.write.mode("overwrite").parquet(out + f"/trees_{{cpus}}")
    t_build = min(t_build, time.time() - t0)

t_knn = float("inf")
cksum = None
for rep in range(3):
    t0 = time.time()
    knn = knn_self_join(pts, k=10, d=d, brute_cutoff=8192)
    cksum = knn.agg(F.sum(F.col("src") * 13 + F.col("dst") * 7 + F.col("rank")).alias("s"),
                    F.count("*").alias("c")).collect()[0]
    t_knn = min(t_knn, time.time() - t0)

print(json.dumps({{"cpus": cpus, "n": npts, "t_build": t_build, "t_knn": t_knn,
                   "knn_rows": cksum["c"], "knn_checksum": int(cksum["s"])}}))
'''


def run_level(cpus: int, n: int, res: int, pages_path: str, out: str) -> dict:
    code = WORKER.format(repo=REPO, cpus=cpus, n=n, res=res, out=out,
                         pages_path=pages_path)
    env = dict(os.environ, OMP_NUM_THREADS="1", OPENBLAS_NUM_THREADS="1",
               MKL_NUM_THREADS="1")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, timeout=3600)
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-4000:])
        raise RuntimeError(f"level {cpus} failed")
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--res", type=int, default=256, help="blob clusters / Voronoi cells")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    n = 50_000 if args.quick else args.n

    base = "/tmp/covertree_scaling"
    pages_path = f"{base}/blobs_{n}_{args.res}"
    out = f"{base}/out"
    os.makedirs(out, exist_ok=True)

    lo = run_level(8, n, args.res, pages_path, out)
    hi = run_level(32, n, args.res, pages_path, out)
    assert lo["knn_rows"] == hi["knn_rows"], "parallelism variance in rows!"
    assert lo["knn_checksum"] == hi["knn_checksum"], "parallelism variance in values!"

    eff_build = (lo["t_build"] / hi["t_build"]) / 4
    eff_knn = (lo["t_knn"] / hi["t_knn"]) / 4
    report = {
        "n_points": lo["n"],
        "build": {
            "t_local8_s": round(lo["t_build"], 2),
            "t_local32_s": round(hi["t_build"], 2),
            "pts_per_s_local8": round(lo["n"] / lo["t_build"], 1),
            "pts_per_s_local32": round(hi["n"] / hi["t_build"], 1),
            "efficiency_8_to_32": round(eff_build, 3),
        },
        "knn": {
            "t_local8_s": round(lo["t_knn"], 2),
            "t_local32_s": round(hi["t_knn"], 2),
            "qps_local8": round(lo["n"] / lo["t_knn"], 1),
            "qps_local32": round(hi["n"] / hi["t_knn"], 1),
            "efficiency_8_to_32": round(eff_knn, 3),
        },
        "outputs_identical_across_levels": True,
    }
    print(json.dumps(report, indent=2))

    md = f"""# BENCH/BASELINE.md — scaling-efficiency evidence

BASELINE north_rule: ">= 0.8 throughput scaling efficiency from N to 4N
executors, on both tree construction and batched kNN". No real cluster
exists in this sandbox, so the SAME job ran at local[8] (N) and
local[32] (4N) on identical input ({lo["n"]:,} clustered d=32 blob\npoints (the reference benchmark shape, ptgen.py/make_blobs), deterministic\ngenerator seed 42; BLAS pinned to 1 thread).

| phase | local[8] | local[32] | throughput@8 | throughput@32 | efficiency (T8/T32)/4 |
|---|---|---|---|---|---|
| cover-tree build ({args.res} Voronoi cells, per-cell CSR persisted) | {lo["t_build"]:.2f}s | {hi["t_build"]:.2f}s | {lo["n"]/lo["t_build"]:.0f} pts/s | {hi["n"]/hi["t_build"]:.0f} pts/s | **{eff_build:.3f}** |
| exact kNN k=10 (two-phase, all {lo["n"]:,} queries) | {lo["t_knn"]:.2f}s | {hi["t_knn"]:.2f}s | {lo["n"]/lo["t_knn"]:.0f} q/s | {hi["n"]/hi["t_knn"]:.0f} q/s | **{eff_knn:.3f}** |

Outputs verified identical across parallelism levels (row count +
value checksum) — the reference's cross-rank equivalence property
(/root/reference/test.sh:10-23).

Reproduce: `python scaling.py --n {n}`
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
