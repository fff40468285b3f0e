"""Edge-set sink + summary conventions.

The reference materializes the join result as a CSR graph and (a)
counts edges with an implicit-self-loop convention — ``num_edges =
sum(neighbor counts) + num_vertices`` because "self-loops always
exist" (/root/reference/include/dist_graph.h:20-26) — and (b) writes a
deterministic edge file: header ``% nv nv ne`` then 1-based ``src
dst`` lines including self-loops, sorted by construction
(/root/reference/src/dist_graph.cpp:23-75).

Spark-first mapping: the durable sink is a parquet edge table plus a
``_summary.json`` sidecar (counts are one distributed agg, the file
layout is whatever the shuffle produced — edge SETS are compared, not
bytes, exactly like the reference's rank-dependent file order). The
ASCII format is kept as a small-scale export for byte-level parity
with reference tooling.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def edge_summary(edges: DataFrame, num_vertices: int) -> dict:
    """{'num_vertices', 'num_edges', 'num_edges_with_self_loops'} —
    one count() job; the self-loop convention is the reference's
    count-time constant, not stored rows."""
    e = edges.count()
    return {
        "num_vertices": int(num_vertices),
        "num_edges": int(e),
        "num_edges_with_self_loops": int(e + num_vertices),
    }


def write_edges(edges: DataFrame, path: str, num_vertices: int) -> dict:
    """Durable sink: parquet edge table + _summary.json sidecar.
    Distributed write; returns the summary."""
    edges.select("src", "dst").write.mode("overwrite").parquet(path)
    spark = edges.sparkSession
    out = spark.read.parquet(path)
    summary = edge_summary(out, num_vertices)
    with open(os.path.join(path, "_summary.json"), "w") as f:
        json.dump(summary, f)
    return summary


def read_edges(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    with open(os.path.join(path, "_summary.json")) as f:
        summary = json.load(f)
    return spark.read.parquet(path), summary


def write_edge_file(edges: DataFrame, num_vertices: int, path: str,
                    id_offset: int = 0) -> None:
    """Reference-format ASCII export (small-scale parity tool): header
    ``% nv nv ne`` with ne INCLUDING the per-vertex self-loops, then
    1-based ``src dst`` lines — self-loops emitted per vertex id in
    [id_offset, id_offset + num_vertices), matching
    dist_graph.cpp:50-74. Deterministic: rows sorted by (src, dst).
    Collects to the driver — use write_edges for real scale."""
    rows = edges.select("src", "dst").distinct().orderBy("src", "dst").collect()
    pairs = [(int(r["src"]) - id_offset + 1, int(r["dst"]) - id_offset + 1)
             for r in rows]
    pairs += [(v + 1, v + 1) for v in range(num_vertices)]  # self-loops
    pairs.sort()
    with open(path, "w") as f:
        f.write(f"% {num_vertices} {num_vertices} {len(pairs)}\n")
        for s, t in pairs:
            f.write(f"{s} {t}\n")


def num_edges_invariant(edges: DataFrame) -> DataFrame:
    """Degree histogram (src, degree) — the reference's per-vertex
    neighbor counts (dist_graph.h:16-19) as a DataFrame agg."""
    return edges.groupBy("src").agg(F.count("*").alias("degree"))
