"""Global partitioning: cell assignment, per-cell statistics, ghost
replication, Voronoi centers, hot-cell splitting.

Replaces the reference's rank decomposition pipeline
(/root/reference/src/dist_point_vector.cpp:455-832) with DataFrame
stages:

  * ``assign_cells``     — data-independent H3/S2-style cell id (geo)
  * ``voronoi_centers``  — data-adaptive Gonzalez farthest-point
                           centers as iterative DataFrame aggregations
                           (reference O1, :455-563)
  * ``split_hot_cells``  — adaptive skew control: cells above a row
                           threshold re-encode at a finer resolution
                           (replaces LPT assignment + work stealing,
                           reference O3/O6)
  * ``cell_stats``       — per-cell (count, centroid, circumradius),
                           broadcast; the triangle-inequality bounds
                           ``|d(q,centroid)| ± circumradius`` drive both
                           ghost replication and kNN cell pruning —
                           valid in ANY metric space, so geo cells and
                           Voronoi cells share one code path
  * ``replicate_ghosts`` — boundary replication: point p copies to
                           every cell whose lower bound <= r
                           (reference O2 ghost rule, :565-625,
                           generalized from "dist to center + 2r" to
                           the exact per-cell bound)

All stats are pure functions of the data (never of the partitioning),
so results are invariant to parallelism — the reference's test.sh
cross-rank-count property.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core import cells as cellcodec
from ..sources.tables import vec_matrix


@dataclass
class CellStats:
    """Broadcast-able per-cell summary (small: O(#cells))."""

    cell_ids: np.ndarray  # (C,) int64, sorted
    counts: np.ndarray  # (C,) int64
    centroids: np.ndarray  # (C, d) float64
    circumradii: np.ndarray  # (C,) float64

    def lower_bounds(self, Q: np.ndarray) -> np.ndarray:
        """(nq, C) lower bound on d(q, any point of cell c)."""
        from ..core.covertree import pairwise_sq_dists

        d = np.sqrt(pairwise_sq_dists(Q, self.centroids))
        return np.maximum(d - self.circumradii[None, :], 0.0)

    def upper_bounds(self, Q: np.ndarray) -> np.ndarray:
        """(nq, C) upper bound on d(q, every point of cell c)."""
        from ..core.covertree import pairwise_sq_dists

        d = np.sqrt(pairwise_sq_dists(Q, self.centroids))
        return d + self.circumradii[None, :]


def assign_cells(points: DataFrame, res: int, lon_col="lon", lat_col="lat") -> DataFrame:
    """Add the data-independent cell id column (JVM-side expression —
    same SQL text as the oracle)."""
    expr = cellcodec.sql_cell_expr(lon_col, lat_col, res)
    return points.withColumn("cell", F.expr(expr))


def assign_voronoi_cells(points: DataFrame, centers: np.ndarray) -> DataFrame:
    """cell = index of nearest Voronoi center (ties -> lowest index).
    Vectorized argmin against the broadcast center block."""
    C = centers.astype(np.float64)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..core.covertree import pairwise_sq_dists

        for pdf in batches:
            if pdf.empty:
                continue
            X = vec_matrix(pdf)
            d2 = pairwise_sq_dists(X, C)
            out = pdf[["id", "vec"]].copy()
            out["cell"] = d2.argmin(axis=1).astype(np.int64)
            yield out

    schema = "id bigint, vec array<double>, cell bigint"
    return points.mapInPandas(assign, schema=schema)


def voronoi_centers(points: DataFrame, k: int) -> np.ndarray:
    """Gonzalez greedy farthest-point centers as k iterative DataFrame
    aggregations (reference O1, the MPI argmax allreduce ->
    ``max_by(struct(dist,id,vec))``). Deterministic: seeded at the
    min-id point; distance ties broken by larger id (max_by struct
    ordering). Returns (k, d) float64."""
    pts = points.select("id", "vec").persist()
    try:
        first = pts.orderBy("id").limit(1).collect()[0]
        centers = [np.asarray(first["vec"], dtype=np.float64)]
        d = len(centers[0])
        dist_expr = None
        cur = pts.withColumn("mind", F.lit(float("inf")))
        for _ in range(k - 1):
            c = centers[-1]
            dist_new = F.sqrt(
                sum(
                    (F.col("vec")[i] - F.lit(float(c[i])))
                    * (F.col("vec")[i] - F.lit(float(c[i])))
                    for i in range(d)
                )
            )
            cur = cur.withColumn("mind", F.least(F.col("mind"), dist_new))
            far = cur.agg(
                F.max_by(F.struct("mind", "id", "vec"), F.struct("mind", "id")).alias("m")
            ).collect()[0]["m"]
            centers.append(np.asarray(far["vec"], dtype=np.float64))
            cur = cur.persist()
        return np.stack(centers)
    finally:
        pts.unpersist()


def cell_counts(points: DataFrame) -> DataFrame:
    """The load-bearing aggregate (reference A3): drives skew splits."""
    return points.groupBy("cell").agg(F.count("*").alias("cnt"))


def split_hot_cells(
    points: DataFrame,
    res: int,
    max_cell_size: int,
    delta: int = 2,
    lon_col="lon",
    lat_col="lat",
) -> DataFrame:
    """Re-encode rows of hot cells at resolution ``res+delta``.

    The composite key stays globally unique by offsetting fine cells
    past the coarse id space: ``pcell = n_coarse^2 + fine_cell``.
    Decision is a tiny driver-side collect of the cell histogram —
    deterministic given the data."""
    counts = cell_counts(points)
    hot = [r["cell"] for r in counts.filter(F.col("cnt") > max_cell_size).collect()]
    if not hot:
        return points.withColumn("pcell", F.col("cell"))
    offset = cellcodec.num_cells(res)
    fine_expr = cellcodec.sql_cell_expr(lon_col, lat_col, res + delta)
    return points.withColumn(
        "pcell",
        F.when(
            F.col("cell").isin([int(c) for c in hot]),
            F.expr(fine_expr) + F.lit(offset),
        ).otherwise(F.col("cell")),
    )


def cell_stats(points: DataFrame, d: int, cell_col: str = "cell") -> CellStats:
    """Two-pass per-cell stats, all JVM-side partial aggregation:
    pass 1 count + per-dimension sums -> centroid; pass 2 max distance
    to centroid -> circumradius. Result is tiny (O(#cells)) and gets
    broadcast to every task."""
    sums = points.groupBy(cell_col).agg(
        F.count("*").alias("cnt"),
        *[F.sum(F.col("vec")[i]).alias(f"s{i}") for i in range(d)],
    )
    cent = sums.select(
        cell_col,
        "cnt",
        F.array(*[F.col(f"s{i}") / F.col("cnt") for i in range(d)]).alias("centroid"),
    )
    joined = points.join(F.broadcast(cent), cell_col)
    dist2 = sum(
        (F.col("vec")[i] - F.col("centroid")[i]) * (F.col("vec")[i] - F.col("centroid")[i])
        for i in range(d)
    )
    radii = (
        joined.groupBy(cell_col)
        .agg(F.max(dist2).alias("r2"))
        .select(cell_col, F.sqrt(F.col("r2")).alias("circumradius"))
    )
    pdf = (
        cent.join(radii, cell_col)
        .orderBy(cell_col)
        .toPandas()
    )
    return CellStats(
        cell_ids=pdf[cell_col].to_numpy(dtype=np.int64),
        counts=pdf["cnt"].to_numpy(dtype=np.int64),
        centroids=np.stack(pdf["centroid"].to_numpy()).astype(np.float64),
        circumradii=pdf["circumradius"].to_numpy(dtype=np.float64),
    )


def replicate_ghosts(
    points: DataFrame,
    stats_bc,
    radius: float,
    cell_col: str = "cell",
) -> DataFrame:
    """Boundary replication: emit (cell, id, vec, is_ghost) rows — the
    home row plus one ghost row per foreign cell whose lower bound
    <= radius. Exactness: if d(p,q) <= r and q is home in cell c, then
    lb_c(p) <= d(p,q) <= r, so p is replicated into c (reference ghost
    guarantee, dist_point_vector.cpp:583-596, with the tighter
    centroid/circumradius bound)."""

    def dilate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        st: CellStats = stats_bc.value
        cell_index = {int(c): j for j, c in enumerate(st.cell_ids)}
        for pdf in batches:
            if pdf.empty:
                continue
            X = vec_matrix(pdf)
            lb = st.lower_bounds(X)  # (n, C)
            home = pdf[cell_col].to_numpy()
            home_j = np.asarray([cell_index[int(c)] for c in home])
            n = len(pdf)
            cand = lb <= radius
            cand[np.arange(n), home_j] = False  # home handled separately
            pi, cj = np.nonzero(cand)
            out_home = pd.DataFrame(
                {
                    "cell": home.astype(np.int64),
                    "id": pdf["id"].to_numpy(),
                    "vec": pdf["vec"].to_numpy(),
                    "is_ghost": np.zeros(n, dtype=bool),
                }
            )
            if len(pi):
                out_ghost = pd.DataFrame(
                    {
                        "cell": st.cell_ids[cj],
                        "id": pdf["id"].to_numpy()[pi],
                        "vec": pdf["vec"].to_numpy()[pi],
                        "is_ghost": np.ones(len(pi), dtype=bool),
                    }
                )
                yield pd.concat([out_home, out_ghost], ignore_index=True)
            else:
                yield out_home

    schema = "cell bigint, id bigint, vec array<double>, is_ghost boolean"
    return points.mapInPandas(dilate, schema=schema)
