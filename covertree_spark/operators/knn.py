"""Exact kNN — the BASELINE-required extension (absent from the
reference, SURVEY.md §2.9).

Two-phase plan (BASELINE north_star: "broadcast H3 cell-cover pruning,
then vectorized pandas/Arrow UDF distance batches against per-
partition cover trees"):

  phase 1 (mapInPandas, stats broadcast): for each query q compute
    per-cell bounds lb_c = d(q, centroid_c) - circum_c and
    ub_c = d(q, centroid_c) + circum_c; take cells in lb order until
    the cumulative count >= k+1; ub = max ub over that prefix bounds
    the true kth distance; candidate cells = {c : lb_c <= ub}.
    Emits (cell, qid, vec, rq=ub) — the cell-cover prune.

  phase 2 (grouped_apply, ONE repartitionByRange shuffle): per cell,
    build the cover tree over home points, run a radius query at each
    query's rq, keep the k best per query locally.

  merge: global top-k per query by (dist, id) via a window — exact
    because every point closer than the kth distance lives in a
    candidate cell (lb_c <= d <= ub).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..core import covertree as ct
from ..plans.grouped import grouped_apply
from ..sources.tables import vec_matrix
from .partition import CellStats, cell_stats

CAND_SCHEMA = "cell bigint, qid bigint, vec array<double>, rq double"
PART_SCHEMA = "qid bigint, nid bigint, dist double"


def knn_self_join(
    points: DataFrame,
    k: int,
    d: int,
    cover: float = ct.DEFAULT_COVER,
    leaf_size: int = ct.DEFAULT_LEAF_SIZE,
    strategy: str = "range",
    cell_col: str = "cell",
    fine_col: str | None = None,
    queries: DataFrame | None = None,
    brute_cutoff: int = 1024,
) -> DataFrame:
    """Exact kNN of every query against ``points`` (self-join by
    default: queries = points, self-pairs excluded). Returns
    (src, dst, rank, dist) with rank 1..k ordered by (dist, dst)."""
    spark = points.sparkSession
    points = points.persist()  # scanned by stats (2x), homes, (queries)
    stats = cell_stats(points, d, cell_col, fine_col)
    stats_bc = spark.sparkContext.broadcast(stats)
    nparts = max(1, min(int(spark.conf.get("spark.sql.shuffle.partitions")),
                        len(stats.partition_cells)))
    qdf = queries if queries is not None else points
    self_join = queries is None
    need = k + 1 if self_join else k  # +1 absorbs the self-hit

    def phase1(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        st: CellStats = stats_bc.value
        order_counts = st.counts
        for pdf in batches:
            if pdf.empty:
                continue
            Q = vec_matrix(pdf)
            from ..core.covertree import pairwise_sq_dists

            dc = np.sqrt(pairwise_sq_dists(Q, st.centroids))
            lb = np.maximum(dc - st.circumradii[None, :], 0.0)
            ub = dc + st.circumradii[None, :]
            # per query: cells in lb order until cumulative count >= need
            ordc = np.argsort(lb, axis=1, kind="stable")
            counts_sorted = order_counts[ordc]
            cum = np.cumsum(counts_sorted, axis=1)
            # index of first prefix position reaching `need`
            reach = cum >= min(need, int(order_counts.sum()))
            cut = reach.argmax(axis=1)  # first True per row
            prefix_mask = np.arange(lb.shape[1])[None, :] <= cut[:, None]
            ub_sorted = np.take_along_axis(ub, ordc, axis=1)
            ub_k = np.where(prefix_mask, ub_sorted, -np.inf).max(axis=1)
            # SAFETY MARGIN: ub/lb carry ~1e-15 relative float noise; a
            # true kth neighbor can sit exactly AT the bound. Inflate by
            # 1e-9 relative — candidates become a strict superset, and
            # the final merge ranks on exact distances, so the result
            # is unchanged except that boundary misses become impossible.
            ub_k = ub_k * (1.0 + 1e-9)
            cand = lb <= ub_k[:, None]
            qi, ej = np.nonzero(cand)
            # dedupe (query, partition-cell): several fine stats entries
            # can map to one coarse cell
            coarse = st.cell_ids
            stride = int(coarse.max()) + 1 if len(coarse) else 1
            key = qi.astype(np.int64) * stride + coarse[ej]
            uk = np.unique(key)
            qi2 = uk // stride
            tgt = uk % stride
            yield pd.DataFrame(
                {
                    "cell": tgt,
                    "qid": pdf["id"].to_numpy()[qi2],
                    "vec": pdf["vec"].to_numpy()[qi2],
                    "rq": ub_k[qi2],
                }
            )

    candidates = qdf.select("id", "vec").mapInPandas(phase1, schema=CAND_SCHEMA)

    home = points.select(F.col(cell_col).alias("cell"), "id", "vec")
    # tag: home rows carry qid=-1 marker via union-by-shape
    tagged_home = home.select(
        "cell", F.col("id").alias("qid"), "vec", F.lit(float("nan")).alias("rq"),
        F.lit(False).alias("is_query"),
    )
    tagged_q = candidates.select("cell", "qid", "vec", "rq", F.lit(True).alias("is_query"))
    assigned = tagged_home.unionByName(tagged_q)

    def per_cell(_cell, pdf: pd.DataFrame) -> pd.DataFrame:
        homes = pdf[~pdf["is_query"]]
        qs = pdf[pdf["is_query"]]
        if homes.empty or qs.empty:
            return pd.DataFrame({"qid": [], "nid": [], "dist": []}).astype(
                {"qid": "int64", "nid": "int64", "dist": "float64"}
            )
        H = vec_matrix(homes)
        hid = homes["qid"].to_numpy()  # home rows carry their point id in qid
        Q = vec_matrix(qs)
        qids = qs["qid"].to_numpy()
        rq = qs["rq"].to_numpy()
        if len(H) <= brute_cutoff:
            d2 = ct.pairwise_sq_dists(Q, H)
            qi, pi = np.nonzero(d2 <= (rq * rq)[:, None])
            di = np.sqrt(d2[qi, pi])
        else:
            tree = ct.build(H, cover=cover, leaf_size=leaf_size)
            qi, pi, di = ct.radius_query(tree, H, Q, rq)
        src = qids[qi]
        dst = hid[pi]
        if self_join:
            keep = src != dst
            src, dst, di = src[keep], dst[keep], di[keep]
            qi = qi[keep]
        # local top-k per query (reduces shuffle width)
        qloc, ploc, dloc = ct.topk_per_query(qi, np.arange(len(dst)), di, k,
                                             tiebreak_ids=dst)
        return pd.DataFrame({"qid": src[ploc], "nid": dst[ploc], "dist": di[ploc]})

    parts = grouped_apply(assigned, "cell", per_cell, PART_SCHEMA, strategy=strategy,
                          num_partitions=nparts)
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("nid").asc())
    return (
        parts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("src"),
            F.col("nid").alias("dst"),
            F.col("rank"),
            F.col("dist"),
        )
    )
