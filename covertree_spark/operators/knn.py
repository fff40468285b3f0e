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
        # keep the (queries x entries) working matrices CACHE-RESIDENT
        # (~2MB): on shared-bandwidth hosts, streaming matrices through
        # memory serializes all workers; cache-sized blocks scale.
        chunk = max(64, (1 << 21) // (8 * max(1, len(st.cell_ids))))
        for whole in batches:
            if whole.empty:
                continue
            for s in range(0, len(whole), chunk):
                pdf = whole.iloc[s : s + chunk]
                yield from _phase1_chunk(st, order_counts, pdf)

    def _phase1_chunk(st, order_counts, pdf):
            Q = vec_matrix(pdf)
            from ..core.covertree import pairwise_sq_dists

            # ONE GEMM over (queries x entries); everything exact is
            # computed only on the tiny per-query selection. The big
            # matrix is touched O(1) more times (argpartition + final
            # compare) — this code path is memory-bandwidth-critical.
            d2 = pairwise_sq_dists(Q, st.centroids)
            circ = st.circumradii
            E = d2.shape[1]
            total = int(order_counts.sum())
            goal = min(need, total)
            # Select a covering set per query: entries in d2 order
            # until counts reach `goal`. (Any covering set yields a
            # VALID upper bound ub = max over it of dc+circ; d2 order
            # is a cheap proxy for lb order.)
            m = min(E, max(8, 4 * max(1, need // max(1, int(order_counts.min())))))
            while True:
                part = (
                    np.argpartition(d2, m - 1, axis=1)[:, :m] if m < E
                    else np.broadcast_to(np.arange(E), d2.shape).copy()
                )
                d2_part = np.take_along_axis(d2, part, axis=1)
                ord2 = np.argsort(d2_part, axis=1, kind="stable")
                sorted_idx = np.take_along_axis(part, ord2, axis=1)
                cum = np.cumsum(order_counts[sorted_idx], axis=1)
                reach = cum >= goal
                if bool(reach.any(axis=1).all()) or m >= E:
                    break
                m = min(E, m * 4)
            cut = reach.argmax(axis=1)  # first True per row
            cut = np.where(reach.any(axis=1), cut, m - 1)
            prefix_mask = np.arange(m)[None, :] <= cut[:, None]
            dc_sel = np.sqrt(np.take_along_axis(d2_part, ord2, axis=1))
            ub_sel = dc_sel + circ[sorted_idx]
            ub_k = np.where(prefix_mask, ub_sel, -np.inf).max(axis=1)
            # SAFETY MARGIN: bounds carry ~1e-15 relative float noise; a
            # true kth neighbor can sit exactly AT the bound. Inflate by
            # 1e-9 relative — candidates become a strict superset, and
            # the final merge ranks on exact distances, so the result
            # is unchanged except that boundary misses become impossible.
            ub_k = ub_k * (1.0 + 1e-9)
            # candidate entries: lb <= ub_k  <=>  d2 <= (ub_k + circ)^2
            thr = ub_k[:, None] + circ[None, :]
            cand = d2 <= thr * thr
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
