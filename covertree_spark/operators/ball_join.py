"""Epsilon-ball self-join — the reference's headline query.

Semantics: ``points p JOIN points q ON dist(p.vec, q.vec) <= r AND
p.id != q.id`` (both directions emitted, matching the reference's
symmetric edge set, /root/reference/src/dist_graph.cpp:12-21).

Physical plan (the reference's cvor pipeline re-expressed,
/root/reference/src/dist_point_vector.cpp:962-996):

  points(id, vec, cell)
    -> cell_stats (2 JVM aggs)        [broadcast]
    -> replicate_ghosts (mapInPandas) [explode candidate cells]
    -> grouped_apply on cell          [ONE repartitionByRange shuffle]
         per cell: build cover tree over home points,
                   batched radius query for home+ghost rows
    -> edges(src, dst, dist)

Every qualifying ordered pair is found exactly once — in the cell
where its dst is home — so no dedup stage is needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core import covertree as ct
from ..plans.grouped import grouped_apply
from ..plans.session import mark_releasable
from ..sources.tables import vec_matrix
from .partition import CellStats, cell_stats, replicate_ghosts

EDGE_SCHEMA = "src bigint, dst bigint, dist double"


def ball_self_join(
    points: DataFrame,
    radius: float,
    d: int,
    cover: float = ct.DEFAULT_COVER,
    leaf_size: int = ct.DEFAULT_LEAF_SIZE,
    strategy: str = "cogroup",
    cell_col: str = "cell",
    fine_col: str | None = None,
    brute_cutoff: int = 1024,
    stats: CellStats | None = None,
) -> DataFrame:
    """points must carry (id, vec, cell). Returns (src, dst, dist),
    src != dst, both directions.

    ``strategy``: "cogroup" (default; A/B'd fastest at sf0.1 — 0.9-1.1s
    vs 1.0-1.1 hash_shuffle, 1.45-1.55 range) shuffles ONLY ghost rows
    against the aligned home layout; the others push home+ghosts
    through one explicit repartition.

    Caching contract: with ``stats=None`` the input is persisted and
    registered releasable (see knn_self_join docstring); passing
    precomputed stats skips both."""
    spark = points.sparkSession
    if stats is None:
        # scanned by stats (2x), ghosts, homes
        points = mark_releasable(points.persist())
        stats = cell_stats(points, d, cell_col, fine_col)
    stats_bc = spark.sparkContext.broadcast(stats)
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def _edges_kernel(H, hid, Q, qid) -> pd.DataFrame:
        if len(H) <= brute_cutoff:
            # small build side: a BLAS matrix pass beats tree descent
            # (and in high-d with r near the distance concentration the
            # tree cannot prune anyway — same edge set either way)
            d2 = ct.pairwise_sq_dists(Q, H)
            qi, pi = np.nonzero(d2 <= radius * radius)
            di = np.sqrt(d2[qi, pi])
        else:
            tree = ct.build(H, cover=cover, leaf_size=leaf_size)
            qi, pi, di = ct.radius_query(tree, H, Q, radius)
        src = qid[qi]
        dst = hid[pi]
        keep = src != dst
        return pd.DataFrame({"src": src[keep], "dst": dst[keep], "dist": di[keep]})

    if strategy == "cogroup":
        # ALIGNED HOME SIDE (see knn_self_join): only GHOST rows move
        # through the shuffle; homes are read in place from the
        # persisted hash(cell)-partitioned layout (Exchange elided).
        # Ghost volume is boundary-sized (O(surface), not O(volume)),
        # so at 10^12 rows the per-query shuffle shrinks from the full
        # table to the replication halo.
        from ..plans.metrics import counted_fn

        ghosts = replicate_ghosts(
            points, stats_bc, radius, cell_col, ghosts_only=True
        )
        home_g = points.select(F.col(cell_col).alias("cell"), "id", "vec")

        def per_cell_cg(ghost_pdf: pd.DataFrame, home_pdf: pd.DataFrame) -> pd.DataFrame:
            if home_pdf.empty:
                return pd.DataFrame({"src": [], "dst": [], "dist": []}).astype(
                    {"src": "int64", "dst": "int64", "dist": "float64"}
                )
            H = vec_matrix(home_pdf)
            hid = home_pdf["id"].to_numpy()
            if ghost_pdf.empty:
                Q, qid = H, hid
            else:
                G = vec_matrix(ghost_pdf)
                Q = np.concatenate([H, G])
                qid = np.concatenate([hid, ghost_pdf["id"].to_numpy()])
            return _edges_kernel(H, hid, Q, qid)

        return (
            ghosts.groupby("cell")
            .cogroup(home_g.groupby("cell"))
            .applyInPandas(counted_fn(per_cell_cg), schema=EDGE_SCHEMA)
        )

    assigned = replicate_ghosts(points, stats_bc, radius, cell_col)

    def per_cell(_cell, pdf: pd.DataFrame) -> pd.DataFrame:
        home = pdf[~pdf["is_ghost"]]
        if home.empty:
            return pd.DataFrame({"src": [], "dst": [], "dist": []}).astype(
                {"src": "int64", "dst": "int64", "dist": "float64"}
            )
        H = vec_matrix(home)
        hid = home["id"].to_numpy()
        Q = vec_matrix(pdf)
        qid = pdf["id"].to_numpy()
        return _edges_kernel(H, hid, Q, qid)

    return grouped_apply(assigned, "cell", per_cell, EDGE_SCHEMA, strategy=strategy,
                         num_partitions=nparts)


def brute_ball_join(points: DataFrame, radius: float) -> DataFrame:
    """Distributed brute-force oracle (reference 'bf' method,
    dist_point_vector.cpp:194-222): block-nested-loop via a broadcast
    of the full point set against streamed batches. Only for
    small-scale ground-truth checks."""
    spark = points.sparkSession
    pdf = points.select("id", "vec").toPandas()
    allX = vec_matrix(pdf)
    all_ids = pdf["id"].to_numpy()
    bc = spark.sparkContext.broadcast((allX, all_ids))

    def scan(batches):
        X, ids = bc.value
        for b in batches:
            if b.empty:
                continue
            Q = vec_matrix(b)
            qids = b["id"].to_numpy()
            d2 = ct.pairwise_sq_dists(Q, X)
            hit = d2 <= radius * radius
            qi, pi = np.nonzero(hit)
            src, dst = qids[qi], ids[pi]
            keep = src != dst
            yield pd.DataFrame(
                {"src": src[keep], "dst": dst[keep], "dist": np.sqrt(d2[hit][keep])}
            )

    from ..plans.metrics import counted_stream

    return points.mapInPandas(counted_stream(scan), schema=EDGE_SCHEMA)
