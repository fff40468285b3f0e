"""Exact DBSCAN over the epsilon-graph — density-based clustering,
the standard upgrade of the single-linkage components the reference's
CSR graphs feed (/root/reference/include/dist_graph.h:20-26; its
``connected_components`` consumer is operators/components.py).

Semantics (Ester et al., KDD'96, exact — no sampling, no grid
approximation):

  core(p)    <=>  |{q : dist(p,q) <= eps}| >= min_pts   (q = p counts,
                  matching the original paper's N_eps(p) and sklearn)
  clusters   =    connected components of the CORE points under
                  eps-adjacency; label = MIN core id in the cluster
                  (deterministic, no tie-break)
  border(p)  =    non-core point with >= 1 core neighbor; assigned the
                  MIN cluster label among its core neighbors
                  (deterministic — sklearn's "first core that claims
                  it" is scan-order-dependent; min is order-free)
  noise      =    everything else, cluster = -1

Output: (id bigint, role bigint, cluster bigint), role 2=core,
1=border, 0=noise — integer-only columns per the repo's exactness
discipline; the only float threshold is eps, which inherits the
epsilon-graph's verified clearance.

Physical plan (Spark-first): the epsilon-graph is the engine's
cogroup-aligned ``ball_self_join`` (candidates-only shuffle, home
Exchange elided); everything after it is key-partitioned integer
relational algebra — a degree aggregate, two semi/anti joins against
the core set, the O(log^2 n) large-star/small-star components, and a
min-aggregate for borders. No broadcast of anything data-sized, no
driver collect, no Python UDF: at 10^12 rows every stage is a
hash-partitioned shuffle on a bigint id, and the dominant cost is the
epsilon-graph itself (O(fringe) candidate bytes, see ball_join.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ball_join import ball_self_join
from .components import connected_components
from .partition import CellStats

ROLE_NOISE, ROLE_BORDER, ROLE_CORE = 0, 1, 2


def dbscan_labels(
    points: DataFrame,
    eps: float,
    min_pts: int,
    d: int,
    stats: CellStats | None = None,
    edges: DataFrame | None = None,
) -> DataFrame:
    """Exact DBSCAN labels for ``points`` (id, vec, cell).

    ``edges``: pass a precomputed symmetric epsilon-graph
    (src, dst, src != dst, both directions) to reuse one ball join
    across consumers; otherwise it is computed here at ``eps``.

    Returns (id, role, cluster) — see module docstring. Every point
    of the input appears exactly once.
    """
    if edges is None:
        edges = ball_self_join(points, eps, d=d, stats=stats)
    # ONE epsilon-graph materialization: three consumers read the edge
    # set (degree agg, core-core subgraph, border min-join) — without
    # the eager persist each re-runs the full ball join (measured 3x
    # the query's distance work at sf0.1). count() materializes before
    # fan-out, the AQE-union persist-race discipline (see knn.py).
    from ..plans.session import mark_releasable

    e = mark_releasable(edges.select("src", "dst").persist())
    n_edges = e.count()
    ids = points.select(F.col("id").cast("bigint").alias("id"))

    # DATA-ADAPTIVE small path (components.py / graph_iter.py
    # discipline): below the bounded-task cutoff the whole
    # degree/core/cluster/border cascade runs in ONE numpy task over
    # the materialized edge arrays — the distributed path's ~6
    # fixed-latency shuffle stages dwarf the arithmetic at bench
    # scale. Identical semantics: same degree rule (self included, so
    # only edge-endpoint vertices can be core when min_pts >= 2 —
    # isolated points have n_eps == 1), same min-id cluster labels
    # (union-find over core-core edges, the labels components.py's
    # small path computes), same min-cluster border rule. Points
    # absent from the edge set flow through the unchanged noise
    # anti-join. min_pts <= 1 would make isolated points core
    # (invisible to the kernel) — that degenerate setting keeps the
    # distributed path.
    from .graph_iter import SMALL_CUTOFF

    if n_edges <= SMALL_CUTOFF and min_pts >= 2:
        import numpy as np
        import pandas as pd

        from .components import _uf_min_labels

        def run(batches):
            blocks = [p for p in batches if not p.empty]
            empty = pd.DataFrame(
                {
                    "id": np.empty(0, np.int64),
                    "role": np.empty(0, np.int64),
                    "cluster": np.empty(0, np.int64),
                }
            )
            if not blocks:
                yield empty
                return
            cur = pd.concat(blocks, ignore_index=True)
            src = cur["src"].to_numpy(np.int64)
            dst = cur["dst"].to_numpy(np.int64)
            vids = np.unique(np.concatenate([src, dst]))
            si = np.searchsorted(vids, src)
            di = np.searchsorted(vids, dst)
            deg = np.bincount(si, minlength=len(vids))
            core = (deg + 1) >= min_pts
            cm = core[si] & core[di]
            cluster = np.full(len(vids), -1, np.int64)
            if cm.any():
                cids, clab = _uf_min_labels(src[cm], dst[cm])
                cluster[np.searchsorted(vids, cids)] = clab
            # singleton cores (no core neighbor) cluster as themselves
            lone = core & (cluster == -1)
            cluster[lone] = vids[lone]
            # borders: non-core src with >= 1 core dst; min core cluster
            bm = (~core[si]) & core[di]
            bcl = np.full(len(vids), np.iinfo(np.int64).max, np.int64)
            np.minimum.at(bcl, si[bm], cluster[di[bm]])
            border = (~core) & (bcl != np.iinfo(np.int64).max)
            out_id = np.concatenate([vids[core], vids[border]])
            out_role = np.concatenate(
                [
                    np.full(int(core.sum()), ROLE_CORE, np.int64),
                    np.full(int(border.sum()), ROLE_BORDER, np.int64),
                ]
            )
            out_cl = np.concatenate([cluster[core], bcl[border]])
            yield pd.DataFrame(
                {"id": out_id, "role": out_role, "cluster": out_cl}
            )

        labeled = mark_releasable(
            e.coalesce(1)
            .mapInPandas(run, schema="id bigint, role bigint, cluster bigint")
            .persist()
        )
        labeled.count()  # one kernel run; anti-join + union both read it
        noise = ids.join(labeled.select("id"), "id", "anti").select(
            "id",
            F.lit(ROLE_NOISE).cast("bigint").alias("role"),
            F.lit(-1).cast("bigint").alias("cluster"),
        )
        return labeled.unionByName(noise)

    # |N_eps(p)| >= min_pts, self included: isolated points have no
    # edge rows, so degree comes from a left join against the graph
    deg = e.groupBy(F.col("src").alias("id")).agg(
        (F.count("*") + F.lit(1)).alias("n_eps")
    )
    # core is read 4x (two semi-joins, the components node set, the
    # border anti-join); persisted it is one id-column aggregate
    core = mark_releasable(
        ids.join(deg, "id", "left")
        .where(F.coalesce("n_eps", F.lit(1)) >= int(min_pts))
        .select("id")
        .persist()
    )

    # clusters: components of the core-core subgraph (cores with no
    # core neighbor still cluster — as singletons — via nodes=core)
    ce = (
        e.join(core.withColumnRenamed("id", "src"), "src", "semi")
        .join(core.withColumnRenamed("id", "dst"), "dst", "semi")
        .select("src", "dst")
    )
    # comp is read 3x (output union, border min-join, noise anti);
    # persisting it caps the components pass at one execution
    comp = mark_releasable(
        connected_components(ce, nodes=core)
        .select("id", F.col("component").alias("cluster"))
        .persist()
    )

    # borders: non-core, >= 1 core neighbor; min core-cluster wins
    border = (
        e.join(core.withColumnRenamed("id", "src"), "src", "anti")
        .join(
            comp.select(
                F.col("id").alias("dst"), F.col("cluster").alias("_c")
            ),
            "dst",
        )
        .groupBy(F.col("src").alias("id"))
        .agg(F.min("_c").alias("cluster"))
    )

    labeled = mark_releasable(
        comp.select(
            "id", F.lit(ROLE_CORE).cast("bigint").alias("role"), "cluster"
        )
        .unionByName(
            border.select(
                "id",
                F.lit(ROLE_BORDER).cast("bigint").alias("role"),
                "cluster",
            )
        )
        .persist()
    )
    noise = ids.join(labeled.select("id"), "id", "anti").select(
        "id",
        F.lit(ROLE_NOISE).cast("bigint").alias("role"),
        F.lit(-1).cast("bigint").alias("cluster"),
    )
    return labeled.unionByName(noise)
