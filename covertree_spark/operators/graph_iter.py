"""Bounded-round iterative graph kernels (SSSP relaxation, k-core
peel) — the optimization-round refinements of the inline loops that
lived in queries.py (round-5 VERDICT "What's missing #3" /
"Next round #3").

Both operators keep the EXACT bounded-round contract their oracles
unroll (``rounds`` Bellman-Ford sweeps / ``rounds`` peel steps) and are
data-adaptive the same way operators/components.py is:

  * below ``small_cutoff`` edges (known exactly from the convergence/
    cutoff count the distributed path needs anyway) the whole
    iteration runs in ONE bounded numpy task — the star-loop lesson
    from components.py holds here too: at bench scale the per-round
    fixed-latency shuffles dwarf the arithmetic (measured ~10s of
    wall for 16 x 2 shuffle rounds over a 168k-edge graph whose full
    Bellman-Ford is <20 ms of numpy).
  * above the cutoff the distributed loop runs — for SSSP with
    FRONTIER FILTERING (delta-stepping-style improved-only
    re-emission): round i joins only the vertices whose distance
    improved in round i-1 against the edge stream, so the per-round
    shuffle is O(frontier edges), not O(settled + frontier). A round
    with an empty frontier is a fixpoint: every later round is a
    no-op, so the loop may stop early with the identical result.

Exactness of the frontier filter (why results cannot change):
d_{i}(v) = min(d_{i-1}(v), min_{(u,v) in E} d_{i-1}(u) + w(u,v)) is
the full-relaxation recurrence. If d_{i-1}(u) == d_{i-2}(u) then
every candidate u contributes in round i, d_{i-1}(u) + w, was already
contributed in round i-1; the min is idempotent, so dropping settled
u from round i leaves d_i unchanged. Induction over rounds gives
d_rounds identical to the unfiltered loop — the SQL oracle's unrolled
CTE chain. The numpy small path evaluates the same recurrence with a
FROZEN per-round distance array (Jacobi, not Gauss-Seidel — in-place
scatter-min could propagate two hops in one round and change
beyond-horizon vertices), so all three paths agree bit-for-bit on the
integer distances.

K-core exactness: alive_{i+1} = {v in alive_i : deg_{G[alive_i]}(v)
>= K} is a monotone peel; the numpy path evaluates the same set
recurrence with boolean masks, and a fixpoint round (no vertex
removed) makes every later round a no-op, so early exit at the
fixpoint is result-identical to running all ``rounds`` rounds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one bounded task holds (src, dst, w) int64 arrays: 24 B/edge -> 48 MB
# at the cutoff, the same order as components.py's small_cutoff.
SMALL_CUTOFF = 2_000_000


def _sssp_kernel(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray,
    source: int, rounds: int,
) -> tuple[np.ndarray, np.ndarray]:
    """``rounds`` Jacobi Bellman-Ford sweeps from ``source`` over the
    directed edge arrays. Returns (ids, dist) for REACHED vertices
    only (the caller left-joins the node table for the -1 fill).
    Frontier-filtered per round; early exit at the fixpoint."""
    ids = np.unique(np.concatenate([src, dst, np.asarray([source], np.int64)]))
    si = np.searchsorted(ids, src)
    di = np.searchsorted(ids, dst)
    INF = np.iinfo(np.int64).max
    d = np.full(len(ids), INF, np.int64)
    d[np.searchsorted(ids, source)] = 0
    frontier = d != INF  # vertices improved in the previous round
    for _ in range(rounds):
        use = frontier[si]
        if not use.any():
            break  # empty frontier == fixpoint; later rounds are no-ops
        cand_dst = di[use]
        cand_d = d[si[use]] + w[use]
        nd = d.copy()  # frozen round input (Jacobi)
        np.minimum.at(nd, cand_dst, cand_d)
        frontier = nd != d
        d = nd
    reached = d != INF
    return ids[reached], d[reached]


def _largest_component_source(
    src: np.ndarray, dst: np.ndarray
) -> int:
    """The min-id vertex of the largest component of the (symmetric)
    edge arrays — ties to the smaller component label, which IS its
    min id. Exactly the pick rule the distributed path renders as
    comp -> groupBy(component).count -> min(struct(-c, component)),
    evaluated with the same union-find labeling components.py's small
    path uses. Caller guarantees edges are nonempty (an empty graph
    has no edge components; the query falls back to the node-table
    rule there)."""
    from .components import _uf_min_labels

    ids, label = _uf_min_labels(src, dst)
    labs, counts = np.unique(label, return_counts=True)
    best = np.lexsort((labs, -counts))[0]
    return int(labs[best])


def sssp_from_largest_component(
    ew: DataFrame, rounds: int
) -> DataFrame:
    """Small-graph fused path: union-find labeling, largest-component
    source pick AND the ``rounds``-sweep Bellman-Ford in ONE bounded
    task over (src, dst, w) — skips the separate connected_components
    pass (its signature agg + UF job + pick agg were pure fixed-
    latency overhead at bench scale; the arithmetic is <20 ms).
    Only for edge sets under the caller-checked SMALL_CUTOFF and
    nonempty. Returns (id bigint, d bigint) for reached vertices."""

    def run(batches):
        blocks = [p for p in batches if not p.empty]
        if not blocks:
            yield pd.DataFrame(
                {"id": np.empty(0, np.int64), "d": np.empty(0, np.int64)}
            )
            return
        cur = pd.concat(blocks, ignore_index=True)
        src = cur["src"].to_numpy(np.int64)
        dst = cur["dst"].to_numpy(np.int64)
        w = cur["w"].to_numpy(np.int64)
        source = _largest_component_source(src, dst)
        ids, d = _sssp_kernel(src, dst, w, source, rounds)
        yield pd.DataFrame({"id": ids, "d": d})

    return ew.select("src", "dst", "w").coalesce(1).mapInPandas(
        run, schema="id bigint, d bigint"
    )


def bounded_sssp(
    ew: DataFrame,
    source: int,
    rounds: int,
    small_cutoff: int = SMALL_CUTOFF,
    n_edges: int | None = None,
) -> DataFrame:
    """Exact ``rounds``-sweep Bellman-Ford distances from ``source``
    over the weighted directed edge frame ``ew`` (src, dst, w — all
    integral). Returns (id bigint, d bigint) for reached vertices.

    ``n_edges``: pass the already-materialized edge count (the caller
    usually has it from persisting the epsilon-graph) to skip a count
    job here."""
    spark = ew.sparkSession
    if n_edges is None:
        n_edges = ew.count()

    if n_edges <= small_cutoff:
        def run(batches):
            blocks = [p for p in batches if not p.empty]
            if not blocks:
                ids, d = _sssp_kernel(
                    np.empty(0, np.int64), np.empty(0, np.int64),
                    np.empty(0, np.int64), source, rounds,
                )
            else:
                cur = pd.concat(blocks, ignore_index=True)
                ids, d = _sssp_kernel(
                    cur["src"].to_numpy(np.int64),
                    cur["dst"].to_numpy(np.int64),
                    cur["w"].to_numpy(np.int64),
                    source, rounds,
                )
            yield pd.DataFrame({"id": ids, "d": d})

        return ew.select("src", "dst", "w").coalesce(1).mapInPandas(
            run, schema="id bigint, d bigint"
        )

    # distributed path: frontier-filtered relaxation. Per round ONE
    # join of the (small) frontier against the edge stream + one
    # min-combine; both partial-aggregable. localCheckpoint per round:
    # the merge references d twice, so per-round truncation caps the
    # plan (components.py discipline) and materializes the frontier
    # count for the early exit.
    d = spark.createDataFrame([(int(source), 0)], "id long, d long")
    delta = d
    for _ in range(rounds):
        relaxed = (
            ew.join(
                delta.select(F.col("id").alias("src"), F.col("d").alias("_du")),
                "src",
            ).select(F.col("dst").alias("id"), (F.col("_du") + F.col("w")).alias("nd"))
        )
        cand = relaxed.groupBy("id").agg(F.min("nd").alias("nd"))
        merged = (
            d.join(cand, "id", "full_outer")
            .select(
                "id",
                # Spark's least() skips nulls: new vertex -> nd,
                # no candidate -> d
                F.least("d", "nd").alias("d"),
                (
                    F.col("d").isNull()
                    | (F.col("nd").isNotNull() & (F.col("nd") < F.col("d")))
                ).alias("_imp"),
            )
            .localCheckpoint()
        )
        delta = merged.where("_imp").select("id", "d")
        d = merged.select("id", "d")
        if delta.limit(1).count() == 0:
            break  # fixpoint: remaining rounds cannot change d
    return d


def _kcore_kernel(
    src: np.ndarray, dst: np.ndarray, k: int, rounds: int
) -> np.ndarray:
    """``rounds`` peel steps over the symmetric edge arrays; returns
    the surviving vertex ids. Early exit at the fixpoint."""
    ids = np.unique(np.concatenate([src, dst]))
    si = np.searchsorted(ids, src)
    di = np.searchsorted(ids, dst)
    alive = np.ones(len(ids), bool)
    for _ in range(rounds):
        m = alive[si] & alive[di]
        deg = np.bincount(si[m], minlength=len(ids))
        nxt = deg >= k
        if bool(np.all(nxt == alive)):
            break  # fixpoint: peeling is monotone, later rounds no-op
        alive = nxt
    return ids[alive]


def bounded_kcore(
    edges: DataFrame,
    k: int,
    rounds: int,
    small_cutoff: int = SMALL_CUTOFF,
    n_edges: int | None = None,
) -> DataFrame:
    """``rounds``-round k-core peel of the symmetric edge frame
    (src, dst). Returns (id bigint) — the surviving vertices."""
    if n_edges is None:
        n_edges = edges.count()

    if n_edges <= small_cutoff:
        def run(batches):
            blocks = [p for p in batches if not p.empty]
            if not blocks:
                yield pd.DataFrame({"id": np.empty(0, np.int64)})
                return
            cur = pd.concat(blocks, ignore_index=True)
            ids = _kcore_kernel(
                cur["src"].to_numpy(np.int64),
                cur["dst"].to_numpy(np.int64),
                k, rounds,
            )
            yield pd.DataFrame({"id": ids})

        return edges.select("src", "dst").coalesce(1).mapInPandas(
            run, schema="id bigint"
        )

    # distributed peel (unchanged semantics from the inline loop it
    # replaces): per round one both-endpoint join + degree count over
    # surviving edges — O(surviving edges) shuffle, partial-aggregable.
    alive = edges.select(F.col("src").alias("id")).distinct()
    for i in range(rounds):
        alive = (
            edges.join(alive.select(F.col("id").alias("src")), "src")
            .join(alive.select(F.col("id").alias("dst")), "dst")
            .groupBy("src")
            .agg(F.count("*").alias("_d"))
            .where(F.col("_d") >= k)
            .select(F.col("src").alias("id"))
        )
        if (i + 1) % 4 == 0:
            alive = alive.localCheckpoint()
    return alive
