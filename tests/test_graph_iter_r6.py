"""Round-6 optimization tests: the data-adaptive bounded graph
iterations (operators/graph_iter.py) and the in-kernel radius-bin
counting reduction (ball_self_join_bin_counts) must be result-
identical to the loops/pair-stream aggregations they replaced."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from covertree_spark.operators.graph_iter import (
    _largest_component_source,
    bounded_kcore,
    bounded_sssp,
    sssp_from_largest_component,
)


def _random_graph(seed: int, n: int = 200, m: int = 600):
    """Symmetric weighted edge arrays (both directions emitted, like
    ball_self_join) over sparse ids with some isolated structure."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    keep = a != b
    a, b = a[keep], b[keep]
    w = rng.integers(1, 50, len(a))
    # sparse id space: components don't share labels accidentally
    ids = rng.choice(np.arange(10 * n), size=n, replace=False)
    src = np.concatenate([ids[a], ids[b]])
    dst = np.concatenate([ids[b], ids[a]])
    ww = np.concatenate([w, w])
    return src.astype(np.int64), dst.astype(np.int64), ww.astype(np.int64)


def _ref_bellman_ford(src, dst, w, source, rounds):
    """Unfiltered textbook Jacobi Bellman-Ford — the recurrence the
    SQL oracle unrolls. Dict-based, no frontier, no early exit."""
    d = {int(source): 0}
    for _ in range(rounds):
        nd = dict(d)
        for s, t, ww in zip(src.tolist(), dst.tolist(), w.tolist()):
            if s in d:
                c = d[s] + ww
                if t not in nd or c < nd[t]:
                    nd[t] = c
        d = nd
    return d


def _ref_kcore(src, dst, k, rounds):
    """Textbook bounded peel over the symmetric edge list."""
    alive = set(src.tolist()) | set(dst.tolist())
    for _ in range(rounds):
        deg = {}
        for s, t in zip(src.tolist(), dst.tolist()):
            if s in alive and t in alive:
                deg[s] = deg.get(s, 0) + 1
        nxt = {v for v in alive if deg.get(v, 0) >= k}
        if nxt == alive:
            break
        alive = nxt
    return alive


@pytest.mark.parametrize("seed", [1, 7])
@pytest.mark.parametrize("rounds", [3, 16])
def test_bounded_sssp_paths_match_reference(spark, seed, rounds):
    src, dst, w = _random_graph(seed)
    source = int(src.min())
    ref = _ref_bellman_ford(src, dst, w, source, rounds)
    ew = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in zip(src, dst, w)],
        "src long, dst long, w long",
    )
    small = {
        (r["id"], r["d"])
        for r in bounded_sssp(ew, source, rounds).collect()
    }
    dist = {
        (r["id"], r["d"])
        for r in bounded_sssp(ew, source, rounds, small_cutoff=0).collect()
    }
    expect = {(k, v) for k, v in ref.items()}
    assert small == expect  # numpy small path == unfiltered recurrence
    assert dist == expect  # frontier-filtered distributed path too


@pytest.mark.parametrize("seed", [3, 11])
def test_bounded_kcore_paths_match_reference(spark, seed):
    src, dst, w = _random_graph(seed)
    k, rounds = 3, 12
    ref = _ref_kcore(src, dst, k, rounds)
    edges = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(src, dst)], "src long, dst long"
    )
    small = {r["id"] for r in bounded_kcore(edges, k, rounds).collect()}
    dist = {
        r["id"]
        for r in bounded_kcore(edges, k, rounds, small_cutoff=0).collect()
    }
    assert small == ref
    assert dist == ref


def test_sssp_frontier_early_exit_is_fixpoint(spark):
    # a path graph shorter than the round budget: early exit must
    # yield the same distances as running every round
    ids = [10, 20, 30, 40]
    e = [(10, 20, 5), (20, 30, 7), (30, 40, 11)]
    e = e + [(b, a, w) for a, b, w in e]
    ew = spark.createDataFrame(e, "src long, dst long, w long")
    got = {
        (r["id"], r["d"])
        for r in bounded_sssp(ew, 10, rounds=16, small_cutoff=0).collect()
    }
    assert got == {(10, 0), (20, 5), (30, 12), (40, 23)}
    assert len(ids) == 4


def test_largest_component_source_matches_distributed_rule():
    # two components: sizes 3 and 2 -> min id of the size-3 one
    src = np.array([5, 9, 100, 5, 7, 101], np.int64)
    dst = np.array([9, 7, 101, 7, 9, 100], np.int64)
    assert _largest_component_source(src, dst) == 5
    # tie on size -> smaller component label (its min id)
    src2 = np.array([50, 2, 50, 2], np.int64)
    dst2 = np.array([60, 3, 60, 3], np.int64)
    assert _largest_component_source(src2, dst2) == 2


def test_sssp_fused_small_path_matches_split_pick(spark):
    src, dst, w = _random_graph(13)
    ew = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in zip(src, dst, w)],
        "src long, dst long, w long",
    )
    pick = _largest_component_source(src, dst)
    split = {
        (r["id"], r["d"])
        for r in bounded_sssp(ew, pick, 16).collect()
    }
    fused = {
        (r["id"], r["d"])
        for r in sssp_from_largest_component(ew, 16).collect()
    }
    assert fused == split


def test_dbscan_small_path_matches_distributed(spark, monkeypatch):
    """The fused single-task DBSCAN path must emit the identical
    (id, role, cluster) set as the distributed join cascade."""
    import covertree_spark.operators.graph_iter as gi
    from tests.conftest import make_blobs

    from covertree_spark.operators.dbscan import dbscan_labels
    from covertree_spark.operators.partition import cell_stats

    X = make_blobs(300, 3, 5, seed=9, spread=0.7)
    rows = [(i, [float(v) for v in x], int(i) % 5) for i, x in enumerate(X)]
    pts = spark.createDataFrame(
        rows, "id long, vec array<float>, cell long"
    ).persist()
    stats = cell_stats(pts, 3, "cell", None)

    def run():
        df = dbscan_labels(pts, eps=1.2, min_pts=4, d=3, stats=stats)
        return sorted((r["id"], r["role"], r["cluster"]) for r in df.collect())

    small = run()
    monkeypatch.setattr(gi, "SMALL_CUTOFF", 0)
    dist = run()
    assert small == dist
    assert len(small) == 300
    pts.unpersist()


def test_bin_counts_match_pair_stream_agg(spark):
    """ball_self_join_bin_counts == the pair-stream conditional-sum
    aggregation it replaced, for both the parity (cross_k) and
    src<dst (ripley_k) filters, on a clustered fixture."""
    from tests.conftest import make_blobs

    from covertree_spark.operators.ball_join import (
        ball_self_join,
        ball_self_join_bin_counts,
    )
    from covertree_spark.operators.partition import cell_stats

    X = make_blobs(400, 3, 6, seed=5, spread=0.8)
    rows = [
        (i, [float(v) for v in x], int(i) % 7) for i, x in enumerate(X)
    ]
    pts = spark.createDataFrame(
        rows, "id long, vec array<float>, cell long"
    ).persist()
    stats = cell_stats(pts, 3, "cell", None)
    radii = [0.5, 1.5, 3.0, 6.0]

    def stream_counts(where):
        pairs = ball_self_join(pts, radii[-1], d=3, stats=stats).where(where)
        row = pairs.agg(
            *[
                F.sum((F.col("dist") <= F.lit(r)).cast("bigint")).alias(f"c{i}")
                for i, r in enumerate(radii)
            ]
        ).collect()[0]
        return tuple(row[f"c{i}"] for i in range(len(radii)))

    # cross-parity selection
    old = stream_counts((F.col("src") % 2 == 0) & (F.col("dst") % 2 == 1))
    new = ball_self_join_bin_counts(
        pts, radii, d=3, stats=stats, src_mod2=0, dst_mod2=1
    ).collect()[0]
    assert tuple(new[f"c{i}"] for i in range(len(radii))) == old

    # unordered-pairs selection, with a chunk size that forces the
    # chunked GEMM loop to take several iterations
    old2 = stream_counts(F.col("src") < F.col("dst"))
    new2 = ball_self_join_bin_counts(
        pts, radii, d=3, stats=stats, lt_only=True, chunk_rows=64
    ).collect()[0]
    assert tuple(new2[f"c{i}"] for i in range(len(radii))) == old2
    pts.unpersist()
