"""Connected components (operators/components.py): large-star /
small-star fixpoint vs a driver-side union-find reference, on the
shapes that stress the algorithm — long paths (diameter >> rounds),
random graphs, star-forest fixpoints, isolated nodes — plus the
epsilon-graph composition the catalog entry runs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from covertree_spark.operators import partition as pt
from covertree_spark.operators.ball_join import ball_self_join
from covertree_spark.operators.components import connected_components
from covertree_spark.sources import tables as src
from tests.conftest import SF_TINY


def union_find(n_ids, edge_list):
    """Reference labels: component min id per node, plain union-find."""
    par = {i: i for i in n_ids}

    def find(a):
        while par[a] != a:
            par[a] = par[par[a]]
            a = par[a]
        return a

    for a, b in edge_list:
        par[find(a)] = find(b)
    comp = {}
    for i in n_ids:
        comp.setdefault(find(i), []).append(i)
    out = {}
    for members in comp.values():
        m = min(members)
        for i in members:
            out[i] = m
    return sorted(out.items())


def got_pairs(df):
    return sorted((r["id"], r["component"]) for r in df.collect())


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src bigint, dst bigint"
    )


@pytest.mark.parametrize("cutoff", [2_000_000, 0])  # one-task kernel / star loop
def test_path_graph_long_diameter(spark, cutoff):
    """A 300-node path: diameter 299 >> the O(log^2 n) rounds the
    star algorithm needs — the case plain label propagation can't do
    in bounded rounds. Both regimes of the data-adaptive dial."""
    pairs = [(i, i + 1) for i in range(299)]
    got = got_pairs(
        connected_components(edges_df(spark, pairs), small_cutoff=cutoff)
    )
    assert got == [(i, 0) for i in range(300)]


@pytest.mark.parametrize("cutoff", [2_000_000, 0])
def test_random_graph_matches_union_find(spark, cutoff):
    rng = np.random.default_rng(11)
    ids = list(range(400))
    pairs = [tuple(map(int, rng.choice(400, 2))) for _ in range(260)]
    pairs = [(a, b) for a, b in pairs if a != b]
    nodes = spark.createDataFrame([(i,) for i in ids], "id bigint")
    got = got_pairs(
        connected_components(
            edges_df(spark, pairs), nodes=nodes, small_cutoff=cutoff
        )
    )
    assert got == union_find(ids, pairs)


def test_star_input_is_fixpoint(spark):
    """An already-converged star forest terminates on the FIRST
    signature check (round 0), unchanged."""
    pairs = [(0, i) for i in range(1, 9)] + [(100, j) for j in (101, 102)]
    got = got_pairs(connected_components(edges_df(spark, pairs)))
    want = [(i, 0) for i in range(9)] + [(j, 100) for j in (100, 101, 102)]
    assert got == sorted(want)


def test_isolated_nodes_and_duplicate_edges(spark):
    """nodes= adds never-linked vertices (own component); duplicate /
    reversed / self-loop input edges are canonicalized away — in both
    regimes of the data-adaptive dial."""
    pairs = [(5, 3), (3, 5), (5, 3), (7, 7), (1, 2)]
    nodes = spark.createDataFrame([(i,) for i in range(10)], "id bigint")
    for cutoff in (2_000_000, 0):
        got = got_pairs(
            connected_components(
                edges_df(spark, pairs), nodes=nodes, small_cutoff=cutoff
            )
        )
        assert got == union_find(list(range(10)), [(5, 3), (1, 2)])


def test_epsilon_graph_components_vs_bruteforce(spark):
    """The catalog composition: ball_self_join edges -> components,
    checked against union-find over brute-force distances."""
    ll = pt.assign_cells(src.doc_points_lonlat(spark, SF_TINY), res=3)
    pts = (
        src.doc_points_xyz(spark, SF_TINY)
        .join(ll.select("id", "cell"), "id")
        .persist()
    )
    r = 0.10
    edges = ball_self_join(pts, r, d=3).select("src", "dst")
    got = got_pairs(connected_components(edges, nodes=pts))

    pdf = pts.orderBy("id").toPandas()
    X = np.stack(pdf["vec"].to_numpy())
    ids = [int(i) for i in pdf["id"]]
    D = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    n = len(X)
    iu, ju = np.triu_indices(n, 1)
    hit = D[iu, ju] <= r
    pairs = [(ids[a], ids[b]) for a, b in zip(iu[hit], ju[hit])]
    assert got == union_find(ids, pairs)
    # clearance discipline for the catalog constant (GEO_CC_R = 0.10):
    # no true distance within f64-flippable range of the threshold
    off = D[iu, ju]
    assert np.abs(off - r).min() > 1e-9


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(
            edges_df(spark, [(i, i + 1) for i in range(40)]),
            max_rounds=1,
            small_cutoff=0,  # force the star loop: the kernel path has no rounds
        )
