"""End-to-end Spark pipeline: epsilon-ball self-join and exact kNN
against brute-force ground truth, on both the geo (quad-cell) and
embedding (Voronoi) partitioners; parallelism-invariance included."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from covertree_spark.core import covertree as ct
from covertree_spark.operators import partition as pt
from covertree_spark.operators.ball_join import ball_self_join, brute_ball_join
from covertree_spark.operators.knn import knn_self_join
from covertree_spark.sources import tables as src
from tests.conftest import SF_TINY, brute_ball_edges, brute_knn

GEO_R = 0.28  # chord radius on the unit sphere (~16 deg)
EMB_R = 1.05  # chosen for avg-degree ~ O(10) on the embeddings table


def edges_set(df):
    return sorted((r["src"], r["dst"]) for r in df.select("src", "dst").collect())


@pytest.fixture(scope="module")
def geo_points(spark):
    df = src.doc_points_lonlat(spark, SF_TINY)
    df = pt.assign_cells(df, res=3)
    xyz = src.doc_points_xyz(spark, SF_TINY)
    return xyz.join(df.select("id", "cell"), "id").persist()


@pytest.fixture(scope="module")
def geo_numpy(spark, geo_points):
    pdf = geo_points.orderBy("id").toPandas()
    X = np.stack(pdf["vec"].to_numpy())
    ids = pdf["id"].to_numpy()
    return X, ids


def test_geo_ball_join_matches_bruteforce(spark, geo_points, geo_numpy):
    X, ids = geo_numpy
    got = edges_set(ball_self_join(geo_points, GEO_R, d=3))
    exp = brute_ball_edges(X, GEO_R)
    expected = sorted((int(ids[s]), int(ids[t])) for s, t in exp)
    assert len(got) > 0
    assert got == expected


def test_geo_ball_join_hash_strategy_same_result(spark, geo_points, geo_numpy):
    X, ids = geo_numpy
    got = edges_set(ball_self_join(geo_points, GEO_R, d=3, strategy="hash"))
    exp = brute_ball_edges(X, GEO_R)
    expected = sorted((int(ids[s]), int(ids[t])) for s, t in exp)
    assert got == expected


def test_geo_ball_join_matches_distributed_bf(spark, geo_points):
    got = edges_set(ball_self_join(geo_points, GEO_R, d=3))
    bf = edges_set(brute_ball_join(geo_points, GEO_R))
    assert got == bf


def test_geo_knn_matches_bruteforce(spark, geo_points, geo_numpy):
    X, ids = geo_numpy
    k = 10
    got = knn_self_join(geo_points, k=k, d=3)
    rows = sorted(
        (r["src"], r["rank"], r["dst"]) for r in got.select("src", "rank", "dst").collect()
    )
    eq, ep, ed = brute_knn(X, X, k, exclude_self_idx=np.arange(len(X)))
    expected = []
    rank = {}
    for q, p in zip(eq, ep):
        rank[q] = rank.get(q, 0) + 1
        expected.append((int(ids[q]), rank[q], int(ids[p])))
    assert rows == sorted(expected)


def test_knn_counts_per_query(spark, geo_points):
    got = knn_self_join(geo_points, k=5, d=3)
    cnts = got.groupBy("src").count().select("count").distinct().collect()
    assert [r["count"] for r in cnts] == [5]


@pytest.fixture(scope="module")
def emb_points(spark):
    pts = src.embedding_points(spark, SF_TINY)
    centers = pt.voronoi_centers(pts, k=8)
    return pt.assign_voronoi_cells(pts, centers).persist()


def test_voronoi_ball_join_matches_bruteforce(spark, emb_points):
    pdf = emb_points.orderBy("id").toPandas()
    X = np.stack(pdf["vec"].to_numpy())
    ids = pdf["id"].to_numpy()
    got = edges_set(ball_self_join(emb_points, EMB_R, d=64))
    exp = brute_ball_edges(X, EMB_R)
    expected = sorted((int(ids[s]), int(ids[t])) for s, t in exp)
    assert len(got) > 0
    assert got == expected


def test_voronoi_knn_matches_bruteforce(spark, emb_points):
    pdf = emb_points.orderBy("id").toPandas()
    X = np.stack(pdf["vec"].to_numpy())
    ids = pdf["id"].to_numpy()
    k = 10
    got = knn_self_join(emb_points, k=k, d=64)
    rows = sorted(
        (r["src"], r["rank"], r["dst"]) for r in got.select("src", "rank", "dst").collect()
    )
    eq, ep, ed = brute_knn(X, X, k, exclude_self_idx=np.arange(len(X)))
    expected = []
    rank = {}
    for q, p in zip(eq, ep):
        rank[q] = rank.get(q, 0) + 1
        expected.append((int(ids[q]), rank[q], int(ids[p])))
    assert rows == sorted(expected)


def test_threshold_clearance(spark, geo_points, emb_points):
    """Guard: no true distance sits within 1e-9 of the chosen radii —
    ulp-level summation-order differences cannot flip the predicates
    (FIXTURES F2 boundary discipline)."""
    for fx, r in ((geo_points, GEO_R), (emb_points, EMB_R)):
        pdf = fx.select("vec").toPandas()
        X = np.stack(pdf["vec"].to_numpy())
        D = np.sqrt(ct.pairwise_sq_dists(X, X))
        gap = np.abs(D - r).min()
        assert gap > 1e-9, f"distance within {gap} of radius {r}"


def test_hot_cell_split_preserves_results(spark):
    df = src.doc_points_lonlat(spark, SF_TINY)
    df = pt.assign_cells(df, res=1)  # tiny res => hot cells guaranteed
    split = pt.split_hot_cells(df, res=1, max_cell_size=50, delta=2)
    # every pcell below... splitting happened:
    sizes = split.groupBy("pcell").count().toPandas()
    assert len(sizes) > 4
    xyz = src.doc_points_xyz(spark, SF_TINY)
    pts = xyz.join(split.select("id", F.col("pcell").alias("cell")), "id")
    got = edges_set(ball_self_join(pts, GEO_R, d=3))
    pdf = pts.orderBy("id").toPandas()
    X = np.stack(pdf["vec"].to_numpy())
    ids = pdf["id"].to_numpy()
    exp = brute_ball_edges(X, GEO_R)
    expected = sorted((int(ids[s]), int(ids[t])) for s, t in exp)
    assert got == expected
