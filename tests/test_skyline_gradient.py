"""Semantics pins for the round-5 batch: skyline dominance (ties,
prefilter-invariance), tile gradient wrap/clamp, mutual-kNN symmetry,
and the outlier factor's exact-rational arithmetic."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _brute_skyline(rows):
    """rows: list of (id, dist, val). Keep non-dominated (min dist,
    max val, strict somewhere)."""
    out = []
    for i, (ri, di, vi) in enumerate(rows):
        dominated = any(
            (dj <= di and vj >= vi and (dj < di or vj > vi))
            for j, (rj, dj, vj) in enumerate(rows)
            if j != i
        )
        if not dominated:
            out.append((ri, di, vi))
    return sorted(out)


@pytest.mark.parametrize("seed", [0, 7])
def test_skyline_matches_brute(spark, seed):
    from covertree_spark.operators.skyline import skyline_2d

    rng = np.random.default_rng(seed)
    n = 400
    d = rng.integers(0, 60, n)  # small range forces dist ties
    v = rng.integers(0, 60, n)
    rows = [(i, int(d[i]), int(v[i])) for i in range(n)]
    df = spark.createDataFrame(
        pd.DataFrame({"id": range(n), "dist_m": d, "val": v})
    ).select(
        F.col("id").cast("bigint"),
        F.col("dist_m").cast("bigint"),
        F.col("val").cast("bigint"),
    )
    got = sorted(
        (r.id, r.dist_m, r.val) for r in skyline_2d(df, "dist_m", "val").collect()
    )
    assert got == _brute_skyline(rows)


def test_skyline_keeps_duplicate_frontier_points(spark):
    from covertree_spark.operators.skyline import skyline_2d

    # two identical frontier rows: neither strictly dominates, both kept
    df = spark.createDataFrame(
        [(0, 1, 5), (1, 1, 5), (2, 2, 6), (3, 0, 4), (4, 3, 1)],
        "id long, dist_m long, val long",
    )
    got = sorted((r.id) for r in skyline_2d(df, "dist_m", "val").collect())
    assert got == [0, 1, 2, 3]


def test_skyline_prefilter_invariance(spark):
    """Any phase-1 bucketing yields the same global skyline."""
    from covertree_spark.operators.skyline import skyline_2d

    rng = np.random.default_rng(3)
    n = 300
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": range(n),
                "dist_m": rng.integers(0, 10**6, n),
                "val": rng.integers(0, 10**6, n),
                "grp": rng.integers(0, 5, n),
            }
        )
    ).select(*[F.col(c).cast("bigint") for c in ("id", "dist_m", "val", "grp")])
    a = sorted(r.id for r in skyline_2d(df, "dist_m", "val").collect())
    b = sorted(
        r.id for r in skyline_2d(df, "dist_m", "val", prefilter_col="grp").collect()
    )
    assert a == b


def test_tile_gradient_wrap_and_clamp(spark):
    """4x4 grid (zoom 2): x wraps, y clamps, absent tiles count 0."""
    from covertree_spark.operators.tiles import tile_gradient

    # place counts: (ix,iy)->cnt over a zoom-2 grid; lon cell width 90,
    # lat cell height 45; centers at ix*90-180+45, iy*45-90+22.5
    cnts = {(0, 0): 3, (3, 0): 5, (1, 1): 2, (1, 3): 7}
    rows = []
    i = 0
    for (ix, iy), c in cnts.items():
        for _ in range(c):
            rows.append((i, ix * 90.0 - 180.0 + 45.0, iy * 45.0 - 90.0 + 22.5))
            i += 1
    df = spark.createDataFrame(rows, "id long, lon double, lat double")
    got = {r.tile: (r.cnt, r.gx, r.gy) for r in tile_gradient(df, 2).collect()}
    # tile id = ix*4 + iy
    # (0,0): E=(1,0)=0, W=(3,0)=5 wrap -> gx=-5; N=(0,1)=0, S=y-1 clamp 0 -> gy=0
    assert got[0] == (3, -5, 0)
    # (3,0): E wraps to (0,0)=3 -> gx=3-0=3... W=(2,0)=0 -> gx=3; gy N=(3,1)=0 S clamp -> 0
    assert got[3 * 4 + 0] == (5, 3, 0)
    # (1,1): E=(2,1)=0 W=(0,1)=0 -> 0; N=(1,2)=0 S=(1,0)=0 -> 0
    assert got[1 * 4 + 1] == (2, 0, 0)
    # (1,3): top row — N clamps (absent), S=(1,2)=0 -> gy=0; gx: E=(2,3)=0 W=(0,3)=0
    assert got[1 * 4 + 3] == (7, 0, 0)
    assert set(got) == {0, 12, 5, 7}


def test_tile_gradient_neighbors_contribute(spark):
    from covertree_spark.operators.tiles import tile_gradient

    # (1,1) with E=(2,1) 4 pts and N=(1,2) 9 pts at zoom 2
    cnts = {(1, 1): 1, (2, 1): 4, (1, 2): 9}
    rows = []
    i = 0
    for (ix, iy), c in cnts.items():
        for _ in range(c):
            rows.append((i, ix * 90.0 - 180.0 + 45.0, iy * 45.0 - 90.0 + 22.5))
            i += 1
    df = spark.createDataFrame(rows, "id long, lon double, lat double")
    got = {r.tile: (r.gx, r.gy) for r in tile_gradient(df, 2).collect()}
    assert got[1 * 4 + 1] == (4, 9)
    assert got[2 * 4 + 1] == (-1, 0)
    assert got[1 * 4 + 2] == (0, -1)


def test_mutual_knn_symmetric_and_subset(spark):
    from tests.conftest import SF_TINY
    from covertree_spark.queries import q_geo_knn, q_mutual_knn

    knn = {
        (r.src, r.dst): r.rank for r in q_geo_knn(spark, SF_TINY).collect()
    }
    mut = q_mutual_knn(spark, SF_TINY).collect()
    assert len(mut) > 0
    for r in mut:
        assert r.a < r.b
        assert knn[(r.a, r.b)] == r.rank_ab
        assert knn[(r.b, r.a)] == r.rank_ba


def test_knn_outlier_rational_vs_numpy(spark):
    from tests.conftest import SF_TINY
    from covertree_spark.queries import KNN_K, q_geo_knn, q_knn_outlier
    from covertree_spark.core import geometry

    knn = [(r.src, r.dst) for r in q_geo_knn(spark, SF_TINY).collect()]
    src = np.array([p[0] for p in knn])
    dst = np.array([p[1] for p in knn])
    lon1, lat1 = geometry.lonlat_from_id(src)
    lon2, lat2 = geometry.lonlat_from_id(dst)
    m = geometry.haversine_m_int(lon1, lat1, lon2, lat2)
    s2 = {}
    for s, mm in zip(src, m):
        s2[s] = s2.get(s, 0) + int(mm) ** 2
    want = {}
    for p in s2:
        den = sum(s2[d] for s, d in knn if s == p)
        want[p] = (KNN_K * s2[p], den)
    got = {r.id: (r.num, r.den) for r in q_knn_outlier(spark, SF_TINY).collect()}
    assert got == want
