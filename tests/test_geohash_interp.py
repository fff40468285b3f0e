"""Pins for the geohash codec (canonical values, prefix nesting,
SQL<->numpy parity) and tile_interp (ring∩ball kernel vs a brute
numpy oracle)."""

import duckdb
import numpy as np
import pytest

from covertree_spark.core.geohash import geohash_encode, sql_geohash_expr


def test_geohash_canonical_values():
    # spec example: 42.605, -5.603 -> 'ezs42' (first 5 chars)
    got = geohash_encode(np.array([-5.603]), np.array([42.605]), 8)[0]
    assert got.startswith("ezs42")
    # equator/meridian origin cell
    got0 = geohash_encode(np.array([0.0]), np.array([0.0]), 8)[0]
    assert got0.startswith("s000")
    # well-known: Jutland 'u4pruydqqvj' for 57.64911, 10.40744
    got_j = geohash_encode(np.array([10.40744]), np.array([57.64911]), 8)[0]
    assert got_j == "u4pruydq"


def test_geohash_prefix_nesting():
    rng = np.random.default_rng(0)
    lon = rng.uniform(-180, 180, 50)
    lat = rng.uniform(-90, 90, 50)
    g8 = geohash_encode(lon, lat, 8)
    g4 = geohash_encode(lon, lat, 4)
    assert all(a.startswith(b) for a, b in zip(g8, g4))


def test_geohash_sql_matches_numpy():
    rng = np.random.default_rng(1)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    con = duckdb.connect()
    con.register(
        "t", __import__("pandas").DataFrame({"lon": lon, "lat": lat})
    )
    expr = sql_geohash_expr("lon", "lat", 8)
    got = [r[0] for r in con.sql(f"SELECT {expr} FROM t").fetchall()]
    assert got == geohash_encode(lon, lat, 8)


def test_geohash_clamps_domain_edges():
    lon = np.array([180.0, -180.0, 0.0])
    lat = np.array([90.0, -90.0, 0.0])
    out = geohash_encode(lon, lat, 8)
    assert len(out) == 3 and all(len(g) == 8 for g in out)


def test_tile_interp_matches_brute_numpy(spark):
    """Engine vs a direct numpy evaluation of the ring∩ball kernel on
    a seeded point set."""
    import pandas as pd
    from pyspark.sql import functions as F

    from covertree_spark.core import geometry
    from covertree_spark.operators.tiles import tile_interp

    rng = np.random.default_rng(7)
    n_pts, zoom, r_km = 300, 6, 200
    n = 1 << zoom
    lon = rng.uniform(-170, 170, n_pts)
    lat = rng.uniform(-80, 80, n_pts)
    val = rng.integers(1, 1000, n_pts)
    df = spark.createDataFrame(
        pd.DataFrame({"id": range(n_pts), "lon": lon, "lat": lat, "val": val})
    ).select("id", "lon", "lat", F.col("val").cast("bigint").alias("val"))
    got = {
        r.tile: (r.num, r.den) for r in tile_interp(df, zoom, "val", r_km).collect()
    }

    ix = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    iy = np.clip(np.floor((lat + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
    tiles_of = ix * n + iy
    want = {}
    for c in np.unique(tiles_of):
        cix, ciy = c // n, c % n
        clon = (cix + 0.5) * (360.0 / n) - 180.0
        clat = (ciy + 0.5) * (180.0 / n) - 90.0
        num = den = 0
        for p in range(n_pts):
            dx = (ix[p] - cix) % n
            in_ring = dx in (0, 1, n - 1) and abs(iy[p] - ciy) <= 1
            if not in_ring:
                continue
            m = geometry.haversine_m_int(
                np.array([lon[p]]), np.array([lat[p]]),
                np.array([clon]), np.array([clat]),
            )[0]
            kd = int(m // 1000)
            if kd < r_km:
                w = r_km * r_km - kd * kd
                num += w * int(val[p])
                den += w
        if den > 0:
            want[int(c)] = (num, den)
    assert got == want
