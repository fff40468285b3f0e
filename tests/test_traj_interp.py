"""traj_interp semantics on a hand-built micro-fixture: epoch
ownership at the half-open (tp, tn] boundary, dense segments emitting
nothing, and the interpolated position matching a direct numpy
evaluation of the same arithmetic."""

import datetime

import numpy as np
from pyspark.sql import functions as F

from covertree_spark import queries as Q
from covertree_spark.core import geometry
from covertree_spark.operators import sessions

G = Q.INTERP_GRID_US


def _interp_df(spark, rows):
    ev = spark.createDataFrame(
        [
            (eid, datetime.datetime.fromtimestamp(us / 1e6), uid, "t", 0.0, "")
            for eid, us, uid in rows
        ],
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    seg = sessions.consecutive_pairs(ev, bucket_us=Q.TRAVEL_BUCKET_US)
    ks = seg.withColumn(
        "k",
        F.explode(
            F.expr(
                f"CASE WHEN us DIV {G} >= prev_us DIV {G} + 1 "
                f"THEN sequence(prev_us DIV {G} + 1, us DIV {G}) "
                "ELSE CAST(array() AS ARRAY<BIGINT>) END"
            )
        ),
    )
    lon, lat = Q._interp_frags()
    return ks.select(
        "user_id",
        F.expr(f"k * {G}").alias("epoch_us"),
        F.expr(lon).alias("lon"),
        F.expr(lat).alias("lat"),
    )


def test_epoch_ownership_and_density(spark):
    """u0: pings at 0.5G and 3G -> epochs {1G, 2G, 3G} (tn ON the grid
    is included; tp's own epoch 0G excluded). u1: two pings inside one
    grid cell -> no output. u2: single ping -> no segment, no output."""
    rows = [
        (10, G // 2, 0),
        (11, 3 * G, 0),
        (20, G + 100, 1),
        (21, G + 200, 1),
        (30, 5 * G, 2),
    ]
    got = _interp_df(spark, rows).collect()
    by_user = {}
    for r in got:
        by_user.setdefault(r["user_id"], []).append(r["epoch_us"])
    assert sorted(by_user.get(0, [])) == [G, 2 * G, 3 * G]
    assert 1 not in by_user and 2 not in by_user


def test_linear_interpolation_matches_numpy(spark):
    """Positions at in-segment epochs equal the definition evaluated
    directly: p(t) = p1 + (p2 - p1) * (t - t1) / (t2 - t1), with
    lon/lat from the shared id derivation."""
    rows = [(100, G // 4, 7), (101, 2 * G + G // 3, 7)]
    got = sorted(
        (r["epoch_us"], r["lon"], r["lat"])
        for r in _interp_df(spark, rows).collect()
    )
    lon, lat = geometry.lonlat_from_id(np.array([100, 101]))
    t1, t2 = G // 4, 2 * G + G // 3
    want = []
    for k in (1, 2):
        w = float(k * G - t1) / float(t2 - t1)
        want.append(
            (k * G, lon[0] + (lon[1] - lon[0]) * w, lat[0] + (lat[1] - lat[0]) * w)
        )
    assert [e for e, *_ in got] == [e for e, *_ in want]
    for (_, glon, glat), (_2, wlon, wlat) in zip(got, want):
        assert glon == wlon and glat == wlat
