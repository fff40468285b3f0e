"""Semantics pins for geo_sssp (bounded-hop Bellman-Ford contract)
and buffer_join (per-feature radius, asymmetric membership)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_TINY


def test_sssp_matches_numpy_bellman_ford(spark):
    """Engine vs a direct numpy L-round relaxation over the SAME
    edge/weight definitions."""
    from covertree_spark.core import geometry
    from covertree_spark.queries import (
        GEO_CC_R,
        SSSP_ROUNDS,
        _geo_points,
        q_geo_sssp,
    )
    from covertree_spark.operators.ball_join import ball_self_join

    pts, stats = _geo_points(spark, SF_TINY)
    edges = [
        (r.src, r.dst)
        for r in ball_self_join(pts, GEO_CC_R, d=3, stats=stats)
        .select("src", "dst")
        .collect()
    ]
    src_a = np.array([e[0] for e in edges])
    dst_a = np.array([e[1] for e in edges])
    lon1, lat1 = geometry.lonlat_from_id(src_a)
    lon2, lat2 = geometry.lonlat_from_id(dst_a)
    w = geometry.haversine_m_int(lon1, lat1, lon2, lat2)

    got = {r.id: r.dist_m for r in q_geo_sssp(spark, SF_TINY).collect()}
    # source = the unique vertex at distance 0
    srcs = [i for i, d in got.items() if d == 0]
    assert len(srcs) == 1
    INF = float("inf")
    dist = {srcs[0]: 0}
    for _ in range(SSSP_ROUNDS):
        nd = dict(dist)
        for s, t, ww in zip(src_a, dst_a, w):
            if s in dist and dist[s] + int(ww) < nd.get(t, INF):
                nd[t] = dist[s] + int(ww)
        dist = nd
    want = {i: dist.get(i, -1) for i in got}
    assert got == want
    assert sum(1 for d in got.values() if d > 0) > 5  # non-trivial fixture


def test_buffer_join_asymmetric_and_exact(spark):
    """Membership depends on the SRC's radius only: find a pair where
    (a->b) is in but (b->a) is out, and verify every pair against the
    brute predicate."""
    from covertree_spark.core import geometry
    from covertree_spark.queries import BUF_BASE_KM, BUF_MOD, q_buffer_join
    from covertree_spark.sources import tables as srct

    rows = q_buffer_join(spark, SF_TINY).collect()
    assert rows
    docs = {
        r.doc_id: r.n_chars
        for r in srct.load_table(spark, SF_TINY, "documents").collect()
    }
    pair_set = {(r.src, r.dst) for r in rows}
    for r in rows:
        r_m = (BUF_BASE_KM + docs[r.src] % BUF_MOD) * 1000
        assert r.m <= r_m
        lon1, lat1 = geometry.lonlat_from_id(np.array([r.src]))
        lon2, lat2 = geometry.lonlat_from_id(np.array([r.dst]))
        assert r.m == geometry.haversine_m_int(lon1, lat1, lon2, lat2)[0]
    asym = [p for p in pair_set if (p[1], p[0]) not in pair_set]
    assert asym, "fixture should exercise the per-feature radius asymmetry"
