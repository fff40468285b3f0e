"""Focused tests for the round-5 search/trajectory ops beyond the
oracle gate: the inverted index's two-phase task bound, geofence
transition semantics on a constructed crossing trajectory, and
co-location pair symmetry vs a brute-force pandas count."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from covertree_spark.core import geometry
from covertree_spark.core.polygons import point_in_polygon


def test_inverted_index_phase1_bound(spark):
    """Phase 1 of the postings build groups by (term, doc-bucket):
    even for a degenerate one-term corpus (the stopword worst case),
    no single group exceeds one bucket's token count — the property
    that makes the final collect_list a bounded task at any corpus
    size."""
    from covertree_spark.queries import POSTING_BUCKET

    n_docs, words_per_doc = 1000, 8
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.lit(" ".join(["the"] * words_per_doc)).alias("text"),
    )
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "term"),
    ).withColumn("bkt", F.expr(f"doc_id DIV {POSTING_BUCKET}"))
    sizes = toks.groupBy("term", "bkt").count()
    assert (
        sizes.agg(F.max("count")).first()[0]
        <= POSTING_BUCKET * words_per_doc
    )
    # and the shards cover everything exactly once
    assert sizes.agg(F.sum("count")).first()[0] == n_docs * words_per_doc


def test_geofence_transition_semantics(spark, tmp_path):
    """A constructed two-ping-per-user trajectory against one fixture
    polygon: the engine's transition rows must equal the numpy
    inside-state flips, with entered = the NEW ping's state."""
    from covertree_spark.queries import PIP_ALL_POLYS, q_geofence_transitions

    rng = np.random.default_rng(5)
    n_users = 400
    # two pings per user, one minute apart; locations derived from the
    # event id exactly as the operator derives them
    eids = rng.permutation(2 * n_users).astype(np.int64)
    rows = []
    for u in range(n_users):
        rows.append((int(eids[2 * u]), u, "2024-01-01 00:00:00"))
        rows.append((int(eids[2 * u + 1]), u, "2024-01-01 00:01:00"))
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    sf = str(tmp_path)
    ev.write.mode("overwrite").parquet(f"{sf}/events.parquet")

    got = sorted(
        map(tuple, q_geofence_transitions(spark, sf).collect())
    )

    # numpy oracle: per user, pair = (first, second) by (ts, id);
    # both pings share the timestamp ordering above
    want = []
    for u in range(n_users):
        a, b = int(eids[2 * u]), int(eids[2 * u + 1])
        lon1, lat1 = geometry.lonlat_from_id(np.array([a]))
        lon2, lat2 = geometry.lonlat_from_id(np.array([b]))
        for pid, poly in enumerate(PIP_ALL_POLYS):
            was = bool(point_in_polygon(lon1, lat1, poly)[0])
            now = bool(point_in_polygon(lon2, lat2, poly)[0])
            if was != now:
                want.append((u, b, pid, int(now)))
    assert got == sorted(want)
    assert len(want) > 0  # the fixture actually exercises flips


def test_colocation_matches_bruteforce(spark, tmp_path):
    """colocation_pairs equals a pandas brute-force over the same
    derived cells/hours, and every pair is emitted once with u1<u2."""
    from covertree_spark.core import cells as cellcodec
    from covertree_spark.queries import (
        COLOC_BUCKET_US,
        COLOC_RES,
        q_colocation_pairs,
    )

    rng = np.random.default_rng(11)
    n = 3000
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 40, n).astype(np.int64),
            "ts": pd.to_datetime("2024-03-01")
            + pd.to_timedelta(rng.integers(0, 72 * 3600, n), unit="s"),
        }
    )
    sf = str(tmp_path)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{sf}/events.parquet"
    )

    got = sorted(map(tuple, q_colocation_pairs(spark, sf).collect()))

    lon, lat = geometry.lonlat_from_id(pdf["event_id"].to_numpy())
    cell = cellcodec.cell_id(lon, lat, COLOC_RES)
    us = pdf["ts"].astype("int64").to_numpy() // 1000  # ns -> us
    hr = us // COLOC_BUCKET_US
    obs = set(zip(pdf["user_id"], cell, hr))
    from collections import Counter

    by_bucket = {}
    for u, c, h in obs:
        by_bucket.setdefault((c, h), []).append(u)
    cnt = Counter()
    for users in by_bucket.values():
        us_sorted = sorted(users)
        for i in range(len(us_sorted)):
            for j in range(i + 1, len(us_sorted)):
                cnt[(us_sorted[i], us_sorted[j])] += 1
    want = sorted((u1, u2, c) for (u1, u2), c in cnt.items())
    assert got == want
    assert all(u1 < u2 for u1, u2, _ in got)
    assert len(got) > 0
