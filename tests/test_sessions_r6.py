"""Round-6: the session family's data-adaptive one-window small path
must be row-identical to the hot-key-bounded two-phase shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from covertree_spark.operators import sessions


@pytest.fixture(scope="module")
def events(spark):
    rng = np.random.default_rng(17)
    n = 5000
    rows = [
        (
            int(i),
            int(rng.integers(0, 40)),
            # second-resolution ts with deliberate duplicates (ties
            # break on event_id) spanning many buckets
            f"2031-03-0{1 + int(rng.integers(0, 7))} "
            f"{rng.integers(0, 24):02d}:{rng.integers(0, 60):02d}:"
            f"{rng.integers(0, 60):02d}",
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string"
    ).persist()
    df.count()
    yield df
    df.unpersist()


BUCKET = 3_600_000_000  # 1h buckets: plenty of cross-bucket stitches


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_consecutive_pairs_paths_match(events):
    cols = ["user_id", "event_id", "prev_id", "us", "prev_us"]
    small = _rows(sessions.consecutive_pairs(events, BUCKET), cols)
    two_phase = _rows(
        sessions.consecutive_pairs(events, BUCKET, small_cutoff=0), cols
    )
    assert small == two_phase
    assert len(small) > 4000  # sanity: nearly every event has a pred


def test_sessionize_paths_match(events):
    gap = 2 * 3_600_000_000
    cols = ["event_id", "user_id", "sess"]
    small = _rows(sessions.sessionize(events, gap), cols)
    two_phase = _rows(
        sessions.sessionize(events, gap, small_cutoff=0), cols
    )
    assert small == two_phase


def test_prefix_starts_paths_match(events):
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    flagged = events.select(
        "event_id",
        "user_id",
        us.alias("us"),
        (F.col("event_id") % 3 == 0).cast("int").alias("st"),
    )
    n = flagged.count()
    cols = ["user_id", "event_id", "us", "st", "trip"]
    small = _rows(
        sessions.prefix_starts(flagged, BUCKET, n_hint=n), cols
    )
    two_phase = _rows(
        sessions.prefix_starts(flagged, BUCKET, n_hint=n, small_cutoff=0),
        cols,
    )
    assert small == two_phase


def test_fused_trip_and_stay_queries_match_composed(spark, monkeypatch):
    """r6: the fused one-window small paths of q_user_trips and
    q_stay_points must be row-identical to the composed pair-window +
    stitch-join + prefix shape (forced by zeroing the dial)."""
    from covertree_spark import queries as Q

    sf = "/root/testdata/sf0.01"
    for qname in ("user_trips", "stay_points", "session_overlap"):
        fn = Q.catalog()[qname][0]
        fused = sorted(map(tuple, fn(spark, sf).collect()))
        monkeypatch.setattr(sessions, "SMALL_CUTOFF", 0)
        composed = sorted(map(tuple, fn(spark, sf).collect()))
        monkeypatch.undo()
        assert len(fused) > 0
        assert fused == composed, qname
