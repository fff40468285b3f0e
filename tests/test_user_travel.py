"""consecutive_pairs (hot-key-bounded lag) + user_travel exactness."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from covertree_spark.core import geometry  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.usefixtures("spark")
def test_consecutive_pairs_matches_single_window(spark):
    """The two-phase bucket-stitched lag must equal the classic
    one-window lag on the real fixture, at a bucket size small enough
    that MOST predecessors cross bucket boundaries (stitch path
    exercised, not just the local path)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from covertree_spark.operators.sessions import consecutive_pairs
    from covertree_spark.sources import tables as src

    ev = src.load_table(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    want = sorted(
        map(
            tuple,
            ev.select(
                "user_id",
                "event_id",
                F.lag("event_id").over(w).alias("prev_id"),
            )
            .filter(F.col("prev_id").isNotNull())
            .collect(),
        )
    )
    for bucket_us in (3_600_000_000, 21_600_000_000, 86_400_000_000):
        got = sorted(
            map(tuple, consecutive_pairs(ev, bucket_us=bucket_us).collect())
        )
        assert got == want, f"bucket_us={bucket_us}"


@pytest.mark.usefixtures("spark")
def test_travel_segment_quantization_clearance(spark):
    """Every segment's metre quantization must sit clear of its floor
    boundary: the two engines' libm/SIMD trig differ by ~1 ulp, so a
    raw km value within ~1e-9 of a half-metre boundary could floor
    differently. Assert the fixture clears by >= 1e-6 m so a future
    data change fails loudly instead of flipping one integer."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from covertree_spark.sources import tables as src

    ev = src.load_table(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    pairs = (
        ev.select(
            "event_id", F.lag("event_id").over(w).alias("prev_id")
        )
        .filter(F.col("prev_id").isNotNull())
        .toPandas()
    )
    lon1, lat1 = geometry.lonlat_from_id(pairs["prev_id"].to_numpy())
    lon2, lat2 = geometry.lonlat_from_id(pairs["event_id"].to_numpy())
    km_q = geometry.haversine_km(lon1, lat1, lon2, lat2)
    v = km_q * 1000.0 + 0.5
    frac = v - np.floor(v)
    clearance = float(np.minimum(frac, 1.0 - frac).min())
    assert clearance > 1e-6, clearance
    # and the recovered integers are consistent with the quantized km
    m = geometry.haversine_m_int(lon1, lat1, lon2, lat2)
    assert np.abs(m / 1000.0 - km_q).max() < 1e-9
