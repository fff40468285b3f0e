"""Distributed convex hull (operators/hull.py): partition-count
invariance (the associative-merge property), agreement with a single
driver-side hull, and the degenerate inputs (collinear, duplicates,
tiny n)."""

import numpy as np
import pytest

from covertree_spark.operators.hull import convex_hull, hull_indices


def _spark_hull(spark, pts, nparts):
    rows = [(int(i), float(x), float(y)) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, schema="id bigint, lon double, lat double"
    ).repartition(nparts)
    return convex_hull(df).collect()


def _local_hull(pts):
    ids = np.arange(len(pts), dtype=np.int64)
    sel = hull_indices(pts[:, 0], pts[:, 1], ids)
    return [(int(k), int(ids[j]), float(pts[j, 0]), float(pts[j, 1]))
            for k, j in enumerate(sel)]


def test_matches_local_and_partition_invariant(spark):
    pts = np.random.default_rng(5).normal(size=(5000, 2)) * 40
    exp = _local_hull(pts)
    for nparts in (1, 7, 32):
        got = [tuple(r) for r in _spark_hull(spark, pts, nparts)]
        assert got == exp, f"nparts={nparts}"


def test_hull_is_convex_and_contains_all(spark):
    pts = np.random.default_rng(9).uniform(-10, 10, size=(800, 2))
    got = _spark_hull(spark, pts, 8)
    hull = np.array([(r["lon"], r["lat"]) for r in got])
    # every input point is inside or on the hull (CCW: cross >= 0)
    for i in range(len(hull)):
        a, b = hull[i], hull[(i + 1) % len(hull)]
        cross = (b[0] - a[0]) * (pts[:, 1] - a[1]) - (b[1] - a[1]) * (
            pts[:, 0] - a[0]
        )
        assert (cross >= -1e-9).all()


def test_collinear_and_duplicates(spark):
    # all points on a line, with exact duplicates
    xs = np.arange(10.0)
    pts = np.stack([xs, 2 * xs], axis=1)
    pts = np.vstack([pts, pts[:3]])  # duplicates
    got = _spark_hull(spark, pts, 4)
    ends = {(r["lon"], r["lat"]) for r in got}
    assert ends == {(0.0, 0.0), (9.0, 18.0)}


def test_tiny_inputs(spark):
    assert len(_spark_hull(spark, np.array([[1.0, 2.0]]), 3)) == 1
    two = _spark_hull(spark, np.array([[1.0, 2.0], [3.0, 4.0]]), 3)
    assert len(two) == 2


def test_empty_input(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 0.0, 0.0)], schema="id bigint, lon double, lat double"
    ).filter(F.lit(False))
    assert convex_hull(df).count() == 0
