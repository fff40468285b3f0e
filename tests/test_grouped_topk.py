"""Hot-key-safe grouped top-k (operators/topk.py): exactness vs the
one-window formulation on skewed data, and the plan contract — phase 1
must fan a hot group across salt sub-windows and plan the rank filter
as WindowGroupLimit (k-row heaps before the shuffle)."""

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from covertree_spark.operators.topk import grouped_topk


@pytest.fixture(scope="module")
def skewed(spark):
    # one zipf-hot group (90% of rows), several cold ones, tie values
    rng = np.random.default_rng(3)
    n = 20_000
    grp = np.where(rng.random(n) < 0.9, 0, rng.integers(1, 8, size=n))
    val = rng.integers(0, 50, size=n)  # heavy ties
    rows = [(int(g), int(i), int(v)) for i, (g, v) in enumerate(zip(grp, val))]
    return spark.createDataFrame(rows, schema="g bigint, id bigint, v bigint")


def _naive(df, k):
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("id").asc())
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("bigint"))
    )


def test_matches_naive_window_on_skew(spark, skewed):
    k = 5
    got = grouped_topk(
        skewed, ["g"], [F.col("v").desc(), F.col("id").asc()], k=k,
        salt_col="id",
    )
    exp = _naive(skewed, k)
    cols = ["g", "rank", "id", "v"]
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, exp.select(cols).collect())
    )


def test_k_larger_than_group(spark):
    df = spark.createDataFrame(
        [(1, 1, 10), (1, 2, 20), (2, 3, 5)], schema="g bigint, id bigint, v bigint"
    )
    got = grouped_topk(
        df, ["g"], [F.col("v").desc(), F.col("id").asc()], k=10, salt_col="id"
    )
    assert got.count() == 3  # every row survives when k >= group size


def test_plan_has_window_group_limit_and_salted_phase(spark, skewed):
    got = grouped_topk(
        skewed, ["g"], [F.col("v").desc(), F.col("id").asc()], k=3,
        salt_col="id",
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    # rank<=k filters plan as WindowGroupLimit: per-partition k-row
    # heaps ahead of each window's shuffle (the phase-1 volume bound)
    assert "WindowGroupLimit" in plan
    # phase 1 partitions by (group, salt) — the hot-key fan-out
    assert "_salt" in plan
