"""Exact distributed quantiles (operators/order_stats.py): the
selection must equal a driver-side numpy sort under the identical
(value, tie) total order, at awkward partition counts, with heavy
ties, and at the n=1 edge — the properties the range-partitioned
prefix-offset plan must preserve."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from covertree_spark.operators.order_stats import (
    exact_quantile_ranks,
    exact_quantiles,
)


def _expected(vals, ties, qs=range(1, 10), denom=10):
    order = np.lexsort((ties, vals))
    sv = np.asarray(vals)[order]
    n = len(sv)
    return {q: int(sv[(q * (n - 1)) // denom]) for q in qs}


def _got(df):
    return {int(r["decile"]): int(r["score"]) for r in df.collect()}


def test_matches_numpy_selection_awkward_sizes(spark):
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 97, size=1013).tolist()  # many ties, odd n
    ids = list(range(1013))
    df = spark.createDataFrame(
        list(zip(ids, vals)), schema="doc_id bigint, v bigint"
    )
    got = _got(exact_quantiles(df, "v", "doc_id", nparts=7))
    assert got == _expected(vals, ids)


def test_all_equal_values(spark):
    df = spark.range(200).select(
        F.col("id").alias("doc_id"), F.lit(42).cast("bigint").alias("v")
    )
    got = _got(exact_quantiles(df, "v", "doc_id", nparts=5))
    assert got == {q: 42 for q in range(1, 10)}


def test_single_row_and_empty(spark):
    one = spark.createDataFrame([(7, 99)], schema="doc_id bigint, v bigint")
    got = _got(exact_quantiles(one, "v", "doc_id", nparts=3))
    assert got == {q: 99 for q in range(1, 10)}
    empty = one.filter(F.lit(False))
    assert exact_quantiles(empty, "v", "doc_id", nparts=3).count() == 0


def test_rank_arithmetic_integer_exact():
    # rank formula must be pure integer: 1 + (q*(n-1))//denom
    assert exact_quantile_ranks(1, [1, 5, 9], 10) == {1: 1, 5: 1, 9: 1}
    assert exact_quantile_ranks(10, [5], 10) == {5: 5}
    assert exact_quantile_ranks(11, [1, 9], 10) == {1: 2, 9: 10}


def test_descending_input_many_partitions(spark):
    n = 500
    vals = list(range(n, 0, -1))
    ids = list(range(n))
    df = spark.createDataFrame(
        list(zip(ids, vals)), schema="doc_id bigint, v bigint"
    ).repartition(13)
    got = _got(exact_quantiles(df, "v", "doc_id", nparts=9))
    assert got == _expected(vals, ids)
