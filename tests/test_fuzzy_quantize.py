"""Pins for fuzzy_join (FastSS completeness at distance 1) and
emb_quantize (known-value quantization)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_TINY


def _fastss_pairs(spark, strings):
    """Run the engine's deletion-neighborhood join on raw strings."""
    from covertree_spark.queries import q_fuzzy_join  # noqa: F401 (pattern)

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], "id long, s string"
    )
    vars_ = df.select(
        "id",
        "s",
        F.explode(
            F.expr(
                "transform(sequence(0, length(s)), i -> CASE WHEN i = 0 "
                "THEN s ELSE concat(substring(s, 1, i - 1), "
                "substring(s, i + 1, length(s))) END)"
            )
        ).alias("v"),
    ).distinct()
    a, b = vars_.alias("a"), vars_.alias("b")
    cand = (
        a.join(b, (F.col("a.v") == F.col("b.v")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("x"),
            F.col("b.id").alias("y"),
            F.col("a.s").alias("sa"),
            F.col("b.s").alias("sb"),
        )
        .distinct()
    )
    return {
        (r.x, r.y)
        for r in cand.withColumn("d", F.levenshtein("sa", "sb"))
        .where(F.col("d") <= 1)
        .collect()
    }


def _lev(a, b):
    la, lb = len(a), len(b)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, lb + 1):
            cur = min(
                dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
            prev, dp[j] = dp[j], cur
    return dp[lb]


def test_fastss_complete_at_distance_one(spark):
    strings = [
        "banana", "banan", "bananas", "banxna", "bnana",  # indel/sub family
        "apple", "appl", "apples", "axple",
        "cherry", "cherry",  # exact dup (distinct ids)
        "", "a", "b",  # degenerate short keys
    ]
    got = _fastss_pairs(spark, strings)
    want = {
        (i, j)
        for i in range(len(strings))
        for j in range(i + 1, len(strings))
        if _lev(strings[i], strings[j]) <= 1
    }
    assert got == want
    assert len(want) >= 10


def test_fuzzy_join_catalog_nonempty(spark):
    from covertree_spark.queries import q_fuzzy_join

    rows = q_fuzzy_join(spark, SF_TINY).collect()
    assert all(r.d <= 1 and r.a < r.b for r in rows)


def test_emb_quantize_known_values(spark):
    import pandas as pd
    from covertree_spark.queries import q_emb_quantize  # noqa: F401

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [0, 1],
                "embedding": [
                    np.array([0.0, 1.0, -1.0, 2.0, -2.0], dtype=np.float32),
                    np.array([0.5, -0.5, 0.0039, 0.996], dtype=np.float32),
                ],
            }
        )
    )
    q = (
        "transform(embedding, v -> CAST(floor(least(greatest("
        "CAST(v AS DOUBLE), CAST(-1 AS DOUBLE)), CAST(1 AS DOUBLE)) "
        "* CAST(127 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT))"
    )
    got = {r.vec_id: r.q for r in df.select("vec_id", F.expr(q).alias("q")).collect()}
    # clip then round-half-up: 2.0 -> 127, -2.0 -> -127
    assert got[0] == [0, 127, -127, 127, -127]
    f32 = np.array([0.5, -0.5, 0.0039, 0.996], dtype=np.float32).astype(np.float64)
    want1 = [int(np.floor(min(max(v, -1.0), 1.0) * 127.0 + 0.5)) for v in f32]
    assert got[1] == want1
