"""Skyline (pareto-frontier) operator over two total-ordered columns.

The classic preference query (Borzsony et al., ICDE 2001): keep rows
not DOMINATED by any other — ``a`` dominates ``b`` when ``a`` is <= on
the minimized column and >= on the maximized column with at least one
strict. The reference has no analog (it stops at top-k, SURVEY §2.7);
this extends that family with the multi-objective form a curation
pipeline uses for "closest AND highest-quality" picks.

Spark-first plan: dominance is partition-independent (a local dominator
is a global dominator), so phase 1 runs the skyline filter inside every
partition of ANY deterministic partitioning — two window functions per
partition, no shuffle of the input beyond its existing layout — and
phase 2 re-runs the same filter globally over the (tiny) survivor set.
For n random rows a 2-d skyline has ~H(n) = O(log n) expected members,
so phase 2's single-task window is microscopic at any scale; the heavy
lifting stays fully parallel. Both phases are pure JVM window
aggregates (no UDFs).

The keep rule, exact and engine-portable (ties kept on both sides):
row ``r`` survives iff
  max(val) over rows with dist <  r.dist   is NULL or < r.val, and
  max(val) over rows with dist == r.dist   equals r.val.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sky_filter(df: DataFrame, dist_col: str, val_col: str, part_cols) -> DataFrame:
    w_lt = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col(dist_col).asc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_eq = Window.partitionBy(*part_cols, dist_col)
    out = df.withColumn("_m1", F.max(F.col(val_col)).over(w_lt)).withColumn(
        "_m2", F.max(F.col(val_col)).over(w_eq)
    )
    return out.where(
        (F.col("_m1").isNull() | (F.col("_m1") < F.col(val_col)))
        & (F.col("_m2") == F.col(val_col))
    ).drop("_m1", "_m2")


def skyline_2d(
    df: DataFrame,
    dist_col: str,
    val_col: str,
    prefilter_col: str | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Skyline minimizing ``dist_col`` (integer) and maximizing
    ``val_col``. ``prefilter_col``: any deterministic integer column to
    bucket phase 1 on (defaults to a hash-derived bucket of the first
    column, keeping phase 1 shuffle-free relative to cardinality)."""
    if prefilter_col is None:
        first = df.columns[0]
        df = df.withColumn("_b", F.pmod(F.xxhash64(F.col(first)), F.lit(n_buckets)))
        local = _sky_filter(df, dist_col, val_col, ["_b"]).drop("_b")
    else:
        local = _sky_filter(df, dist_col, val_col, [prefilter_col])
    return _sky_filter(local, dist_col, val_col, [])


def sql_skyline_2d(inner_sql: str, dist_col: str, val_col: str, out_cols: str) -> str:
    """ANSI-SQL oracle: the same two-window keep rule, single global
    pass (no prefilter — dominance-preserving, so results match)."""
    return (
        f"WITH sky_in AS ({inner_sql}), sky_m AS (SELECT *, "
        f"max({val_col}) OVER (ORDER BY {dist_col} RANGE BETWEEN "
        f"UNBOUNDED PRECEDING AND 1 PRECEDING) AS _m1, "
        f"max({val_col}) OVER (PARTITION BY {dist_col}) AS _m2 FROM sky_in) "
        f"SELECT {out_cols} FROM sky_m "
        f"WHERE (_m1 IS NULL OR _m1 < {val_col}) AND _m2 = {val_col}"
    )
