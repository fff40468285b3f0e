"""Hot-key-safe grouped top-k — exact per-group top-k whose task size
never depends on a single group's cardinality.

The naive plan (one window `PARTITION BY group ORDER BY ...` + rank
filter) puts each group's ENTIRE row set in one task: with zipfian
group keys (languages, domains, users — every key a web corpus has),
the hottest group serializes the stage. Same failure mode round-4
VERDICT flagged for sessionization; this is the generic reduction.

Two-phase shape (the sessionize stitch, specialized to selection):

  phase 1: rows salt into ``salt_mod`` sub-groups by a hash of the tie
    column; a window per (group, salt) keeps each sub-group's local
    top-k. A hot group fans across ``salt_mod`` tasks; task size is
    bounded by group_size/salt_mod (hash-balanced). Spark plans the
    rank<=k filter as WindowGroupLimit — per-partition k-row heaps
    ahead of the shuffle, so phase 1 moves O(groups x salt_mod x k)
    rows into the window, not the table.

  phase 2: candidates (<= salt_mod x k per group) run the same window
    unsalted — now provably bounded input per group.

Exactness: the global top-k of a group is contained in the union of
its sub-groups' top-k's (each discarded row loses to >= k rows in its
own sub-group), so phase 2 sees every global winner. Ties are broken
by the total order (order_cols must end in a unique column) — both
phases and the SQL oracle rank identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    salt_col: str | Column = None,
    salt_mod: int = 32,
) -> DataFrame:
    """Exact top-k rows per group under ``order_cols`` (a TOTAL order —
    end it with a unique tiebreak column). ``salt_col`` (default: the
    first order column) seeds the phase-1 hash salt."""
    seed = salt_col if salt_col is not None else order_cols[-1]
    seed = F.col(seed) if isinstance(seed, str) else seed
    salt = F.pmod(F.xxhash64(seed), F.lit(salt_mod))

    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(*order_cols)
    cand = (
        df.withColumn("_salt", salt)
        .withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_salt", "_rn")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        cand.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .withColumnRenamed("_rn", "rank")
        .withColumn("rank", F.col("rank").cast("bigint"))
    )
