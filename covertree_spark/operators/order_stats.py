"""Exact distributed order statistics (quantiles by global rank).

The reference's analytics surface is distance-centric; a training-data
pipeline also needs EXACT corpus statistics — "the 90th-percentile
document length" decides truncation budgets, and an approximate answer
(percentile_approx) silently shifts with partitioning. This operator
computes exact order statistics WITHOUT a single-task global sort:

  1. range-partition the (value, tie) pairs (``repartitionByRange`` —
     Spark's sampled range partitioner, the same primitive its own
     scalable sort uses) and sort within each partition;
  2. ONE tiny pass counts rows per physical partition (#partitions
     integers to the driver — not data);
  3. each partition knows its global prefix offset, so the rows whose
     1-based global rank matches a requested rank are emitted locally.

Total cost: one shuffle of (value, tie) pairs + two scans of the
sorted layout. No window over an unpartitioned ORDER BY anywhere (that
plans as a one-task sort — the classic scale trap this replaces).

Determinism: ranks are defined over the TOTAL order (value, tie), so
ties cannot reorder between engines; rank arithmetic is integer-exact
(``1 + (q * (n-1)) // denom`` — no float quantile interpolation).

Reference parity: the reference has no quantile operator; this extends
its global-reduce family (include/dist_point_vector.h gather/reduce)
to order statistics, per the LLM-pipeline mandate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..plans.session import mark_releasable


def exact_quantile_ranks(n: int, qs: list[int], denom: int) -> dict[int, int]:
    """1-based global rank of quantile q/denom over n rows: the
    element at zero-based index floor(q*(n-1)/denom) of the sorted
    order — integer arithmetic only, identical in SQL as
    ``1 + (q * (n-1)) // denom``."""
    return {q: 1 + (q * (n - 1)) // denom for q in qs}


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    qs: list[int] | None = None,
    denom: int = 10,
    nparts: int | None = None,
) -> DataFrame:
    """(decile, score) rows: exact order statistics of ``value_col``
    under the total order (value, tie). ``qs`` are numerators over
    ``denom`` (default: deciles 1..9)."""
    spark = df.sparkSession
    qs = list(qs) if qs is not None else list(range(1, denom))
    nparts = nparts or int(spark.conf.get("spark.sql.shuffle.partitions"))

    n = df.count()
    if n == 0:
        return spark.createDataFrame([], schema="decile bigint, score bigint")
    ranks = exact_quantile_ranks(n, qs, denom)

    pairs = df.select(F.col(value_col).alias("v"), F.col(tie_col).alias("t"))
    s = mark_releasable(
        pairs.repartitionByRange(nparts, "v", "t")
        .sortWithinPartitions("v", "t")
        .persist()
    )

    # pass 1: rows per PHYSICAL partition — #partitions ints, not data.
    # persist() pins the layout, so pass 2 sees the same partitions.
    def count_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        total = sum(len(b) for b in batches)
        yield pd.DataFrame({"pid": [pid], "cnt": [total]})

    rows = s.mapInPandas(count_rows, schema="pid int, cnt bigint").collect()
    counts = {int(r["pid"]): int(r["cnt"]) for r in rows}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    b_off = spark.sparkContext.broadcast((offsets, ranks))

    # pass 2: each partition emits the rows whose global rank it owns
    def pick(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        offs, rk = b_off.value
        pid = TaskContext.get().partitionId()
        base = offs.get(pid, 0)
        local = 0
        for pdf in batches:
            m = len(pdf)
            out_q, out_v = [], []
            for q, r in rk.items():
                j = r - base - local - 1  # zero-based index into batch
                if 0 <= j < m:
                    out_q.append(q)
                    out_v.append(pdf["v"].iloc[j])
            if out_q:
                yield pd.DataFrame({"decile": out_q, "score": out_v})
            local += m

    return s.mapInPandas(pick, schema="decile bigint, score bigint")


def sql_exact_quantiles(
    value_expr: str, tie_expr: str, table: str, denom: int = 10
) -> str:
    """Oracle: the same rank arithmetic via one window (fine at oracle
    scale; the Spark side exists precisely because this single-ORDER-BY
    formulation doesn't distribute)."""
    return f"""
WITH ranked AS (
  SELECT {value_expr} AS score,
         row_number() OVER (ORDER BY {value_expr}, {tie_expr}) AS rn,
         count(*) OVER () AS n
  FROM {table}
), qs AS (SELECT unnest(range(1, {denom})) AS q)
SELECT CAST(q AS BIGINT) AS decile, CAST(score AS BIGINT) AS score
FROM ranked, qs
WHERE rn = 1 + (q * (n - 1)) // {denom}
"""
