"""Temporal AS-OF join with a HOT-KEY-BOUNDED two-phase plan.

``asof_join(left, right)``: for every left event, the LATEST right
event of the same key with ``right.ts <= left.ts`` (ties at equal
timestamp: the right event participates — "as of now" includes now —
and among equal-timestamp rights the largest id wins). The classic
time-series primitive (kdb's ``aj``, pandas ``merge_asof``, DuckDB's
``ASOF JOIN``) that vanilla Spark SQL lacks; the reference engine has
no temporal surface at all (SURVEY §2.5), so this extends the events
family the same way sessionize did.

Plan shape — the same discipline as operators/sessions.py: the naive
formulation (one window per key over the UNION of both sides) puts a
key's entire history in one task. Here, both sides salt into
(key, time-bucket) groups:

  phase 1: a local window inside each bucket computes, per row, the
    latest right event SO FAR WITHIN THE BUCKET (last ignorenulls over
    a (ts, side, id) ordering in which rights sort before lefts at
    equal ts). Task size is bounded by the largest (key, bucket).

  phase 2: ONE ROW PER (key, bucket) — the bucket's max right
    (ts, id) struct — flows through a per-key window over bucket
    summaries; the carry into bucket b is the max over preceding
    buckets (buckets partition time, so the max preceding struct IS
    the globally latest right event before the bucket).

  final: join the carry back on (key, bucket); a left row's match =
    coalesce(local latest, carried latest). Microsecond-exact integer
    arithmetic; no-match encodes as (-1, -1) rather than NULL so the
    output hashes identically across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_NO_MATCH = -1


def _tagged_union(
    left: DataFrame, right: DataFrame, key_col: str, ts_col: str, id_col: str
) -> DataFrame:
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    l = left.select(
        F.col(key_col).alias("_key"), us.alias("_us"),
        F.col(id_col).alias("_id"), F.lit(1).alias("_side"),
    )
    r = right.select(
        F.col(key_col).alias("_key"), us.alias("_us"),
        F.col(id_col).alias("_id"), F.lit(0).alias("_side"),
    )
    return r.unionByName(l)


def _emit(matched: DataFrame, id_col: str, key_col: str) -> DataFrame:
    return matched.filter(F.col("_side") == 1).select(
        F.col("_id").alias(id_col),
        F.col("_key").alias(key_col),
        F.coalesce(F.col("_m._id"), F.lit(_NO_MATCH)).cast("bigint").alias("matched_id"),
        F.coalesce(F.col("_us") - F.col("_m._us"), F.lit(_NO_MATCH))
        .cast("bigint")
        .alias("lag_us"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    bucket_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(id_col, key_col, matched_id, lag_us) for every LEFT row;
    matched_id/lag_us are -1 when no right event precedes it. Bounded
    task size: no task ever holds more than one (key, ``bucket_us``
    window) of rows — the documented hot-key contract (a bot key's
    firehose salts across ceil(range/bucket_us) tasks)."""
    ev = _tagged_union(left, right, key_col, ts_col, id_col).withColumn(
        "_bkt", F.floor(F.col("_us") / F.lit(int(bucket_us)))
    )
    right_struct = F.when(
        F.col("_side") == 0, F.struct(F.col("_us"), F.col("_id"))
    )
    w_local = Window.partitionBy("_key", "_bkt").orderBy(
        F.col("_us").asc(), F.col("_side").asc(), F.col("_id").asc()
    )
    local = ev.withColumn(
        "_loc",
        F.last(right_struct, ignorenulls=True).over(
            w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # phase 2: one row per (key, bucket) — max right struct in bucket
    summ = ev.groupBy("_key", "_bkt").agg(F.max(right_struct).alias("_bmax"))
    w_key = Window.partitionBy("_key").orderBy(F.col("_bkt").asc())
    carry = summ.select(
        "_key", "_bkt",
        F.max("_bmax")
        .over(w_key.rowsBetween(Window.unboundedPreceding, -1))
        .alias("_carry"),
    )
    matched = local.join(carry, ["_key", "_bkt"]).withColumn(
        "_m", F.coalesce(F.col("_loc"), F.col("_carry"))
    )
    return _emit(matched, id_col, key_col)


def asof_join_single_window(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """The classic one-window formulation — correct at human-scale
    per-key cardinality, unbounded task size on a hot key. Kept as the
    parity reference for the two-phase plan."""
    ev = _tagged_union(left, right, key_col, ts_col, id_col)
    w = Window.partitionBy("_key").orderBy(
        F.col("_us").asc(), F.col("_side").asc(), F.col("_id").asc()
    )
    matched = ev.withColumn(
        "_m",
        F.last(
            F.when(F.col("_side") == 0, F.struct(F.col("_us"), F.col("_id"))),
            ignorenulls=True,
        ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return _emit(matched, id_col, key_col)
