"""Cell-keyed grouped execution with ONE explicit shuffle.

``grouped_apply(df, key, func, schema)`` is the engine's replacement
for the reference's alltoallv + per-cell loop
(/root/reference/src/dist_point_vector.cpp:710-832): it range-
partitions by the integer key (the BASELINE-mandated explicit
``repartitionByRange`` on cell id), sorts within partitions, and
streams Arrow batches through ``mapInPandas``, cutting exact group
boundaries as keys change. Unlike ``groupBy().applyInPandas`` this
gives us (a) the range partitioner — contiguous cell ranges per task,
which keeps spatially-adjacent cells on the same executor — and
(b) one shuffle total, with per-group memory bounded by the largest
single cell rather than the partition.

``strategy="hash"`` falls back to ``groupBy().applyInPandas`` for
A/B benchmarking.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .metrics import counted_stream


def grouped_apply(
    df: DataFrame,
    key: str,
    func: Callable[[object, pd.DataFrame], pd.DataFrame],
    schema,
    strategy: str = "range",
    num_partitions: int | None = None,
) -> DataFrame:
    """Apply ``func(key_value, group_pdf) -> pdf`` per distinct key.

    ``func`` must be a pure function of its group (no cross-group
    state) so results are invariant to the partitioning strategy.
    """
    if strategy == "hash":
        def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
            return func(pdf[key].iloc[0], pdf)

        return df.groupBy(key).applyInPandas(apply_fn, schema=schema)

    if strategy == "aligned":
        # caller guarantees the input is already partitioned by key with
        # whole, contiguous groups per partition (e.g. a persisted
        # repartitionByRange(...).sortWithinPartitions(...) result, or a
        # table written cell-partitioned at ingest). Zero extra shuffle:
        # at scale the ONE ingest shuffle amortizes across every
        # downstream stage.
        def stream_aligned(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            yield from _stream_groups(batches, key, func)

        return df.mapInPandas(counted_stream(stream_aligned), schema=schema)

    if strategy not in ("range", "hash_shuffle"):
        raise ValueError(f"unknown strategy {strategy!r}")

    def stream_groups(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from _stream_groups(batches, key, func)

    parts = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    if strategy == "hash_shuffle":
        # hash-partitioned explicit shuffle: same per-group co-location
        # guarantee as range, but NO range-boundary sampling job — the
        # range partitioner evaluates the input an extra time to sample
        # split points, which forces either a persist or a recompute of
        # upstream UDF stages (phase-1 candidates, ghost dilation).
        # Use for transient query-side shuffles; keep "range" for
        # persisted LAYOUTS where contiguous cell ranges aid locality.
        shuffled = df.repartition(int(parts), F.col(key)).sortWithinPartitions(key)
    else:
        shuffled = df.repartitionByRange(int(parts), F.col(key)).sortWithinPartitions(key)
    return shuffled.mapInPandas(counted_stream(stream_groups), schema=schema)


def _stream_groups(
    batches: Iterator[pd.DataFrame], key: str, func
) -> Iterator[pd.DataFrame]:
    """Cut exact group boundaries from key-sorted Arrow batches; per-
    group memory is bounded by the largest single cell."""
    pending: list[pd.DataFrame] = []
    pending_key = None

    def flush():
        if not pending:
            return None
        group = pd.concat(pending, ignore_index=True) if len(pending) > 1 else pending[0]
        return func(pending_key, group)

    for pdf in batches:
        if pdf.empty:
            continue
        keys = pdf[key].to_numpy()
        start = 0
        n = len(keys)
        while start < n:
            k = keys[start]
            end = start
            while end < n and keys[end] == k:
                end += 1
            chunk = pdf.iloc[start:end]
            if pending_key is not None and k != pending_key:
                out = flush()
                if out is not None and len(out):
                    yield out
                pending = []
            pending_key = k
            pending.append(chunk)
            start = end
    out = flush()
    if out is not None and len(out):
        yield out
