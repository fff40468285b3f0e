"""Distributed convex hull — an associative geometric aggregate.

hull(A ∪ B) = hull(hull(A) ∪ hull(B)), so the hull distributes like
any algebraic aggregate: each partition reduces its point stream to a
partial hull (O(hull) rows — for n scattered points the expected hull
is O(log n)), partials union into one tiny final reduce. The pattern
is the reference's global argmax reduce (SURVEY A2) generalized to a
set-valued combiner; no point set ever gathers anywhere.

Determinism: hull vertices are INPUT POINTS — the kernel only ever
evaluates sign(cross product) to select them, never synthesizes a
coordinate — and collinear/duplicate candidates resolve by the total
order (lon, lat, id). The result is therefore identical at any
partitioning (the cross-rank equivalence property,
/root/reference/test.sh:10-23).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def hull_indices(lon: np.ndarray, lat: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain over (lon, lat, id)-sorted points;
    returns positions of the CCW hull (strict — collinear interior
    points dropped), starting at the lexicographically smallest point.
    Duplicate coordinates keep the smallest id (the sort's first)."""
    n = len(lon)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    order = np.lexsort((ids, lat, lon))
    # drop exact coordinate duplicates (keep first = smallest id)
    keep = np.ones(len(order), dtype=bool)
    keep[1:] = (np.diff(lon[order]) != 0) | (np.diff(lat[order]) != 0)
    order = order[keep]
    if len(order) <= 2:
        return order
    x, y = lon[order], lat[order]

    def chain(idx: np.ndarray) -> list[int]:
        out: list[int] = []
        for i in idx:
            while len(out) >= 2:
                o, a = out[-2], out[-1]
                if (x[a] - x[o]) * (y[i] - y[o]) - (y[a] - y[o]) * (
                    x[i] - x[o]
                ) <= 0:
                    out.pop()
                else:
                    break
            out.append(i)
        return out

    fwd = np.arange(len(order))
    lower = chain(fwd)
    upper = chain(fwd[::-1])
    sel = lower[:-1] + upper[:-1]
    if not sel:  # all collinear: chain keeps only the two endpoints
        sel = [lower[0], lower[-1]] if len(lower) > 1 else [0]
    return order[np.asarray(sel, dtype=np.int64)]


def convex_hull(
    pts: DataFrame, id_col: str = "id", lon_col: str = "lon", lat_col: str = "lat"
) -> DataFrame:
    """(vertex_idx, id, lon, lat): CCW convex hull of the point table.
    One partial-hull pass over the data, one single-task final reduce
    over O(partitions x |partial hull|) rows — the same driver-free
    shape as TakeOrdered's partial-heap merge."""
    base = pts.selectExpr(
        f"{id_col} as id",
        f"cast({lon_col} as double) as lon",
        f"cast({lat_col} as double) as lat",
    )
    schema = "id bigint, lon double, lat double"

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: pd.DataFrame | None = None
        for pdf in batches:
            if pdf.empty:
                continue
            cur = pdf if acc is None else pd.concat([acc, pdf], ignore_index=True)
            sel = hull_indices(
                cur["lon"].to_numpy(np.float64),
                cur["lat"].to_numpy(np.float64),
                cur["id"].to_numpy(np.int64),
            )
            acc = cur.iloc[sel].reset_index(drop=True)
        if acc is not None and len(acc):
            yield acc[["id", "lon", "lat"]]

    partials = base.mapInPandas(partial, schema=schema)

    def final(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = list(batches)
        if not parts:  # empty input table
            return
        cur = pd.concat(parts, ignore_index=True)
        if cur.empty:
            return
        sel = hull_indices(
            cur["lon"].to_numpy(np.float64),
            cur["lat"].to_numpy(np.float64),
            cur["id"].to_numpy(np.int64),
        )
        out = cur.iloc[sel].reset_index(drop=True)
        out.insert(0, "vertex_idx", np.arange(len(out), dtype=np.int64))
        yield out

    return partials.coalesce(1).mapInPandas(
        final, schema="vertex_idx bigint, " + schema
    )
