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


def sql_convex_hull(lon_expr: str, lat_expr: str, id_col: str = "doc_id",
                    table: str = "documents") -> str:
    """ANSI-SQL oracle for ``convex_hull`` (vertex_idx, doc_id) — the
    O(m^3) edge-certificate formulation over Akl-Toussaint survivors.

    (p,q) is a strict-hull edge iff no other point is strictly right
    of p->q and any EXACTLY collinear point lies strictly between them
    (the fixture's lon/lat derivation is affine in id within residue
    classes, so collinear runs sit exactly ON hull edges — their
    interior points are dropped by the strict chain and must not veto
    the spanning edge). The quad prefilter discards points strictly
    inside the 4-extreme-point quadrilateral by a 1e-9 margin — sound:
    the quad is a convex subset of the hull, so its strict interior
    contains no hull vertex, and any point right of a candidate edge
    would contradict all four corners being left of it.

    vertex_idx reproduces the monotone chain's emission order WITHOUT
    a recursive walk (a recursive CTE re-evaluates the edge CTE every
    step): CCW from the lexicographic-min vertex = lower-chain
    interior by (lon, lat) ASC, then the lexicographic-max vertex,
    then upper-chain interior by (lon, lat) DESC — chain membership
    decided by the sign of the cross product against the min->max
    chord (zero only at the endpoints themselves, since strict-hull
    collinear interior vertices do not exist). Assumes distinct
    coordinates (true for the id-derived fixture; convex_hull itself
    dedups exact duplicates keeping the smallest id)."""
    cr = "(e.bx - e.ax) * (p.lat - e.ay) - (e.by - e.ay) * (p.lon - e.ax)"
    rcr = "(b.lon - a.lon) * (r.lat - a.lat) - (b.lat - a.lat) * (r.lon - a.lon)"
    rdot = "(r.lon - a.lon) * (b.lon - a.lon) + (r.lat - a.lat) * (b.lat - a.lat)"
    blen = "(b.lon - a.lon) * (b.lon - a.lon) + (b.lat - a.lat) * (b.lat - a.lat)"
    return f"""
WITH pts AS (SELECT {id_col} AS id, {lon_expr} AS lon, {lat_expr} AS lat FROM {table}),
corners AS (
  SELECT 1 AS k, lon, lat FROM (SELECT * FROM pts ORDER BY lon ASC, lat ASC, id ASC LIMIT 1)
  UNION ALL SELECT 2, lon, lat FROM (SELECT * FROM pts ORDER BY lat ASC, lon DESC, id ASC LIMIT 1)
  UNION ALL SELECT 3, lon, lat FROM (SELECT * FROM pts ORDER BY lon DESC, lat DESC, id ASC LIMIT 1)
  UNION ALL SELECT 4, lon, lat FROM (SELECT * FROM pts ORDER BY lat DESC, lon ASC, id ASC LIMIT 1)
),
qedges AS (
  SELECT c1.lon AS ax, c1.lat AS ay, c2.lon AS bx, c2.lat AS by
  FROM corners c1 JOIN corners c2 ON c2.k = (c1.k % 4) + 1
),
cand AS (
  SELECT p.id, p.lon, p.lat FROM pts p CROSS JOIN qedges e
  GROUP BY p.id, p.lon, p.lat
  HAVING min({cr}) <= 1e-9
),
verts AS (
  SELECT a.id, a.lon, a.lat
  FROM cand a JOIN cand b ON a.id <> b.id
  JOIN cand r ON r.id <> a.id AND r.id <> b.id
  GROUP BY a.id, b.id, a.lon, a.lat, b.lon, b.lat
  HAVING sum(CASE WHEN ({rcr}) < 0
      OR (({rcr}) = 0 AND (({rdot}) <= 0 OR ({rdot}) >= ({blen})))
    THEN 1 ELSE 0 END) = 0
),
lo AS (SELECT lon AS x0, lat AS y0 FROM pts ORDER BY lon ASC, lat ASC, id ASC LIMIT 1),
hi AS (SELECT lon AS x1, lat AS y1 FROM pts ORDER BY lon DESC, lat DESC, id DESC LIMIT 1),
ordered AS (
  SELECT v.id,
    CASE WHEN v.lon = lo.x0 AND v.lat = lo.y0 THEN 0
         WHEN (hi.x1 - lo.x0) * (v.lat - lo.y0) - (hi.y1 - lo.y0) * (v.lon - lo.x0) < 0 THEN 1
         WHEN v.lon = hi.x1 AND v.lat = hi.y1 THEN 2
         ELSE 3 END AS grp,
    v.lon, v.lat
  FROM (SELECT DISTINCT id, lon, lat FROM verts) v CROSS JOIN lo CROSS JOIN hi
)
SELECT CAST(row_number() OVER (ORDER BY grp ASC,
    CASE WHEN grp = 1 THEN lon END ASC, CASE WHEN grp = 1 THEN lat END ASC,
    CASE WHEN grp = 3 THEN lon END DESC, CASE WHEN grp = 3 THEN lat END DESC
  ) - 1 AS BIGINT) AS vertex_idx, id AS doc_id
FROM ordered
"""
