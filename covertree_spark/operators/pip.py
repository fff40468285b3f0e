"""Point-in-polygon join (BASELINE extension; reference has none —
SURVEY.md §2.9).

Plan: polygons are a broadcast-sized dimension. Phase 1 prunes with
polygon bounding boxes (the relational analog of the cell-cover
prune — at scale this becomes a range join on cell ids of the
polygon's cell cover); phase 2 is the exact vectorized test inside a
single mapInPandas pass over the points.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..core.polygons import point_in_convex, point_in_polygon


def pip_join(
    points: DataFrame,
    polys: list[np.ndarray],
    convex: bool = False,
    lon_col: str = "lon",
    lat_col: str = "lat",
    id_col: str = "id",
) -> DataFrame:
    """points(id, lon, lat) x polygons -> (id, poly_id). ``polys`` is a
    list of (m, 2) vertex arrays (CCW for convex mode)."""
    spark = points.sparkSession
    bundles = [
        (np.asarray(p, dtype=np.float64),
         (p[:, 0].min(), p[:, 0].max(), p[:, 1].min(), p[:, 1].max()))
        for p in polys
    ]
    bc = spark.sparkContext.broadcast(bundles)
    test = point_in_convex if convex else point_in_polygon

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bs = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            px = pdf[lon_col].to_numpy(dtype=np.float64)
            py = pdf[lat_col].to_numpy(dtype=np.float64)
            ids = pdf[id_col].to_numpy()
            out_ids, out_pid = [], []
            for pid, (poly, (x0, x1, y0, y1)) in enumerate(bs):
                # bbox prune, then exact test on survivors only
                m = (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
                if not m.any():
                    continue
                hit = test(px[m], py[m], poly)
                sel = ids[m][hit]
                out_ids.append(sel)
                out_pid.append(np.full(len(sel), pid, dtype=np.int64))
            if out_ids:
                yield pd.DataFrame(
                    {"id": np.concatenate(out_ids), "poly_id": np.concatenate(out_pid)}
                )

    return points.mapInPandas(run, schema="id bigint, poly_id bigint")
