"""Raster-tile assignment + tile rollups (BASELINE extension).

A "tile" is the cell codec at a fixed zoom: assignment is a pure
JVM-side projection (same SQL text as the oracle); the histogram is
the load-bearing groupBy(count) the skew splitter consumes (reference
A3, /root/reference/src/dist_point_vector.cpp:551-562). A raster
window query (read all tiles in a lon/lat window) is partition
pruning on the tile id range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core import cells as cellcodec


def assign_tiles(points: DataFrame, zoom: int, lon_col="lon", lat_col="lat") -> DataFrame:
    expr = cellcodec.sql_cell_expr(lon_col, lat_col, zoom)
    return points.withColumn("tile", F.expr(expr))


def tile_histogram(points: DataFrame, zoom: int, lon_col="lon", lat_col="lat") -> DataFrame:
    return (
        assign_tiles(points, zoom, lon_col, lat_col)
        .groupBy("tile")
        .agg(F.count("*").alias("cnt"))
    )


def tile_window(
    points: DataFrame,
    zoom: int,
    lon_range: tuple[float, float],
    lat_range: tuple[float, float],
    lon_col="lon",
    lat_col="lat",
) -> DataFrame:
    """All points whose tile intersects the window — tile-id interval
    predicates (prunable at the scan when the table is partitioned or
    sorted by tile)."""
    import numpy as np

    n = 1 << zoom
    ix0, ix1 = (
        int(cellcodec.cell_xy(cellcodec.cell_id(np.array([lo]), np.array([la]), zoom), zoom)[0][0])
        for lo, la in ((lon_range[0], 0.0), (lon_range[1], 0.0))
    )
    iy0, iy1 = (
        int(cellcodec.cell_xy(cellcodec.cell_id(np.array([0.0]), np.array([la]), zoom), zoom)[1][0])
        for la in (lat_range[0], lat_range[1])
    )
    t = assign_tiles(points, zoom, lon_col, lat_col)
    # floor-divide (NOT cast-of-double: DuckDB casts round, Spark casts
    # truncate — floor agrees everywhere)
    tx = F.floor(F.col("tile") / n).cast("bigint")
    ty = F.col("tile") % n
    return t.filter(
        (tx >= ix0) & (tx <= ix1) & (ty >= iy0) & (ty <= iy1)
    )
