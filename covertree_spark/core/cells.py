"""Hierarchical lon/lat quad-cell codec (H3/S2-style global partitioner).

Replaces the reference's data-adaptive Voronoi rank decomposition
(/root/reference/src/dist_point_vector.cpp:455-563) with a
**deterministic, data-independent** hierarchical grid, per
BASELINE.json north_rule. The codec is an equirectangular quadtree:
at resolution ``res`` the sphere splits into 2^res x 2^res (lon x lat)
cells; ``cell = ix * 2^res + iy``. Chosen over a cube-face S2 clone
because every operation (encode, parent, children, neighbors) is plain
floor/shift arithmetic that a SQL oracle reproduces exactly.

Skew handling: hot cells split to ``res+delta`` (children ids), cold
cells stay — the composite key remains globally unique when suffixed
with the resolution (see split_hot_cells in operators/partition.py).

Correctness never depends on cell *geometry*: ghost replication and
kNN pruning use broadcast per-cell (centroid, circumradius) statistics
(triangle-inequality bounds valid in any metric space), so pole/
antimeridian distortion only affects load balance, not results.
"""

from __future__ import annotations

import numpy as np


def num_cells(res: int) -> int:
    return 1 << (2 * res)


def cell_id(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Encode lon in [-180,180), lat in [-90,90] at resolution ``res``.

    SQL-identical recipe (see sql_cell_expr): floor-divide the unit
    square into 2^res bins per axis, clamp the lat==90 edge into the
    last bin.
    """
    n = 1 << res
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    ix = np.floor(((lon + 180.0) / 360.0) * n).astype(np.int64)
    iy = np.floor(((lat + 90.0) / 180.0) * n).astype(np.int64)
    ix = np.clip(ix, 0, n - 1)
    iy = np.clip(iy, 0, n - 1)
    return ix * n + iy


def sql_cell_expr(lon_expr: str, lat_expr: str, res: int) -> str:
    """ANSI SQL computing the exact same cell id (same op order)."""
    n = 1 << res
    ix = f"least(greatest(CAST(floor((({lon_expr}) + 180.0) / 360.0 * {n}) AS BIGINT), 0), {n - 1})"
    iy = f"least(greatest(CAST(floor((({lat_expr}) + 90.0) / 180.0 * {n}) AS BIGINT), 0), {n - 1})"
    return f"({ix}) * {n} + ({iy})"


def cell_xy(cell: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    n = 1 << res
    cell = np.asarray(cell, dtype=np.int64)
    return cell // n, cell % n


def parent(cell: np.ndarray, res: int, parent_res: int) -> np.ndarray:
    """Ancestor cell at a coarser resolution."""
    assert parent_res <= res
    shift = res - parent_res
    ix, iy = cell_xy(cell, res)
    return (ix >> shift) * (1 << parent_res) + (iy >> shift)


def children(cell: int, res: int, child_res: int) -> np.ndarray:
    """All descendant cells at a finer resolution (for hot-cell splits)."""
    assert child_res >= res
    shift = child_res - res
    k = 1 << shift
    ix, iy = cell_xy(np.asarray([cell]), res)
    cx = (ix[0] << shift) + np.arange(k, dtype=np.int64)
    cy = (iy[0] << shift) + np.arange(k, dtype=np.int64)
    n = 1 << child_res
    return (cx[:, None] * n + cy[None, :]).ravel()


def k_ring(cell: int, res: int, k: int = 1) -> np.ndarray:
    """Cells within Chebyshev distance k on the grid, with longitude
    wraparound (latitude clamped at the poles)."""
    n = 1 << res
    ix, iy = cell_xy(np.asarray([cell]), res)
    dx = np.arange(-k, k + 1, dtype=np.int64)
    dy = np.arange(-k, k + 1, dtype=np.int64)
    gx = (ix[0] + dx) % n  # lon wraps
    gy = iy[0] + dy
    gy = gy[(gy >= 0) & (gy < n)]  # lat clamps
    return np.unique((gx[:, None] * n + gy[None, :]).ravel())


def cell_bounds(cell: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(lon_min, lon_max, lat_min, lat_max) in degrees per cell."""
    n = 1 << res
    ix, iy = cell_xy(cell, res)
    lon0 = ix * (360.0 / n) - 180.0
    lat0 = iy * (180.0 / n) - 90.0
    return lon0, lon0 + 360.0 / n, lat0, lat0 + 180.0 / n
