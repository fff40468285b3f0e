"""Spherical geometry helpers (pure numpy, float64).

Points on the sphere are embedded as 3-D unit vectors; the engine's
metric is the **chord distance** (straight-line L2 in R^3), which is a
strictly monotone function of great-circle distance — so epsilon-ball
and kNN results under chord distance equal those under great-circle
distance (with the radius converted via ``gc_to_chord``). This keeps
the cover tree purely Euclidean, exactly like the reference's metric
space (/root/reference/src/point_vector.cpp:5-19), while the geometry
stays honest spherical.

Deterministic lon/lat derivation from integer ids uses pure integer /
power-of-two arithmetic so a SQL oracle (DuckDB) reproduces the exact
same float64 values bit-for-bit (see sql_lonlat_exprs()).
"""

from __future__ import annotations

import numpy as np

# Knuth multiplicative hash constants (public domain folklore).
_LON_MULT = 2654435761
_LAT_MULT = 2246822519
_MOD = 4294967296  # 2^32


def lonlat_from_id(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic pseudo-uniform (lon, lat) from integer ids.

    Exact-arithmetic recipe (identical in SQL):
      h1 = (id * 2654435761) % 2^32 ; lon = h1*360.0/2^32 - 180.0
      h2 = ((id+1) * 2246822519) % 2^32 ; lat = h2*180.0/2^32 - 90.0
    Every step is exact in float64 (products < 2^53), so numpy and any
    SQL engine produce bit-identical doubles.
    """
    ids = np.asarray(ids, dtype=np.int64)
    h1 = (ids * _LON_MULT) % _MOD
    h2 = ((ids + 1) * _LAT_MULT) % _MOD
    lon = (h1 * 360.0) / float(_MOD) - 180.0
    lat = (h2 * 180.0) / float(_MOD) - 90.0
    return lon, lat


def sql_lonlat_exprs(id_col: str) -> tuple[str, str]:
    """ANSI-SQL expressions computing the exact same lon/lat doubles."""
    lon = f"((({id_col} * {_LON_MULT}) % {_MOD}) * 360.0) / {_MOD}.0 - 180.0"
    lat = f"(((({id_col} + 1) * {_LAT_MULT}) % {_MOD}) * 180.0) / {_MOD}.0 - 90.0"
    return lon, lat


def lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Unit-sphere embedding, shape (n, 3), float64."""
    lon_r = np.radians(np.asarray(lon, dtype=np.float64))
    lat_r = np.radians(np.asarray(lat, dtype=np.float64))
    cl = np.cos(lat_r)
    return np.stack([cl * np.cos(lon_r), cl * np.sin(lon_r), np.sin(lat_r)], axis=1)


def sql_xyz_exprs(lon_expr: str, lat_expr: str) -> tuple[str, str, str]:
    """SQL for the same unit-sphere embedding (cos/sin of radians)."""
    x = f"cos(radians({lat_expr})) * cos(radians({lon_expr}))"
    y = f"cos(radians({lat_expr})) * sin(radians({lon_expr}))"
    z = f"sin(radians({lat_expr}))"
    return x, y, z


def gc_to_chord(theta_rad: float) -> float:
    """Great-circle angle (radians) -> chord length on the unit sphere."""
    return 2.0 * float(np.sin(theta_rad / 2.0))


def chord_to_gc(chord: float) -> float:
    return 2.0 * float(np.arcsin(min(1.0, chord / 2.0)))
