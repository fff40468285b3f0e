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


def _hash32(vals: np.ndarray, mult: int) -> np.ndarray:
    """(vals * mult) mod 2^32, overflow-safe for any id in [0, 2^63).

    Reduce mod 2^32 first, then multiply in uint64: the product of two
    32-bit values is < 2^64, exact in uint64 — no silent wrap at any
    scale (the naive int64 form overflows at id >= 2^63 / mult
    ~ 3.47e9, silently breaking the 10^12-row path)."""
    v = (np.asarray(vals, dtype=np.int64) % _MOD).astype(np.uint64)
    return ((v * np.uint64(mult)) % np.uint64(_MOD)).astype(np.int64)


def lonlat_from_id(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic pseudo-uniform (lon, lat) from integer ids.

    Exact-arithmetic recipe (identical in SQL, see sql_lonlat_exprs):
      h1 = ((id % 2^32) * 2654435761) % 2^32 ; lon = h1*360.0/2^32 - 180
      h2 = (((id+1) % 2^32) * 2246822519) % 2^32 ; lat = h2*180.0/2^32 - 90
    h < 2^32 is exact in float64, so numpy, Spark SQL and DuckDB all
    produce bit-identical doubles, for ids up to 2^63
    (tests/test_cells_geometry.py checks ids {2^31, 2^35, 2^40, 10^12}
    across all three engines)."""
    ids = np.asarray(ids, dtype=np.int64)
    h1 = _hash32(ids, _LON_MULT)
    h2 = _hash32(ids + 1, _LAT_MULT)
    lon = (h1 * 360.0) / float(_MOD) - 180.0
    lat = (h2 * 180.0) / float(_MOD) - 90.0
    return lon, lat


def _sql_hash32(expr: str, mult: int) -> str:
    """ANSI-SQL rendering of _hash32 with every intermediate < 2^49,
    so BIGINT arithmetic never overflows in any engine.

    Split i32 = hi*2^16 + lo; then (i32*mult) mod 2^32 =
    (((hi*(mult mod 2^16)) mod 2^16) * 2^16 + lo*mult) mod 2^32.
    hi is recovered by an exact power-of-two double division (the
    dividend is a multiple of 2^16 and <= 2^32, integral in float64;
    floor+CAST is engine-agnostic — DuckDB CAST rounds, Spark
    truncates, both identity on an exact integer)."""
    ml = mult % 65536
    i32 = f"(({expr}) % {_MOD})"
    lo = f"({i32} % 65536)"
    # division rendered in explicit DOUBLE: Spark parses a bare 65536.0
    # literal as DECIMAL (DuckDB as DOUBLE), and decimal division
    # rounds to a fixed scale — CAST pins both engines to IEEE double,
    # where a power-of-two division of an integer <= 2^32 is exact
    hi = f"CAST(floor(({i32} - {lo}) / CAST(65536 AS DOUBLE)) AS BIGINT)"
    return f"(((({hi} * {ml}) % 65536) * 65536 + {lo} * {mult}) % {_MOD})"


def sql_lonlat_exprs(id_col: str) -> tuple[str, str]:
    """ANSI-SQL expressions computing the exact same lon/lat doubles.
    All float constants are CAST(... AS DOUBLE): Spark would otherwise
    evaluate the chain in DECIMAL (bare float literals are decimals
    there), silently diverging from DuckDB/numpy doubles."""
    h1 = _sql_hash32(id_col, _LON_MULT)
    h2 = _sql_hash32(f"({id_col} + 1)", _LAT_MULT)
    lon = (f"({h1} * CAST(360 AS DOUBLE)) / CAST({_MOD} AS DOUBLE)"
           f" - CAST(180 AS DOUBLE)")
    lat = (f"({h2} * CAST(180 AS DOUBLE)) / CAST({_MOD} AS DOUBLE)"
           f" - CAST(90 AS DOUBLE)")
    return lon, lat


def lonlat_units_from_id(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """16-bit INTEGER lattice coordinates (ux, uy) of a ping — the
    top 16 bits of the same lon/lat hashes (ux = h1 >> 16, in
    [0, 65536); one unit = 360/65536 deg of lon ~ 611 m at the
    equator). Pure integers, so per-group sums of units and squared
    units are ORDER-FREE and engine-exact — the summable form of a
    location that float lon/lat can never give (sums of doubles
    depend on reduction order). Moment magnitudes: ux^2 < 2^32, so
    int64 per-user sums are safe to ~2^31 events per user."""
    ids = np.asarray(ids, dtype=np.int64)
    return (
        _hash32(ids, _LON_MULT) >> 16,
        _hash32(ids + 1, _LAT_MULT) >> 16,
    )


def sql_lonlat_units(id_col: str) -> tuple[str, str]:
    """ANSI-SQL rendering of lonlat_units_from_id: the shift is the
    exact power-of-two double division _sql_hash32 already relies on
    (the dividend is < 2^32, integral in float64; floor+CAST is
    engine-agnostic)."""
    h1 = _sql_hash32(id_col, _LON_MULT)
    h2 = _sql_hash32(f"({id_col} + 1)", _LAT_MULT)
    ux = f"CAST(floor(({h1}) / CAST(65536 AS DOUBLE)) AS BIGINT)"
    uy = f"CAST(floor(({h2}) / CAST(65536 AS DOUBLE)) AS BIGINT)"
    return ux, uy


def lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Unit-sphere embedding, shape (n, 3), float64."""
    lon_r = np.radians(np.asarray(lon, dtype=np.float64))
    lat_r = np.radians(np.asarray(lat, dtype=np.float64))
    cl = np.cos(lat_r)
    return np.stack([cl * np.cos(lon_r), cl * np.sin(lon_r), np.sin(lat_r)], axis=1)


def sql_xyz_exprs(lon_expr: str, lat_expr: str) -> tuple[str, str, str]:
    """SQL for the unit-sphere embedding, ROUNDED THROUGH FLOAT32 —
    the engine's point payload type (reference Atom = float32,
    include/utils.h:17-18). float64 trig, one f32 rounding, widened
    back to DOUBLE: Spark, DuckDB and numpy all use IEEE round-to-
    nearest for the f64->f32 cast, so every engine holds bit-identical
    f32-representable coordinates and all float64 distance math over
    them agrees bit-for-bit."""
    x = f"CAST(CAST(cos(radians({lat_expr})) * cos(radians({lon_expr})) AS FLOAT) AS DOUBLE)"
    y = f"CAST(CAST(cos(radians({lat_expr})) * sin(radians({lon_expr})) AS FLOAT) AS DOUBLE)"
    z = f"CAST(CAST(sin(radians({lat_expr})) AS FLOAT) AS DOUBLE)"
    return x, y, z


def gc_to_chord(theta_rad: float) -> float:
    """Great-circle angle (radians) -> chord length on the unit sphere."""
    return 2.0 * float(np.sin(theta_rad / 2.0))


def chord_to_gc(chord: float) -> float:
    return 2.0 * float(np.arcsin(min(1.0, chord / 2.0)))


# IUGG mean Earth radius. The engine's metric stays the unit-sphere
# chord (the cover tree is purely Euclidean); kilometre radii convert
# through gc_to_chord(km / EARTH_RADIUS_KM) at plan time, and reported
# great-circle distances are recomputed with the haversine formula
# below — mirrored op-for-op by sql_haversine_km so DuckDB produces
# bit-identical doubles (both sides run the host libm's sin/cos/asin
# over bit-identical float64 lon/lats).
EARTH_RADIUS_KM = 6371.0088


def haversine_km(
    lon1: np.ndarray, lat1: np.ndarray, lon2: np.ndarray, lat2: np.ndarray
) -> np.ndarray:
    """Great-circle distance in km, float64 haversine. OP ORDER IS THE
    ORACLE CONTRACT — any change here must change sql_haversine_km
    identically."""
    p1 = np.radians(np.asarray(lat1, dtype=np.float64))
    p2 = np.radians(np.asarray(lat2, dtype=np.float64))
    s1 = np.sin((p2 - p1) * 0.5)
    s2 = np.sin(
        (
            np.radians(np.asarray(lon2, dtype=np.float64))
            - np.radians(np.asarray(lon1, dtype=np.float64))
        )
        * 0.5
    )
    a = s1 * s1 + (np.cos(p1) * np.cos(p2)) * (s2 * s2)
    km = EARTH_RADIUS_KM * (2.0 * np.arcsin(np.sqrt(np.minimum(a, 1.0))))
    # Quantize to METRES with a floor-based half-up: numpy's SIMD
    # arcsin and DuckDB's libm asin disagree by 1 ulp on ~1% of
    # inputs (measured), so the raw double is NOT an oracle-safe
    # output; after metre quantization a mismatch needs the two
    # values to straddle a 0.0005 km boundary within ~5e-11 km —
    # probability ~1e-7 per row, and the fixtures are deterministic.
    return np.floor(km * 1000.0 + 0.5) / 1000.0


def sql_haversine_km(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """ANSI-SQL rendering of haversine_km, same op order. ``least(a,1)``
    guards the same lanes numpy clamps (rounding can push a one ulp
    over 1 near the antipode); float constants are CAST(... AS DOUBLE)
    so no engine evaluates in DECIMAL."""
    half = "CAST(0.5 AS DOUBLE)"
    p1, p2 = f"radians({lat1})", f"radians({lat2})"
    s1 = f"sin(({p2} - {p1}) * {half})"
    s2 = f"sin((radians({lon2}) - radians({lon1})) * {half})"
    a = f"({s1} * {s1} + (cos({p1}) * cos({p2})) * ({s2} * {s2}))"
    km = (
        f"CAST({EARTH_RADIUS_KM!r} AS DOUBLE) * (CAST(2 AS DOUBLE) * "
        f"asin(sqrt(least({a}, CAST(1 AS DOUBLE)))))"
    )
    # same floor-based metre quantization as haversine_km (half-up via
    # floor, NOT the engines' ROUND — DuckDB rounds half-away, numpy
    # half-even; floor arithmetic is identical everywhere)
    return (
        f"(floor({km} * CAST(1000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) "
        "/ CAST(1000 AS DOUBLE))"
    )


def haversine_m_int(
    lon1: np.ndarray, lat1: np.ndarray, lon2: np.ndarray, lat2: np.ndarray
) -> np.ndarray:
    """Great-circle distance as INTEGER metres (int64) — the summable
    form: integer addition is order-free, so per-group totals cross
    engines exactly where a float-km sum cannot. Derived from the
    metre-quantized double haversine_km output (= K/1000 for integer
    K): K/1000*1000 re-rounds within ~1e-8 of K, so the half-up floor
    recovers K itself — both engines compute it from the identical
    quantized double."""
    km_q = haversine_km(lon1, lat1, lon2, lat2)
    return np.floor(km_q * 1000.0 + 0.5).astype(np.int64)


def sql_haversine_m_int(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """ANSI-SQL rendering of haversine_m_int (same derivation from the
    same quantized double)."""
    km_q = sql_haversine_km(lon1, lat1, lon2, lat2)
    return (
        f"CAST(floor({km_q} * CAST(1000 AS DOUBLE) + "
        "CAST(0.5 AS DOUBLE)) AS BIGINT)"
    )
