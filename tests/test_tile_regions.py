"""tile_regions semantics on a hand-built occupancy grid: 4-connectivity
(no diagonals), grid-edge guards (no lon/lat wrap merges), min-id
labels, partition invariance."""

import duckdb
import numpy as np
import pytest

from covertree_spark.core import geometry as G
from covertree_spark.operators.tiles import tile_regions

ZOOM = 2  # n = 4; tile = ix * 4 + iy
# L-shape {(0,0),(0,1),(1,1)} plus (1,0)=4 (east of (0,0)) -> ONE
# region labeled 0; diagonal pair (2,2)/(3,3) must NOT merge; (0,3)=3
# and (1,0)=4 have consecutive ids but sit on opposite grid rows ->
# the iy guard must keep 3 out of region 0; (3,0)=12 probes the east
# edge guard (no +n neighbor can exist).
OCC = [0, 1, 5, 10, 15, 3, 4, 12]
EXPECTED = {0: 0, 1: 0, 5: 0, 4: 0, 10: 10, 15: 15, 3: 3, 12: 12}


@pytest.mark.parametrize("nparts", [1, 7])
@pytest.mark.parametrize("cutoff", [1 << 18, 0])  # one-task kernel / distributed star
def test_tile_regions_semantics(spark, nparts, cutoff):
    occ = spark.createDataFrame([(t,) for t in OCC], "tile bigint").repartition(
        nparts
    )
    got = {
        r["tile"]: r["region"]
        for r in tile_regions(occ, ZOOM, small_cutoff=cutoff).collect()
    }
    assert got == EXPECTED


def test_haversine_cross_engine_parity():
    """numpy haversine_km vs the DuckDB rendering of sql_haversine_km
    over random pairs: equal after the shared metre quantization (the
    raw doubles differ by ~1 ulp on some inputs — the quantization is
    load-bearing, this pins it)."""
    rng = np.random.default_rng(7)
    lon1, lon2 = rng.uniform(-180, 180, 200), rng.uniform(-180, 180, 200)
    lat1, lat2 = rng.uniform(-90, 90, 200), rng.uniform(-90, 90, 200)
    want = G.haversine_km(lon1, lat1, lon2, lat2)
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE p AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({a!r}, {b!r}, {c!r}, {d!r})"
            for a, b, c, d in zip(lon1, lat1, lon2, lat2)
        )
        + ") t(lon1, lat1, lon2, lat2)"
    )
    got = np.array(
        [
            r[0]
            for r in con.sql(
                "SELECT "
                + G.sql_haversine_km("lon1", "lat1", "lon2", "lat2")
                + " FROM p"
            ).fetchall()
        ]
    )
    assert np.array_equal(want, got)


def test_haversine_chord_threshold_clearance():
    """Boundary discipline for GEO_HAV_R_KM at the driver-gated sf:
    no true chord distance sits within 1e-9 of the converted radius,
    so GEMM-vs-difference-form summation order cannot flip the
    predicate between engines."""
    import pyarrow.parquet as pq

    from covertree_spark.queries import GEO_HAV_R_KM

    ids = pq.read_table(
        "/root/testdata/sf0.01/documents.parquet", columns=["doc_id"]
    )["doc_id"].to_numpy()
    lon, lat = G.lonlat_from_id(ids)
    X = G.lonlat_to_xyz(lon, lat).astype(np.float32).astype(np.float64)
    chord = G.gc_to_chord(GEO_HAV_R_KM / G.EARTH_RADIUS_KM)
    d2 = (
        (X * X).sum(1)[:, None] + (X * X).sum(1)[None, :] - 2.0 * (X @ X.T)
    )
    np.fill_diagonal(d2, np.inf)
    gap = np.abs(np.sqrt(np.maximum(d2, 0.0)) - chord).min()
    assert gap > 1e-9, f"chord distance within {gap} of radius {chord}"


def test_haversine_basics():
    # zero distance to self; symmetric; equator degree ~111.19 km
    z = G.haversine_km(np.array([10.0]), np.array([20.0]),
                       np.array([10.0]), np.array([20.0]))
    assert z[0] == 0.0
    a = G.haversine_km(np.array([0.0]), np.array([0.0]),
                       np.array([1.0]), np.array([0.0]))
    b = G.haversine_km(np.array([1.0]), np.array([0.0]),
                       np.array([0.0]), np.array([0.0]))
    assert a[0] == b[0]
    assert abs(a[0] - 111.195) < 0.01
    # chord round-trip consistency: gc -> chord -> gc
    theta = 1234.5 / G.EARTH_RADIUS_KM
    assert abs(G.chord_to_gc(G.gc_to_chord(theta)) - theta) < 1e-12


def _pt(ix, iy, n=4):
    """(lon, lat) at the center of grid cell (ix, iy) on an n x n grid."""
    return (-180.0 + (ix + 0.5) * 360.0 / n, -90.0 + (iy + 0.5) * 180.0 / n)


def test_tile_focal_sum_wrap_and_clamp(spark):
    """Hand grid at zoom 2 (n=4): (0,0) and (3,0) are lon-wrap
    neighbors (x=0 vs x=3 adjacent mod 4); the y=-1 row clamps away at
    the south pole. Integer-exact expectations computed by hand."""
    from covertree_spark.operators.tiles import tile_focal_sum

    cells = {(0, 0): 1, (3, 0): 2, (0, 1): 4, (1, 1): 8}
    rows = []
    i = 0
    for (ix, iy), cnt in cells.items():
        lon, lat = _pt(ix, iy)
        for _ in range(cnt):
            rows.append((i, lon, lat))
            i += 1
    pts = spark.createDataFrame(rows, "id bigint, lon double, lat double")
    got = {
        r["tile"]: (r["cnt"], r["focal"])
        for r in tile_focal_sum(pts, 2).collect()
    }
    # tile = ix*4 + iy
    assert got == {0: (1, 15), 12: (2, 7), 1: (4, 15), 5: (8, 13)}


def test_tile_mode_resample_tie_breaks(spark):
    """Per-tile tie -> smaller category; parent majority over child
    MODES (not raw points: tile 0 holds 2 'b' points but contributes
    one 'b' vote, so 'a' wins the parent 2-1)."""
    from covertree_spark.operators.tiles import tile_mode, tile_mode_resample

    spec = [((0, 0), "b"), ((0, 0), "b"), ((0, 1), "a"),
            ((1, 0), "c"), ((1, 0), "a")]
    rows = []
    for i, ((ix, iy), lang) in enumerate(spec):
        lon, lat = _pt(ix, iy)
        rows.append((i, lon, lat, lang))
    pts = spark.createDataFrame(rows, "id bigint, lon double, lat double, lang string")
    modes = {r["tile"]: r["mode_cat"] for r in tile_mode(pts, 2, "lang").collect()}
    assert modes == {0: "b", 1: "a", 4: "a"}  # (1,0) ties c/a -> a
    got = {
        r["tile"]: (r["mode_cat"], r["n_children"])
        for r in tile_mode_resample(pts, 2, 1, "lang").collect()
    }
    assert got == {0: ("a", 3)}
