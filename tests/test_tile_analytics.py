"""tile_lisa and tile_proximity semantics on hand-built grids: the
quadrant decision rules (strict-mean cross-multiplication, isolated
tiles, ties), the Chebyshev min-distance values, and the torus
wrap / pole clamp at grid edges."""

import pytest
from pyspark.sql import functions as F

from covertree_spark.operators.tiles import tile_lisa, tile_proximity

ZOOM = 2  # n = 4; tile = ix * 4 + iy


def _pts_df(spark, tiles_counts, nparts=3, zoom=ZOOM):
    """Points placed at tile centers: (lon, lat) reconstructed from the
    tile index so assign_tiles maps them straight back."""
    n = 1 << zoom
    rows = []
    pid = 0
    for t, c in tiles_counts.items():
        ix, iy = divmod(t, n)
        lon = (ix + 0.5) * 360.0 / n - 180.0
        lat = (iy + 0.5) * 180.0 / n - 90.0
        for _ in range(c):
            rows.append((pid, lon, lat))
            pid += 1
    return spark.createDataFrame(
        rows, "id bigint, lon double, lat double"
    ).repartition(nparts)


def test_tile_lisa_quadrants(spark):
    # occupancy (4x4 grid): a hot core at (1,1)=5 with hot ring members
    # (0,0)=0 and (2,2)=10, a cold cell (1,2)=6 inside the hot ring
    # (doughnut hole -> LH), an isolated-ish far corner pair.
    # counts: total=24 over 6 occupied tiles -> mean=4.
    counts = {5: 10, 0: 6, 10: 4, 6: 1, 15: 2, 3: 1}
    got = {
        r["tile"]: (r["cnt"], r["nbr_cnt"], r["nbr_n"], r["quad"])
        for r in tile_lisa(_pts_df(spark, counts), ZOOM).collect()
    }
    assert set(got) == set(counts)
    # tile 5 (cnt 10 > 4): ring = {0, 6, 10} -> nbr 11/3 < 4 -> HL=4
    assert got[5] == (10, 11, 3, 4)
    # tile 6 (cnt 1 < 4): ring = {5, 10, 3} -> 15/3 > 4 -> LH=2
    assert got[6] == (1, 15, 3, 2)
    # tile 0 (cnt 6 > 4): ring = {5, 3(0,3? no...)}: neighbors of
    # (0,0) with wrap: ix in {3,0,1}, iy in {0,1} (clamp) -> occupied:
    # 5=(1,1), 3=(0,3)? (0,3) is iy=3 not adjacent. 12..15 have ix=3:
    # (3,0)=12 not occupied, (3,1)=13 no. 15=(3,3) no. So ring={5}.
    assert got[0] == (6, 10, 1, 1)  # 10/1 > 4 and 6 > 4 -> HH
    # tile 15 (cnt 2 < 4): (3,3) ring wraps to ix {2,3,0}, iy {2,3}:
    # occupied: 10=(2,2), 3=(0,3), 2=(0,2)? not occupied. -> {10, 3}
    # nbr 5/2 < 4 -> LL=3
    assert got[15] == (2, 5, 2, 3)
    # tile 3 (cnt 1 < 4): (0,3) ring ix {3,0,1}, iy {2,3}: occupied
    # 15=(3,3), 6=(1,2), 7=(1,3)? no, 2=(0,2)? no, 14=(3,2)? no
    # -> {15, 6}: nbr 3/2 < 4 -> LL=3
    assert got[3] == (1, 3, 2, 3)
    # tile 10 (cnt 4 == mean -> NOT high, strict): ring {5, 6, 15}
    # nbr 13/3 > 4 -> LH=2 (the tie rule: equality is low)
    assert got[10] == (4, 13, 3, 2)


def test_tile_lisa_isolated_tile(spark):
    # two tiles far apart on an 8x8 grid (zoom 3): both isolated ->
    # nbr_n 0 -> never "ring high" -> quad in {2,3} arm, decided by own
    counts = {0: 5, 36: 1}  # mean = 3
    got = {
        r["tile"]: (r["nbr_n"], r["quad"])
        for r in tile_lisa(_pts_df(spark, counts, zoom=3), 3).collect()
    }
    assert got[0] == (0, 4)  # own hi, ring not hi -> HL
    assert got[36] == (0, 3)  # own lo, ring not hi -> LL


def test_tile_proximity_values_and_wrap(spark):
    # single occupied tile at (0, 1) = tile 1 on the 4x4 grid, D=2:
    # wrap makes ix distance min(|dx|, 4-|dx|); lat clamps.
    got = {
        r["tile"]: r["dist"]
        for r in tile_proximity(_pts_df(spark, {1: 1}), ZOOM, max_d=2).collect()
    }
    n = 1 << ZOOM
    want = {}
    for ix in range(n):
        dx = min(abs(ix - 0), n - abs(ix - 0))
        for iy in range(n):
            d = max(dx, abs(iy - 1))
            if d <= 2:
                want[ix * n + iy] = d
    assert got == want
    assert got[1] == 0 and got[3 * n + 1] == 1  # wrap: ix=3 adjacent to ix=0


def test_tile_proximity_min_over_sources(spark):
    # two sources; every target takes the MIN distance
    got = {
        r["tile"]: r["dist"]
        for r in tile_proximity(
            _pts_df(spark, {5: 3, 6: 1}), ZOOM, max_d=1
        ).collect()
    }
    assert got[5] == 0 and got[6] == 0
    assert got[4] == 1 and got[7] == 1  # adjacent to exactly one source each


def test_tile_proximity_partition_invariance(spark):
    counts = {0: 2, 5: 1, 15: 4}
    a = tile_proximity(_pts_df(spark, counts, nparts=1), ZOOM, max_d=3)
    b = tile_proximity(_pts_df(spark, counts, nparts=11), ZOOM, max_d=3)
    ra = sorted((r["tile"], r["dist"]) for r in a.collect())
    rb = sorted((r["tile"], r["dist"]) for r in b.collect())
    assert ra == rb and len(ra) > 0


def test_tile_lisa_quads_complete(spark):
    """Every occupied tile gets exactly one quad in 1..4, and the
    output is keyed by occupied tiles only."""
    counts = {i: (i % 5) + 1 for i in range(0, 16, 2)}
    df = tile_lisa(_pts_df(spark, counts), ZOOM)
    rows = df.collect()
    assert {r["tile"] for r in rows} == set(counts)
    assert all(1 <= r["quad"] <= 4 for r in rows)
    assert df.schema["quad"].dataType.simpleString() == "bigint"
