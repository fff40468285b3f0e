"""Cell codec, geometry, and polygon primitives (no Spark). The codec
must agree bit-for-bit with its own SQL rendering (checked via DuckDB
here, same engine the driver's oracle uses)."""

import duckdb
import numpy as np
import pytest

from covertree_spark.core import cells, geometry, polygons


def test_lonlat_from_id_ranges_and_determinism():
    ids = np.arange(10000)
    lon, lat = geometry.lonlat_from_id(ids)
    assert np.all(lon >= -180) and np.all(lon < 180)
    assert np.all(lat >= -90) and np.all(lat < 90)
    lon2, lat2 = geometry.lonlat_from_id(ids)
    assert np.array_equal(lon, lon2)
    # spread: not all in one cell at res 3
    assert len(np.unique(cells.cell_id(lon, lat, 3))) > 30


def test_lonlat_sql_bit_identical():
    ids = np.arange(5000)
    lon, lat = geometry.lonlat_from_id(ids)
    le, la = geometry.sql_lonlat_exprs("i")
    got = duckdb.sql(
        f"SELECT {le} AS lon, {la} AS lat FROM range(5000) t(i) ORDER BY i"
    ).fetchnumpy()
    assert np.array_equal(got["lon"], lon)
    assert np.array_equal(got["lat"], lat)


def test_lonlat_big_ids_no_overflow():
    """The 10^12-doc path: the id->lon/lat recipe must stay exact far
    beyond the naive int64 overflow point (id ~ 3.47e9). Checks numpy
    against exact Python-int arithmetic AND against the SQL fragment
    in DuckDB at ids {2^31, 2^35, 2^40, 10^12}."""
    ids = np.sort(
        np.array([0, 1, 499, 2**31, 2**31 + 7, 2**35, 10**12, 2**40], dtype=np.int64)
    )
    lon, lat = geometry.lonlat_from_id(ids)
    # ground truth with arbitrary-precision Python ints
    exp_lon = np.array(
        [((int(i) * 2654435761) % 2**32) * 360.0 / 2**32 - 180.0 for i in ids]
    )
    exp_lat = np.array(
        [(((int(i) + 1) * 2246822519) % 2**32) * 180.0 / 2**32 - 90.0 for i in ids]
    )
    assert np.array_equal(lon, exp_lon)
    assert np.array_equal(lat, exp_lat)
    le, la = geometry.sql_lonlat_exprs("id")
    vals = ",".join(f"({int(i)}::BIGINT)" for i in ids)
    got = duckdb.sql(
        f"SELECT {le} AS lon, {la} AS lat FROM (VALUES {vals}) t(id) ORDER BY id"
    ).fetchnumpy()
    assert np.array_equal(got["lon"], lon)
    assert np.array_equal(got["lat"], lat)


def test_lonlat_units_sql_bit_identical():
    """The 16-bit location lattice (radius-of-gyration moments): the
    numpy shift must equal the SQL power-of-two-division rendering at
    small AND far-past-int32 ids, and moments must stay inside the
    documented int64 bound (ux^2 < 2^32)."""
    ids = np.sort(
        np.array(
            [0, 1, 499, 2**31, 2**35, 10**12, 2**40, 2**62],
            dtype=np.int64,
        )
    )
    ux, uy = geometry.lonlat_units_from_id(ids)
    assert np.all((ux >= 0) & (ux < 65536))
    assert np.all((uy >= 0) & (uy < 65536))
    # ground truth with arbitrary-precision Python ints: top 16 bits
    # of the same lon/lat hashes
    exp_ux = np.array(
        [((int(i) * 2654435761) % 2**32) >> 16 for i in ids], dtype=np.int64
    )
    exp_uy = np.array(
        [(((int(i) + 1) * 2246822519) % 2**32) >> 16 for i in ids],
        dtype=np.int64,
    )
    assert np.array_equal(ux, exp_ux)
    assert np.array_equal(uy, exp_uy)
    sx, sy = geometry.sql_lonlat_units("id")
    vals = ",".join(f"({int(i)}::BIGINT)" for i in ids)
    got = duckdb.sql(
        f"SELECT {sx} AS ux, {sy} AS uy FROM (VALUES {vals}) t(id) ORDER BY id"
    ).fetchnumpy()
    assert np.array_equal(got["ux"], ux)
    assert np.array_equal(got["uy"], uy)


@pytest.mark.parametrize("res", [1, 3, 6])
def test_cell_id_sql_bit_identical(res):
    ids = np.arange(5000)
    lon, lat = geometry.lonlat_from_id(ids)
    expected = cells.cell_id(lon, lat, res)
    le, la = geometry.sql_lonlat_exprs("i")
    expr = cells.sql_cell_expr(le, la, res)
    got = duckdb.sql(
        f"SELECT {expr} AS c FROM range(5000) t(i) ORDER BY i"
    ).fetchnumpy()["c"]
    assert np.array_equal(got, expected)


def test_cell_parent_children_roundtrip():
    res, child_res = 4, 6
    ids = np.arange(2000)
    lon, lat = geometry.lonlat_from_id(ids)
    coarse = cells.cell_id(lon, lat, res)
    fine = cells.cell_id(lon, lat, child_res)
    assert np.array_equal(cells.parent(fine, child_res, res), coarse)
    for c in np.unique(coarse)[:10]:
        ch = cells.children(int(c), res, child_res)
        assert len(ch) == 16
        assert np.all(cells.parent(ch, child_res, res) == c)


def test_k_ring_wraps_longitude():
    res = 3
    n = 1 << res
    # cell at lon edge: ix = 0
    ring = cells.k_ring(0 * n + 3, res, 1)
    xs = ring // n
    assert (n - 1) in xs and 0 in xs and 1 in xs


def test_cell_bounds_contain_points():
    ids = np.arange(3000)
    lon, lat = geometry.lonlat_from_id(ids)
    res = 5
    c = cells.cell_id(lon, lat, res)
    lon0, lon1, lat0, lat1 = cells.cell_bounds(c, res)
    assert np.all((lon >= lon0) & (lon <= lon1))
    assert np.all((lat >= lat0) & (lat <= lat1))


def test_chord_gc_roundtrip():
    for theta in [0.01, 0.3, 1.0, np.pi / 2]:
        assert abs(geometry.chord_to_gc(geometry.gc_to_chord(theta)) - theta) < 1e-12


def test_xyz_unit_norm():
    ids = np.arange(1000)
    lon, lat = geometry.lonlat_from_id(ids)
    xyz = geometry.lonlat_to_xyz(lon, lat)
    assert np.allclose(np.linalg.norm(xyz, axis=1), 1.0, atol=1e-12)


def test_convex_pip_matches_ray_crossing():
    polys = polygons.convex_fixture_polygons(8)
    rng = np.random.default_rng(0)
    px = rng.uniform(-180, 180, 4000)
    py = rng.uniform(-90, 90, 4000)
    for poly in polys:
        a = polygons.point_in_polygon(px, py, poly)
        b = polygons.point_in_convex(px, py, poly)
        # interiors agree; allow boundary-measure-zero diffs (none expected)
        assert np.array_equal(a, b)


def test_convex_pip_sql_bit_identical():
    polys = polygons.convex_fixture_polygons(4)
    ids = np.arange(3000)
    lon, lat = geometry.lonlat_from_id(ids)
    le, la = geometry.sql_lonlat_exprs("i")
    for poly in polys:
        expected = polygons.point_in_convex(lon, lat, poly)
        pred = polygons.sql_convex_predicate(le, la, poly)
        got = duckdb.sql(
            f"SELECT {pred} AS hit FROM range(3000) t(i) ORDER BY i"
        ).fetchnumpy()["hit"]
        assert np.array_equal(got, expected)


def test_pip_concave():
    # concave "L" shape
    poly = np.array([[0, 0], [4, 0], [4, 1], [1, 1], [1, 4], [0, 4]], dtype=float)
    px = np.array([0.5, 2.0, 2.0, 0.5, 3.5])
    py = np.array([0.5, 0.5, 2.0, 3.0, 0.5])
    got = polygons.point_in_polygon(px, py, poly)
    assert got.tolist() == [True, True, False, True, True]


def test_vecfile_readers_roundtrip(spark, tmp_path):
    """fvecs/fbin/u8bin distributed readers (SURVEY S3): bytes written
    in the reference's formats come back exactly, distributed over
    many partitions, with ids = file row order."""
    import numpy as np

    from covertree_spark.sources import vecfiles as vf

    rng = np.random.default_rng(5)
    Xf = rng.normal(size=(101, 7)).astype(np.float32)
    Xu = rng.integers(0, 256, size=(53, 5)).astype(np.uint8)

    p_fvecs = str(tmp_path / "a.fvecs")
    p_fbin = str(tmp_path / "a.fbin")
    p_u8 = str(tmp_path / "a.u8bin")
    vf.write_fvecs(p_fvecs, Xf)
    vf.write_fbin(p_fbin, Xf)
    vf.write_u8bin(p_u8, Xu)

    assert vf.info_file(p_fvecs) == (101, 7, "float32")
    assert vf.info_file(p_fbin) == (101, 7, "float32")
    assert vf.info_file(p_u8) == (53, 5, "uint8")

    for path, X in ((p_fvecs, Xf), (p_fbin, Xf), (p_u8, Xu.astype(np.float32))):
        pdf = vf.read_vectors(spark, path, partitions=6).orderBy("id").toPandas()
        got = np.stack(pdf["vec"].to_numpy())
        assert pdf["id"].tolist() == list(range(len(X)))
        assert np.array_equal(got, X)

    # slicer semantics: rows [start, start+count), reference contract
    sl = vf.read_vectors(spark, p_fvecs, start=40, count=25, partitions=4)
    pdf = sl.orderBy("id").toPandas()
    assert pdf["id"].tolist() == list(range(40, 65))
    assert np.array_equal(np.stack(pdf["vec"].to_numpy()), Xf[40:65])


def test_slice_points_pushdown(spark, tmp_path):
    """slice_points (SURVEY S6) filters an id range and the predicate
    reaches the parquet scan (PushedFilters)."""
    from pyspark.sql import functions as F

    from covertree_spark.sources.vecfiles import slice_points

    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 2).alias("x")
    )
    path = str(tmp_path / "pts.parquet")
    df.write.parquet(path)
    pts = spark.read.parquet(path)
    out = slice_points(pts, 100, 50)
    rows = out.select("id").orderBy("id").collect()
    assert [r["id"] for r in rows] == list(range(100, 150))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(id,100)" in plan


def test_polygon_tile_cover_matches_numpy(spark):
    """Vector->raster: the declarative tile cover equals a numpy
    rasterization (same center-sampling rule), convex AND concave."""
    import numpy as np

    from covertree_spark.core.polygons import (
        concave_fixture_polygons,
        convex_fixture_polygons,
        point_in_convex,
        point_in_polygon,
    )
    from covertree_spark.operators.tiles import polygon_tile_cover

    z = 5
    n = 1 << z
    for polys, convex, test in (
        (convex_fixture_polygons(3), True, point_in_convex),
        (concave_fixture_polygons(3), False, point_in_polygon),
    ):
        got = sorted(
            (r["poly_id"], r["tile"])
            for r in polygon_tile_cover(spark, polys, z, convex=convex).collect()
        )
        exp = []
        for pid, poly in enumerate(polys):
            x0, x1 = poly[:, 0].min(), poly[:, 0].max()
            y0, y1 = poly[:, 1].min(), poly[:, 1].max()
            cl = lambda v: int(min(max(v, 0), n - 1))
            ix = np.arange(cl(np.floor((x0 + 180) / 360 * n)),
                           cl(np.floor((x1 + 180) / 360 * n)) + 1)
            iy = np.arange(cl(np.floor((y0 + 90) / 180 * n)),
                           cl(np.floor((y1 + 90) / 180 * n)) + 1)
            gx, gy = np.meshgrid(ix, iy, indexing="ij")
            clon = (gx.ravel() + 0.5) * (360.0 / n) - 180.0
            clat = (gy.ravel() + 0.5) * (180.0 / n) - 90.0
            hit = test(clon, clat, poly)
            for t in (gx.ravel()[hit] * n + gy.ravel()[hit]):
                exp.append((pid, int(t)))
        assert got == sorted(exp)
        assert len(got) > 0


def test_tile_bounds_inverse_of_assign(spark):
    """Raster->vector: tile_bounds equals the codec's cell_bounds and
    re-encoding any bounds center recovers the tile."""
    import numpy as np

    from covertree_spark.core import cells as cc
    from covertree_spark.operators.tiles import tile_bounds

    z = 4
    tiles_df = spark.range(0, cc.num_cells(z)).selectExpr("id AS tile")
    pdf = tile_bounds(tiles_df, z).orderBy("tile").toPandas()
    lon0, lon1, lat0, lat1 = cc.cell_bounds(pdf["tile"].to_numpy(), z)
    assert np.allclose(pdf["lon_min"], lon0) and np.allclose(pdf["lon_max"], lon1)
    assert np.allclose(pdf["lat_min"], lat0) and np.allclose(pdf["lat_max"], lat1)
    mid = cc.cell_id(
        (pdf["lon_min"] + pdf["lon_max"]).to_numpy() / 2,
        (pdf["lat_min"] + pdf["lat_max"]).to_numpy() / 2,
        z,
    )
    assert np.array_equal(mid, pdf["tile"].to_numpy())


def test_tile_pyramid_rollup_identity(spark):
    """Every pyramid level equals the direct per-level histogram (the
    rollup never re-reads points, but must be indistinguishable from a
    recompute), and per-level totals are conserved."""
    from covertree_spark.operators.tiles import tile_histogram, tile_pyramid
    from covertree_spark.sources.pages import generate_pages, pages_to_points

    pts = pages_to_points(generate_pages(spark, 800, partitions=4)).persist()
    z = 5
    pyr = {
        (r["zoom"], r["tile"]): r["cnt"]
        for r in tile_pyramid(pts, z, min_zoom=0).collect()
    }
    for zz in range(z + 1):
        direct = {
            (zz, r["tile"]): r["cnt"]
            for r in tile_histogram(pts, zz).collect()
        }
        got = {k: v for k, v in pyr.items() if k[0] == zz}
        assert got == direct, f"zoom {zz} rollup != direct"
        assert sum(got.values()) == 800
    pts.unpersist()


def test_pip_table_parity_with_broadcast_path(spark):
    """The polygon-TABLE join (cogroup on covering tiles) returns
    exactly the broadcast pip_join's pairs on both fixture families —
    same numpy kernels, different physical plan (round-4 VERDICT #4)."""
    from covertree_spark.operators import pip
    from covertree_spark.sources import tables as src
    from tests.conftest import SF_TINY

    pts = src.doc_points_lonlat(spark, SF_TINY)
    all_polys = (
        polygons.convex_fixture_polygons(6)
        + polygons.concave_fixture_polygons(4)
    )
    want = {
        (r["id"], r["poly_id"])
        for r in pip.pip_join(pts, all_polys, convex=False).collect()
    }
    pdf = pip.polygons_table(spark, all_polys)
    for cover_zoom in (2, 4, 6):  # zoom must not change the answer
        got = {
            (r["id"], r["poly_id"])
            for r in pip.pip_join_table(
                pts, pdf, convex=False, cover_zoom=cover_zoom
            ).collect()
        }
        assert got == want, f"cover_zoom={cover_zoom}"
    assert want  # non-degenerate fixture


def test_tile_cover_table_parity_with_declarative(spark):
    """polygon_tile_cover_table (one mapInPandas over polygon rows)
    equals the per-polygon declarative plan tile-for-tile — the center
    arithmetic and predicates are float64 op-order identical."""
    from covertree_spark.operators import pip, tiles

    all_polys = (
        polygons.convex_fixture_polygons(6)
        + polygons.concave_fixture_polygons(4)
    )
    want = {
        (r["poly_id"], r["tile"])
        for r in tiles.polygon_tile_cover(
            spark, all_polys, 6, convex=False
        ).collect()
    }
    pdf = pip.polygons_table(spark, all_polys)
    got = {
        (r["poly_id"], r["tile"])
        for r in tiles.polygon_tile_cover_table(pdf, 6, convex=False).collect()
    }
    assert got == want and want


def test_polygon_table_scale_10k(spark):
    """10^4 random polygons: the table path completes with a BOUNDED
    plan (three fixed operators — no per-polygon plan branches) and
    agrees with the broadcast path on a sampled subset. This is the
    'polygon table at scale' shape the round-4 VERDICT asked for."""
    from covertree_spark.operators import pip, tiles
    from covertree_spark.sources import tables as src
    from tests.conftest import SF_TINY

    rng = np.random.default_rng(11)
    polys = []
    for _ in range(10_000):
        cx, cy = rng.uniform(-170, 170), rng.uniform(-80, 80)
        nv = int(rng.integers(4, 8))
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rad = rng.uniform(0.5, 3.0, nv)
        polys.append(
            np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], 1)
        )
    pdf = pip.polygons_table(spark, polys).repartition(32)

    cover = tiles.polygon_tile_cover_table(pdf, 8, convex=False)
    plan = cover._jdf.queryExecution().executedPlan().toString()
    # plan is O(1) in polygon count: a single python-eval op over the
    # polygon scan, no unionByName fan-out
    assert plan.count("MapInPandas") == 1 and "Union" not in plan
    assert cover.count() > 10_000  # every polygon covers >= ~1 tile

    pts = src.doc_points_lonlat(spark, SF_TINY)
    joined = pip.pip_join_table(pts, pdf, convex=False, cover_zoom=5)
    jplan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in jplan
    got = {(r["id"], r["poly_id"]) for r in joined.collect()}
    # parity on a deterministic 64-polygon subset via the broadcast path
    sub_ids = list(range(0, 10_000, 157))
    sub = [polys[i] for i in sub_ids]
    want = {
        (r["id"], sub_ids[r["poly_id"]])
        for r in pip.pip_join(pts, sub, convex=False).collect()
    }
    assert want == {p for p in got if p[1] in set(sub_ids)}
