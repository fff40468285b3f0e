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
from pyspark.sql import functions as F

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


def polygons_table(spark, polys: list[np.ndarray]) -> DataFrame:
    """Polygon list -> DataFrame (poly_id, xs, ys) — the TABLE form
    the scale path consumes (a 10^4+-polygon corpus is data, not a
    broadcast dimension)."""
    rows = [
        (pid, [float(x) for x in p[:, 0]], [float(y) for y in p[:, 1]])
        for pid, p in enumerate(polys)
    ]
    return spark.createDataFrame(
        rows, "poly_id bigint, xs array<double>, ys array<double>"
    )


def poly_tile_frags(polys: DataFrame, cover_zoom: int) -> DataFrame:
    """Polygon TABLE (poly_id, xs, ys) -> one fragment row per tile of
    the polygon's bbox cover at ``cover_zoom``: (tile, poly_id, xs,
    ys). The vertex arrays ride along — O(verts x tiles_per_poly)
    bytes, the polygon analog of the ghost shuffle's O(surface).
    Shared by the PIP table path and the polygon-polygon overlap join;
    a tile-keyed equi-join on this output is complete for any
    intersection predicate because any shared point lies in a tile
    both bbox covers contain (tile clamping is monotone, so the
    guarantee survives out-of-range bboxes)."""
    from .tiles import _bbox_tile_range

    n = 1 << cover_zoom

    def cover(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            t_out, p_out, xs_out, ys_out = [], [], [], []
            for r in pdf.itertuples(index=False):
                poly = np.stack(
                    [np.asarray(r.xs, dtype=np.float64),
                     np.asarray(r.ys, dtype=np.float64)], axis=1,
                )
                ix0, ix1, iy0, iy1 = _bbox_tile_range(poly, cover_zoom)
                ix, iy = np.meshgrid(
                    np.arange(ix0, ix1 + 1, dtype=np.int64),
                    np.arange(iy0, iy1 + 1, dtype=np.int64),
                    indexing="ij",
                )
                t = (ix * n + iy).ravel()
                t_out.append(t)
                p_out.append(np.full(len(t), r.poly_id, dtype=np.int64))
                xs_out.extend([list(r.xs)] * len(t))
                ys_out.extend([list(r.ys)] * len(t))
            if t_out:
                yield pd.DataFrame(
                    {
                        "tile": np.concatenate(t_out),
                        "poly_id": np.concatenate(p_out),
                        "xs": xs_out,
                        "ys": ys_out,
                    }
                )

    return polys.mapInPandas(
        cover,
        schema="tile bigint, poly_id bigint, xs array<double>, ys array<double>",
    )


def poly_overlap_join(polys: DataFrame, cover_zoom: int = 6) -> DataFrame:
    """Polygon-polygon spatial SELF-join over a polygon TABLE
    (poly_id, xs, ys): pairs (a, b), a < b, whose rings intersect
    under ``core.polygons.poly_pair_intersects`` (vertex even-odd
    containment either way, or a proper edge crossing). The
    vector-vector join the reference lacks entirely (SURVEY §2.9 —
    the reference is points-only; this completes the vector layer:
    point-point, point-polygon, polygon-raster, polygon-polygon).

    Plan (three fixed operators, independent of polygon count — the
    same shape as every other spatial join here):
      1. each polygon explodes to its bbox's covering tiles at
         ``cover_zoom`` (poly_tile_frags) — candidates are complete
         because intersecting polygons share a covering tile;
      2. tile-keyed equi-join pairs co-tiled fragments (a < b), then
         one aggregate dedupes pairs spanning several shared tiles
         (first() is exact: the arrays are a pure function of pid);
      3. exact vectorized predicate per candidate pair in mapInPandas
         (numpy over all edge pairs — no per-row Python in the sense
         that each pair's test is one vectorized kernel call).

    At 10^4+ polygons/tile the quadratic co-tile pairing is the
    familiar skew story: raise ``cover_zoom`` (smaller tiles) exactly
    like the cell decomposition elsewhere; AQE splits the hot tile's
    join partitions."""
    from ..core.polygons import poly_pairs_intersect_batch

    # r6 (guide §2.3 shuffle-keys-not-payloads): the co-tile pairing
    # decides WHICH polygon pairs are candidates — it only needs ids.
    # The vertex arrays are dropped before the tile self-join (they
    # used to ride through BOTH join sides and the dedup aggregate)
    # and re-attached from the polygon table afterwards, id-keyed —
    # exact because xs/ys are a pure function of poly_id (what the
    # old first() aggregate relied on too).
    frags = poly_tile_frags(polys, cover_zoom)
    fid = frags.select("tile", "poly_id")
    cand_ids = (
        fid.alias("x")
        .join(
            fid.alias("y"),
            (F.col("x.tile") == F.col("y.tile"))
            & (F.col("x.poly_id") < F.col("y.poly_id")),
        )
        .select(F.col("x.poly_id").alias("a"), F.col("y.poly_id").alias("b"))
        .distinct()
    )
    cand = cand_ids.join(
        polys.select(
            F.col("poly_id").alias("a"),
            F.col("xs").alias("xsa"),
            F.col("ys").alias("ysa"),
        ),
        "a",
    ).join(
        polys.select(
            F.col("poly_id").alias("b"),
            F.col("xs").alias("xsb"),
            F.col("ys").alias("ysb"),
        ),
        "b",
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per Arrow batch: group candidate pairs by ring arity and run
        # ONE vectorized kernel call per (ma, mb) group — bit-identical
        # decisions to the scalar poly_pair_intersects (the batch
        # kernel reorders no float ops), ~25us/pair Python dispatch
        # amortized away
        for pdf in batches:
            if pdf.empty:
                continue
            la = pdf["xsa"].str.len().to_numpy()
            lb = pdf["xsb"].str.len().to_numpy()
            out_a, out_b = [], []
            for (ma, mb), idx in pd.DataFrame(
                {"ma": la, "mb": lb}
            ).groupby(["ma", "mb"]).indices.items():
                sub = pdf.iloc[idx]
                PA = np.stack(
                    [np.stack(sub["xsa"].to_numpy()),
                     np.stack(sub["ysa"].to_numpy())], axis=2,
                ).astype(np.float64, copy=False)
                PB = np.stack(
                    [np.stack(sub["xsb"].to_numpy()),
                     np.stack(sub["ysb"].to_numpy())], axis=2,
                ).astype(np.float64, copy=False)
                hit = poly_pairs_intersect_batch(PA, PB)
                if hit.any():
                    out_a.append(sub["a"].to_numpy()[hit])
                    out_b.append(sub["b"].to_numpy()[hit])
            if out_a:
                yield pd.DataFrame(
                    {
                        "a": np.concatenate(out_a).astype(np.int64),
                        "b": np.concatenate(out_b).astype(np.int64),
                    }
                )

    return cand.mapInPandas(run, schema="a bigint, b bigint")


def pip_join_table(
    points: DataFrame,
    polys: DataFrame,
    convex: bool = False,
    cover_zoom: int = 4,
    lon_col: str = "lon",
    lat_col: str = "lat",
    id_col: str = "id",
) -> DataFrame:
    """Point-in-polygon join against a polygon TABLE — the scale path
    (round-4 VERDICT #4: the broadcast ``pip_join`` loops driver-side
    over a Python list; fine for a fixture dimension, wrong shape for
    a 10^4+-polygon table).

    Plan (three fixed operators, size INDEPENDENT of polygon count):
      1. polygon side: each row explodes to its bbox's covering tiles
         at ``cover_zoom`` (mapInPandas; the vertex arrays ride along
         — O(verts x tiles_per_poly) bytes, the analog of the ghost
         shuffle's O(surface));
      2. point side: tile id as a pure JVM projection (assign_tiles —
         the same codec the raster operators use);
      3. cogroup on tile: per tile, every local polygon fragment runs
         the bbox prune + exact vectorized test (same numpy kernels as
         pip_join, so results are identical by construction) against
         the tile's point block.

    At deployment scale the point side is the tile-aligned persisted
    layout (zero home shuffle, like every other cogroup operator);
    ``cover_zoom`` trades polygon-side fan-out against per-tile block
    size exactly like the cell decomposition elsewhere."""
    from .tiles import assign_tiles

    test = point_in_convex if convex else point_in_polygon
    frags = poly_tile_frags(polys, cover_zoom)
    pts = assign_tiles(points, cover_zoom, lon_col, lat_col).select(
        "tile", F.col(id_col).alias("id"),
        F.col(lon_col).alias("lon"), F.col(lat_col).alias("lat"),
    )

    def per_tile(pt_pdf: pd.DataFrame, fr_pdf: pd.DataFrame) -> pd.DataFrame:
        if pt_pdf.empty or fr_pdf.empty:
            return pd.DataFrame({"id": [], "poly_id": []}).astype(
                {"id": "int64", "poly_id": "int64"}
            )
        px = pt_pdf["lon"].to_numpy(dtype=np.float64)
        py = pt_pdf["lat"].to_numpy(dtype=np.float64)
        ids = pt_pdf["id"].to_numpy()
        out_ids, out_pid = [], []
        for r in fr_pdf.itertuples(index=False):
            poly = np.stack(
                [np.asarray(r.xs, dtype=np.float64),
                 np.asarray(r.ys, dtype=np.float64)], axis=1,
            )
            x0, x1 = poly[:, 0].min(), poly[:, 0].max()
            y0, y1 = poly[:, 1].min(), poly[:, 1].max()
            m = (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
            if not m.any():
                continue
            hit = test(px[m], py[m], poly)
            sel = ids[m][hit]
            out_ids.append(sel)
            out_pid.append(np.full(len(sel), r.poly_id, dtype=np.int64))
        if not out_ids:
            return pd.DataFrame({"id": [], "poly_id": []}).astype(
                {"id": "int64", "poly_id": "int64"}
            )
        return pd.DataFrame(
            {"id": np.concatenate(out_ids), "poly_id": np.concatenate(out_pid)}
        )

    return (
        pts.groupby("tile")
        .cogroup(frags.groupby("tile"))
        .applyInPandas(per_tile, schema="id bigint, poly_id bigint")
    )
