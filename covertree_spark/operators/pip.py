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


# Data-adaptive dial for the polygon-polygon overlap join (the
# components.py discipline): below these probed bounds the whole join
# runs in ONE bounded task — an x-sorted bbox sweep whose candidate
# pairs are emitted in fixed-size blocks (memory stays bounded no
# matter how many bbox pairs exist; only true hits accumulate per
# block before being yielded), with the SAME exact batch kernel per
# (arity, arity) group making every decision. At the cutoffs the task
# holds <= 1M polygons' vertices (<= 16M verts, ~256 MB of float64)
# plus one <= 4M-pair block transient. Any 100 TB polygon table blows
# past the probe onto the tile-cover join.
_POLY_SMALL_POLYS = 1_000_000
_POLY_SMALL_VERTS = 16_000_000
_POLY_SWEEP_BLOCK = 4_000_000


def _poly_overlap_small(polys: DataFrame) -> DataFrame:
    """Bounded single-task polygon-polygon overlap: sort by bbox x0,
    sweep for x-overlapping pairs (complete: intersecting rings have
    overlapping closed bboxes), filter y-overlap, then decide each
    surviving pair with ``poly_pairs_intersect_batch`` grouped by ring
    arity — the identical float64 kernel the distributed path calls,
    invoked with the lower poly_id on the A side exactly as the a < b
    tile join does, so decisions are bit-identical."""
    from ..core.polygons import poly_pairs_intersect_batch

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        blocks = [pdf for pdf in batches if not pdf.empty]
        if not blocks:
            return
        pids: list[np.ndarray] = []
        vx: list[np.ndarray] = []
        vy: list[np.ndarray] = []
        for pdf in blocks:
            pids.append(pdf["poly_id"].to_numpy(np.int64))
            vx.extend(np.asarray(v, dtype=np.float64) for v in pdf["xs"])
            vy.extend(np.asarray(v, dtype=np.float64) for v in pdf["ys"])
        pid = np.concatenate(pids)
        n = len(pid)
        lens = np.fromiter((len(v) for v in vx), np.int64, n)
        x0 = np.fromiter((v.min() for v in vx), np.float64, n)
        x1 = np.fromiter((v.max() for v in vx), np.float64, n)
        y0 = np.fromiter((v.min() for v in vy), np.float64, n)
        y1 = np.fromiter((v.max() for v in vy), np.float64, n)
        order = np.argsort(x0, kind="stable")
        pid, lens = pid[order], lens[order]
        x0, x1, y0, y1 = x0[order], x1[order], y0[order], y1[order]
        # fixed-arity vertex stacks + each poly's row within its stack
        stacks: dict[int, np.ndarray] = {}
        row_in_stack = np.empty(n, np.int64)
        for m in np.unique(lens):
            rows = np.flatnonzero(lens == m)
            stacks[int(m)] = np.stack(
                [
                    np.stack([vx[order[r]], vy[order[r]]], axis=1)
                    for r in rows
                ]
            )
            row_in_stack[rows] = np.arange(len(rows))
        # sweep: all j > i with x0[j] <= x1[i] (x0-sorted => complete
        # closed-x-overlap, each unordered pair exactly once)
        hi = np.searchsorted(x0, x1, side="right")
        cnt = np.maximum(hi - np.arange(n) - 1, 0)
        csum = np.r_[0, np.cumsum(cnt)]
        total = int(csum[-1])
        lo = 0
        while lo < total:
            hi_p = min(lo + _POLY_SWEEP_BLOCK, total)
            i0 = int(np.searchsorted(csum, lo, side="right") - 1)
            i1 = int(np.searchsorted(csum, hi_p, side="left"))
            ii = np.repeat(np.arange(i0, i1), cnt[i0:i1])
            jj = (
                np.arange(csum[i0], csum[i1])
                - np.repeat(csum[i0:i1], cnt[i0:i1])
                + ii
                + 1
            )
            sl = slice(lo - int(csum[i0]), hi_p - int(csum[i0]))
            ii, jj = ii[sl], jj[sl]
            lo = hi_p
            keep = (y0[ii] <= y1[jj]) & (y0[jj] <= y1[ii])
            ii, jj = ii[keep], jj[keep]
            if not len(ii):
                continue
            # lower poly_id on the A side (the distributed a < b order)
            swap = pid[ii] > pid[jj]
            ai = np.where(swap, jj, ii)
            bi = np.where(swap, ii, jj)
            out_a: list[np.ndarray] = []
            out_b: list[np.ndarray] = []
            key = lens[ai] * (int(lens.max()) + 1) + lens[bi]
            for k in np.unique(key):
                sel = np.flatnonzero(key == k)
                ma = int(lens[ai[sel[0]]])
                mb = int(lens[bi[sel[0]]])
                PA = stacks[ma][row_in_stack[ai[sel]]]
                PB = stacks[mb][row_in_stack[bi[sel]]]
                hit = poly_pairs_intersect_batch(PA, PB)
                if hit.any():
                    out_a.append(pid[ai[sel]][hit])
                    out_b.append(pid[bi[sel]][hit])
            if out_a:
                yield pd.DataFrame(
                    {
                        "a": np.concatenate(out_a),
                        "b": np.concatenate(out_b),
                    }
                )

    return polys.coalesce(1).mapInPandas(run, schema="a bigint, b bigint")


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
    join partitions.

    Data-adaptive dial (r6): ONE cheap probe (polygon count + total
    vertex count — a scalar aggregate over the id/size projection)
    routes small tables to ``_poly_overlap_small``'s bounded
    single-task sweep; the tile-cover join above is the default for
    anything bigger. Identical output (tests/test_poly_overlap.py
    parity on forced paths + the sf0.01 oracle)."""
    from ..core.polygons import poly_pairs_intersect_batch

    probe = polys.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.size("xs")), F.lit(0)).alias("v"),
    ).collect()[0]
    if (
        int(probe["n"]) <= _POLY_SMALL_POLYS
        and int(probe["v"]) <= _POLY_SMALL_VERTS
    ):
        return _poly_overlap_small(polys)

    # r6 (guide §2.3 shuffle-keys-not-payloads): the co-tile pairing
    # decides WHICH polygon pairs are candidates — it only needs ids
    # plus 4 bbox doubles. The vertex arrays are dropped before the
    # tile self-join (they used to ride through BOTH join sides and
    # the dedup aggregate) and re-attached from the polygon table
    # afterwards, id-keyed — exact because xs/ys are a pure function
    # of poly_id (what the old first() aggregate relied on too). The
    # bbox-overlap conjuncts (closed <=, no slack needed: any shared
    # point of two rings lies inside BOTH bboxes, so disjoint bboxes
    # cannot intersect) prune candidates before the distinct and the
    # exact kernel ever see them — a pure superset cut, the JVM
    # rendering of the oracle's own bbox prejoin (measured 48.6k ->
    # 27.6k candidate pairs at sf0.1 against 15.7k true pairs).
    frags = poly_tile_frags(polys, cover_zoom)
    fid = frags.select(
        "tile",
        "poly_id",
        F.array_min("xs").alias("x0"),
        F.array_max("xs").alias("x1"),
        F.array_min("ys").alias("y0"),
        F.array_max("ys").alias("y1"),
    )
    cand_ids = (
        fid.alias("x")
        .join(
            fid.alias("y"),
            (F.col("x.tile") == F.col("y.tile"))
            & (F.col("x.poly_id") < F.col("y.poly_id"))
            & (F.col("x.x0") <= F.col("y.x1"))
            & (F.col("y.x0") <= F.col("x.x1"))
            & (F.col("x.y0") <= F.col("y.y1"))
            & (F.col("y.y0") <= F.col("x.y1")),
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
