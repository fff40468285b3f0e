"""Incremental index maintenance (operators/upsert): LSM-style delta
generations over the bucketed warehouse index, the chain read path, and
compaction. The exactness contract: a chain query answers IDENTICALLY
to a single index built over the merged corpus — pinned by tuple-exact
parity against knn_over_index, which is itself parity-pinned against
knn_self_join and the brute-force oracle.

The reference builds its index once over a static file
(rgraph.cpp:68-72); evolving corpora are new surface, tested here.
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from covertree_spark.operators import partition as pt
from covertree_spark.operators.index import build_trees, stats_from_trees
from covertree_spark.operators.knn import knn_over_index, knn_over_index_chain
from covertree_spark.operators.upsert import (
    build_delta_trees,
    compact_index,
    dirty_cells,
    read_index_chain,
    upsert_index,
)
from covertree_spark.plans.checkpoint import Warehouse, snapshot_id
from covertree_spark.sources import tables as src
from tests.conftest import SF_TINY

K = 8
D = 3
NPARTS = 8


@pytest.fixture(scope="module")
def corpus(spark):
    """Full geo corpus split into a base (6/7 of points) and one ingest
    batch (1/7) — the batch lands in a SUBSET of cells (dirty), leaving
    the rest clean, so the delta path and the ownership split are both
    exercised."""
    df = src.doc_points_lonlat(spark, SF_TINY)
    df = pt.assign_cells(df, res=3)
    xyz = src.doc_points_xyz(spark, SF_TINY)
    pts = xyz.join(df.select("id", "cell"), "id").select("id", "vec", "cell")
    base = pts.filter(F.col("id") % 7 != 0).persist()
    batch = pts.filter(F.col("id") % 7 == 0).persist()
    merged = pts.persist()
    base.count(), batch.count(), merged.count()
    return base, batch, merged


def knn_tuples(df):
    return sorted(
        (r["src"], r["rank"], r["dst"])
        for r in df.select("src", "rank", "dst").collect()
    )


@pytest.fixture(scope="module")
def warehouse_chain(spark, corpus, tmp_path_factory):
    """Commit base layout + base trees, then upsert the batch."""
    base, batch, _ = corpus
    wh = Warehouse(str(tmp_path_factory.mktemp("wh")), run_id="upsert-t")
    psnap = snapshot_id("geo_points", [], {"fixture": "base"})
    base_c = wh.checkpoint(
        base.repartition(NPARTS, F.col("cell")).sortWithinPartitions("cell"),
        "geo_points",
        psnap,
        bucket=("cell", NPARTS),
    )
    tsnap = snapshot_id("geo_trees", [psnap], {"d": D})
    wh.checkpoint(
        build_trees(base_c, d=D).repartition(NPARTS, F.col("cell")),
        "geo_trees",
        tsnap,
        bucket=("cell", NPARTS),
    )
    dpsnap, dtsnap = upsert_index(
        spark, wh, "geo", psnap, tsnap, batch,
        batch_id="b1", d=D, nparts=NPARTS,
    )
    return wh, psnap, tsnap, dpsnap, dtsnap


def test_delta_trees_cover_exactly_dirty_cells(spark, corpus, warehouse_chain):
    """The delta generation holds one tree per DIRTY cell and nothing
    else, and each delta tree spans the cell's FULL point set (existing
    base points + the batch) — the rebuild-only-what-changed contract:
    write cost is O(points in dirty cells), never O(table)."""
    base, batch, _ = corpus
    wh, psnap, tsnap, dpsnap, dtsnap = warehouse_chain
    dirty = set(int(c) for c in dirty_cells(batch))
    delta = wh.read(spark, "geo_trees_delta", dtsnap)
    got_cells = {int(r["cell"]) for r in delta.select("cell").collect()}
    assert got_cells == dirty
    # per-cell counts = base + batch points of that cell
    want = {
        int(r["cell"]): int(r["n"])
        for r in base.unionByName(batch)
        .groupBy("cell").agg(F.count("*").alias("n"))
        .collect()
        if int(r["cell"]) in dirty
    }
    got = {int(r["cell"]): int(r["n"]) for r in delta.select("cell", "n").collect()}
    assert got == want


def test_upsert_is_idempotent(spark, corpus, warehouse_chain):
    """Re-submitting a committed (base, batch_id) returns the same
    snapshot ids WITHOUT rebuilding — crash-safe resume: the manifest
    files are untouched by the second call."""
    _, batch, _ = corpus
    wh, psnap, tsnap, dpsnap, dtsnap = warehouse_chain
    man = wh._manifest_path("geo_trees_delta", dtsnap)
    mtime = os.path.getmtime(man)
    again = upsert_index(
        spark, wh, "geo", psnap, tsnap, batch,
        batch_id="b1", d=D, nparts=NPARTS,
    )
    assert again == (dpsnap, dtsnap)
    assert os.path.getmtime(man) == mtime
    # a different batch id chains to a DIFFERENT snapshot (content
    # addressing — no silent mixing of distinct ingests)
    assert snapshot_id("geo_points_delta", [psnap], {"batch": "b2"}) != dpsnap


def test_chain_knn_matches_single_index_over_merged(spark, corpus, warehouse_chain):
    """The headline exactness claim: kNN over [base gen, delta gen]
    equals kNN over ONE index built on the merged corpus — tuple-exact,
    every query point of the merged table."""
    _, _, merged = corpus
    wh, psnap, tsnap, dpsnap, dtsnap = warehouse_chain
    gens = read_index_chain(spark, wh, "geo", tsnap, [dtsnap], NPARTS)
    # read_index_chain keys tables as f"{table}_trees"; our fixture
    # committed under geo_trees/geo_trees_delta so table="geo"
    got = knn_over_index_chain(
        gens, merged.select("id", "vec", "cell"), k=K, d=D,
    )
    single = build_trees(
        merged.repartition(NPARTS, F.col("cell")).sortWithinPartitions("cell"),
        d=D,
    ).persist()
    single.count()
    exp = knn_over_index(
        single, merged.select("id", "vec", "cell"), k=K, d=D,
        stats=stats_from_trees(single),
    )
    assert knn_tuples(got) == knn_tuples(exp)
    for g in gens:
        g.unpersist()
    single.unpersist()


def test_chain_ownership_newest_wins(spark, corpus, warehouse_chain):
    """A second batch dirtying a cell ALREADY dirty in delta-1 must
    resolve to the newest generation; chain query over three
    generations still matches the single merged index."""
    base, batch, merged = corpus
    wh, psnap, tsnap, dpsnap, dtsnap = warehouse_chain
    # second batch: re-ingest a slice of the FIRST batch's cells plus
    # some base-only cells — overlap with both older generations
    batch2 = merged.filter(F.col("id") % 11 == 3).persist()
    if batch2.count() == 0:
        pytest.skip("fixture slice empty at this sf")
    dp2, dt2 = upsert_index(
        spark, wh, "geo", psnap, tsnap, batch2,
        batch_id="b2", d=D, nparts=NPARTS,
        prior_delta_pts_snaps=(dpsnap,),
    )
    assert dt2 != dtsnap
    gens = read_index_chain(spark, wh, "geo", tsnap, [dtsnap, dt2], NPARTS)
    # batch2 re-ingests EXISTING ids with identical rows: last-writer-
    # wins resolution leaves the logical corpus unchanged, so the
    # single-index-over-merged oracle still applies — while the rebuild
    # itself must pull batch-1 points of shared cells from the delta-1
    # snapshot (the chain read upsert_index now does), or those points
    # would silently vanish from delta-2-owned cells.
    got = knn_over_index_chain(gens, merged.select("id", "vec", "cell"), k=K, d=D)
    single = build_trees(
        merged.repartition(NPARTS, F.col("cell")).sortWithinPartitions("cell"),
        d=D,
    ).persist()
    single.count()
    exp = knn_over_index(
        single, merged.select("id", "vec", "cell"), k=K, d=D,
        stats=stats_from_trees(single),
    )
    assert knn_tuples(got) == knn_tuples(exp)
    for g in gens:
        g.unpersist()
    single.unpersist()
    batch2.unpersist()


def test_compaction_folds_chain_to_one_generation(spark, corpus, warehouse_chain):
    """compact_index folds [base, delta] into ONE bucketed snapshot
    whose query answers equal the chain's; the fold keeps exactly one
    tree per cell (newest owner)."""
    _, _, merged = corpus
    wh, psnap, tsnap, dpsnap, dtsnap = warehouse_chain
    gens = read_index_chain(spark, wh, "geo", tsnap, [dtsnap], NPARTS)
    csnap = compact_index(
        spark, wh, "geo", gens, [tsnap, dtsnap], NPARTS
    )
    compact = wh.read(spark, "geo_trees", csnap)
    # one row per cell, and the union of chain cells
    cells = [int(r["cell"]) for r in compact.select("cell").collect()]
    assert len(cells) == len(set(cells))
    chain_cells = set()
    for g in gens:
        chain_cells |= {int(r["cell"]) for r in g.select("cell").collect()}
    assert set(cells) == chain_cells
    got = knn_over_index(
        compact, merged.select("id", "vec", "cell"), k=K, d=D,
        stats=stats_from_trees(compact),
    )
    chain = knn_over_index_chain(gens, merged.select("id", "vec", "cell"), k=K, d=D)
    assert knn_tuples(got) == knn_tuples(chain)
    for g in gens:
        g.unpersist()
