"""Pages source (input_hint schema), byte-identity invariant,
checkpoint/resume with lineage metrics."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from covertree_spark.plans.checkpoint import Warehouse, checkpointed_ball_join, snapshot_id
from covertree_spark.sources.pages import featurize_text, generate_pages, pages_to_points


def test_pages_schema_and_determinism(spark):
    p1 = generate_pages(spark, 500, partitions=4).orderBy("id").collect()
    p2 = generate_pages(spark, 500, partitions=13).orderBy("id").collect()
    assert [r["text"] for r in p1] == [r["text"] for r in p2]  # parallelism-invariant
    r = p1[7]
    assert r["url"].startswith("https://site7.example/")
    assert r["html"] == b"<html>" + r["text"].encode() + b"</html>"
    assert r["lang"] in {"en", "de", "fr", "es", "zh"}
    ntok = len(r["text"].split())
    assert 20 <= ntok <= 200


def test_text_byte_identity_through_stages(spark):
    """input_hint hard invariant: text byte-identical per url through
    every engine stage."""
    pages = generate_pages(spark, 300, partitions=3)
    orig = {r["url"]: r["text"] for r in pages.collect()}
    pts = pages_to_points(pages)
    staged = pts.join(pages.select("id", "url"), "id")
    got = {r["url"]: r["text"] for r in staged.collect()}
    assert got == orig
    assert all(got[u].encode() == orig[u].encode() for u in orig)


def test_extract_text_byte_identity(spark):
    """html:binary -> text extraction reproduces the text column
    byte-for-byte on the pages format (JVM decode + tag-strip; the
    catalog's extract_text entry gates the same invariant vs DuckDB)."""
    from covertree_spark.functions.text import extract_text_col

    pages = generate_pages(spark, 300, partitions=3)
    got = pages.select(
        "url", "text", extract_text_col(F.col("html")).alias("extracted")
    ).collect()
    assert len(got) == 300
    for r in got:
        assert r["extracted"].encode() == r["text"].encode(), r["url"]


def test_repetition_components_hand_fixture(spark):
    """top_bigram_count's sorted-array fold vs hand-counted documents
    (the oracle gate re-derives it a third way, O(distinct x m))."""
    from covertree_spark.functions.text import repetition_components

    rows = [
        # "a b a b a" -> bigrams [a b, b a, a b, b a]: top=2, distinct=2
        (1, "a b a b a"),
        (2, "x"),          # 1 token: no bigrams, top=0
        (3, "q q q q"),    # bigrams [q q]x3: top=3, distinct=1
        (4, "u v w"),      # all unique: top=1
        (5, ""),           # split('') -> [''] : 1 token, no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_components(df).collect()}
    assert got[1] == dict(doc_id=1, n_tokens=5, n_distinct_tokens=2,
                          n_bigrams=4, n_distinct_bigrams=2, top_bigram_count=2)
    assert got[2] == dict(doc_id=2, n_tokens=1, n_distinct_tokens=1,
                          n_bigrams=0, n_distinct_bigrams=0, top_bigram_count=0)
    assert got[3] == dict(doc_id=3, n_tokens=4, n_distinct_tokens=1,
                          n_bigrams=3, n_distinct_bigrams=1, top_bigram_count=3)
    assert got[4]["top_bigram_count"] == 1
    assert got[5]["n_bigrams"] == 0 and got[5]["top_bigram_count"] == 0


def test_featurize_unit_norm_float32(spark):
    pages = generate_pages(spark, 100, partitions=2)
    vecs = featurize_text(pages, d=16).collect()
    assert len(vecs) == 100
    for r in vecs[:10]:
        v = np.asarray(r["vec"], dtype=np.float32)
        assert v.shape == (16,)
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5


def test_checkpoint_resume(spark, tmp_path):
    from covertree_spark.operators.partition import assign_cells
    from covertree_spark.sources.pages import pages_to_points
    from covertree_spark.sources.tables import vec_matrix

    wh = Warehouse(str(tmp_path / "wh"), run_id="t1")
    pages = generate_pages(spark, 200, partitions=4)
    pts = pages_to_points(pages)
    pts = assign_cells(pts, res=2)
    from covertree_spark.sources.tables import _xyz_udf

    pts3 = pts.select("id", _xyz_udf("lon", "lat").alias("vec"), "cell")

    e1 = checkpointed_ball_join(spark, pts3, 0.3, d=3, wh=wh)
    rows1 = sorted((r["src"], r["dst"]) for r in e1.collect())

    # resume: recompute must be skipped (same snapshot ids -> read back)
    e2 = checkpointed_ball_join(spark, pts3, 0.3, d=3, wh=wh)
    rows2 = sorted((r["src"], r["dst"]) for r in e2.collect())
    assert rows1 == rows2

    # metrics rows exist per table with per-partition row counts
    m = wh.metrics(spark).toPandas()
    assert set(m["table"]) >= {"points", "edges"}
    assert (m["row_count"] >= 0).all()
    total_points = int(m[m["table"] == "points"]["row_count"].sum())
    assert total_points == 200

    # only ONE snapshot manifest per table (second run reused it)
    snaps = os.listdir(tmp_path / "wh" / "edges" / "_snapshots")
    assert len(snaps) == 1

    # changing a parameter creates a NEW snapshot (no false cache hit)
    e3 = checkpointed_ball_join(spark, pts3, 0.5, d=3, wh=wh)
    assert len(os.listdir(tmp_path / "wh" / "edges" / "_snapshots")) == 2
    assert len(sorted((r["src"], r["dst"]) for r in e3.collect())) > len(rows1)


def test_geo_index_warehouse_resume(spark, tmp_path, monkeypatch):
    """The catalog's persisted-index path (q_knn_over_index) commits a
    warehouse snapshot and RESUMES it: a second build request reads the
    committed snapshot back — the manifest is not re-committed and the
    lineage metrics exist (north_rule resume on the driver-visible
    surface)."""
    from covertree_spark import queries as Q
    from tests.conftest import SF_TINY

    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "wh"))
    trees, stats, wh, snap = Q._geo_index(spark, SF_TINY)
    n1 = trees.count()
    assert wh.is_committed("geo_trees", snap)
    man1 = wh.manifest("geo_trees", snap)
    # drop the session cache: the next call must resume, not rebuild
    Q._PREP_CACHE.pop(Q._prep_key(spark, SF_TINY, "geo_index"))
    trees2, *_ = Q._geo_index(spark, SF_TINY)
    assert trees2.count() == n1
    assert wh.manifest("geo_trees", snap)["committed_at"] == man1["committed_at"]
    m = wh.metrics(spark).toPandas()
    assert (m[m["table"] == "geo_trees"]["row_count"].sum()) == n1


def test_snapshot_id_content_addressing():
    a = snapshot_id("edges", ["abc"], {"r": 0.3})
    b = snapshot_id("edges", ["abc"], {"r": 0.3})
    c = snapshot_id("edges", ["abc"], {"r": 0.5})
    d = snapshot_id("edges", ["xyz"], {"r": 0.3})
    assert a == b and a != c and a != d


def test_prepared_layout_warehouse_resume(spark, tmp_path, monkeypatch):
    """The prepared point layouts are warehouse snapshots (round-3
    VERDICT missing #3): a second session (simulated by dropping the
    prep cache) RESUMES the committed layout AND its stats sidecar —
    no re-commit, stats identical — instead of re-running assignment,
    the ingest shuffle and two stats scans."""
    import numpy as np

    from covertree_spark import queries as Q
    from tests.conftest import SF_TINY

    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "wh"))
    key = Q._prep_key(spark, SF_TINY, "geo")
    saved = {k: Q._PREP_CACHE.pop(k) for k in list(Q._PREP_CACHE) if k == key}
    try:
        pts1, st1 = Q._geo_points(spark, SF_TINY)
        snap = Q._PREP_SNAP[key]
        wh = Q._warehouse(spark)
        assert wh.is_committed("geo_points", snap)
        assert wh.is_committed("geo_points_stats", snap)
        man1 = wh.manifest("geo_points", snap)
        n1 = pts1.count()

        # simulate a fresh session: drop the in-memory cache, rebuild
        Q._PREP_CACHE.pop(key)
        pts2, st2 = Q._geo_points(spark, SF_TINY)
        assert pts2.count() == n1
        # resumed, not re-committed
        assert wh.manifest("geo_points", snap)["committed_at"] == man1["committed_at"]
        # stats sidecar round-trips exactly
        assert np.array_equal(st1.cell_ids, st2.cell_ids)
        assert np.array_equal(st1.counts, st2.counts)
        assert np.array_equal(st1.centroids, st2.centroids)
        assert np.array_equal(st1.circumradii, st2.circumradii)
        # lineage metrics exist for the layout commit
        m = wh.metrics(spark).toPandas()
        assert m[m["table"] == "geo_points"]["row_count"].sum() == n1

        # BUCKETED AT REST (round-4 VERDICT #3): the snapshot carries
        # its bucket spec, and the resumed layout is fed by the
        # bucket-aware scan IN PLACE — physical plan shows the bucketed
        # file scan and NO Exchange anywhere: resume = read + local
        # sort + cache fill, never a data-sized shuffle
        nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        assert wh.bucket_spec("geo_points", snap) == {"col": "cell", "n": nparts}
        plan = pts2._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan
        assert "Exchange" not in plan, plan

        # and a cogroup against the resumed layout elides the home
        # side entirely — both children here derive from the cached
        # bucketed layout, so the plan has NO Exchange at all
        import pandas as pd

        cand = pts2.select("cell", F.col("id").alias("qid"))

        def cg(c, h):
            return pd.DataFrame({"n": [len(h)]})

        out = (
            cand.groupby("cell")
            .cogroup(pts2.groupby("cell"))
            .applyInPandas(cg, "n long")
        )
        cplan = out._jdf.queryExecution().executedPlan().toString()
        assert cplan.count("Exchange") == 0, cplan
    finally:
        Q._PREP_CACHE.pop(key, None)
        Q._PREP_CACHE.update(saved)


def test_warehouse_gc_removes_only_dangling(spark, tmp_path):
    """gc() deletes data dirs whose manifest never committed (killed
    mid-write) and never touches committed snapshots."""
    wh = Warehouse(str(tmp_path / "wh"), run_id="t")
    df = spark.range(0, 10).selectExpr("id", "id * 2 AS x")
    out = wh.checkpoint(df, "tbl", "snapA")
    assert out.count() == 10
    # simulate a crash: data written, manifest missing
    dangling = os.path.join(str(tmp_path / "wh"), "tbl", "data", "snapB")
    df.write.mode("overwrite").parquet(dangling)
    # default grace window: a just-written dangling dir could be another
    # session mid-commit — gc must leave it alone (round-4 ADVICE)
    assert wh.gc() == []
    assert os.path.exists(dangling)
    # no runs in flight: grace 0 sweeps it
    removed = wh.gc(grace_s=0)
    assert removed == [dangling]
    assert not os.path.exists(dangling)
    assert wh.read(spark, "tbl", "snapA").count() == 10


def test_dataset_split_content_keyed(spark):
    """Duplicate texts always share a split (content-keyed, not
    id-keyed), assignment is deterministic, and proportions are near
    80/10/10 over a 2000-doc sample."""
    from covertree_spark.functions.text import split_bucket_col, split_col

    base = generate_pages(spark, 1000, partitions=4).select(
        F.col("id").alias("doc_id"), "text"
    )
    # plant exact duplicates under fresh ids
    dup = base.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    df = base.unionByName(dup).select(
        "doc_id", "text",
        split_bucket_col(F.col("text")).alias("bucket"),
        split_col(F.col("text")).alias("split"),
    )
    rows = df.collect()
    by_text = {}
    for r in rows:
        by_text.setdefault(r["text"], set()).add((r["bucket"], r["split"]))
    assert all(len(v) == 1 for v in by_text.values())  # dup -> same split
    from collections import Counter

    c = Counter(r["split"] for r in rows)
    assert c["train"] + c["val"] + c["test"] == 2000
    assert 0.7 < c["train"] / 2000 < 0.9
    assert 0.04 < c["val"] / 2000 < 0.16


def test_scan_local_ops_have_no_exchange(spark):
    """PLAN CONTRACT: the per-document text ops (repetition components,
    html->text extraction, dataset split) are pure projections — their
    physical plans must contain no Exchange (shuffle) and no Python
    UDF node; they run at scan throughput at any corpus size."""
    from covertree_spark.functions.text import (
        extract_text_col,
        repetition_components,
        split_col,
    )

    pages = generate_pages(spark, 50, partitions=2)
    docs = pages.select(F.col("id").alias("doc_id"), "text", "html")
    plans = {
        "repetition": repetition_components(docs),
        "extract": docs.select(extract_text_col(F.col("html"))),
        "split": docs.select(split_col(F.col("text"))),
    }
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"{name} shuffles:\n{plan}"
        assert "PythonUDF" not in plan and "ArrowEval" not in plan, (
            f"{name} leaves the JVM:\n{plan}"
        )


def test_vocab_topk_plan_and_boundary(spark):
    """vocab_topk must plan the top-K as TakeOrderedAndProject
    (per-partition K-row heaps + driver merge — never a single-task
    global sort over the vocabulary), and its K boundary must follow
    the (cnt desc, token asc) tie-break exactly."""
    from covertree_spark.queries import q_vocab_topk, VOCAB_K

    df = q_vocab_topk(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    rows = df.collect()
    assert 0 < len(rows) <= VOCAB_K
    key = [(-r["cnt"], r["token"]) for r in rows]
    assert key == sorted(key)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_ivf_index_warehouse_resume(spark, tmp_path, monkeypatch):
    """The IVF index is a warehouse snapshot like the cover-tree index:
    a second session resumes the bucketed list layout, the centers and
    the calibrated probe dial from disk — no re-normalization, no
    Voronoi sampling, no calibration pass — and answers identically."""
    import numpy as np

    from covertree_spark import queries as Q
    from covertree_spark.operators import similarity
    from tests.conftest import SF_TINY

    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "wh"))
    key = Q._prep_key(spark, SF_TINY, "ivf")
    saved = Q._PREP_CACHE.pop(key, None)
    try:
        idx1 = Q._ivf_index(spark, SF_TINY)
        snap = Q._PREP_SNAP[key]
        wh = Q._warehouse(spark)
        for t in ("ivf_points", "ivf_centers", "ivf_dial"):
            assert wh.is_committed(t, snap)
        man1 = wh.manifest("ivf_points", snap)

        def answers(idx):
            return sorted(
                (r["src"], r["dst"])
                for r in similarity.ivf_topk_over(
                    idx.pts, idx.centers, k=5, nprobe=idx.nprobe
                ).collect()
            )

        a1 = answers(idx1)

        # simulate a fresh session: drop the in-memory cache, rebuild
        Q._PREP_CACHE.pop(key)
        idx2 = Q._ivf_index(spark, SF_TINY)
        # resumed, not re-committed
        assert (
            wh.manifest("ivf_points", snap)["committed_at"]
            == man1["committed_at"]
        )
        assert np.array_equal(idx1.centers, idx2.centers)
        assert idx1.nprobe == idx2.nprobe
        assert idx1.recall_est == idx2.recall_est
        assert answers(idx2) == a1
    finally:
        if saved is not None:
            Q._PREP_CACHE[key] = saved
