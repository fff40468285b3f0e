"""Plan contracts for the round-5 operators: the physical shapes the
100 TB story depends on, pinned so a regression in Catalyst output
(or a careless refactor) fails loudly rather than silently shuffling
the points table."""

from tests.conftest import SF_TINY


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_tile_interp_broadcasts_ring_map(spark):
    """The ring map is O(occupied x 9) and MUST broadcast: a
    SortMergeJoin here would shuffle the points table per call."""
    from covertree_spark.queries import q_tile_interp

    plan = _plan(q_tile_interp(spark, SF_TINY))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_emb_quantize_is_pure_projection(spark):
    """Quantization is a scan-side projection: zero exchanges, no
    Python workers anywhere."""
    from covertree_spark.queries import q_emb_quantize

    plan = _plan(q_emb_quantize(spark, SF_TINY))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_fuzzy_join_no_cartesian(spark):
    """FastSS blocking must render as an equi-join on the deletion
    variant, never a cartesian/broadcast-nested-loop over docs."""
    from covertree_spark.queries import q_fuzzy_join

    plan = _plan(q_fuzzy_join(spark, SF_TINY))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_skyline_windows_jvm_only(spark):
    """Both skyline phases are JVM window aggregates — no Python in
    the dominance path."""
    from covertree_spark.queries import q_geo_skyline

    plan = _plan(q_geo_skyline(spark, SF_TINY))
    assert "Window" in plan
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_tile_median_windows_over_value_collapse(spark):
    """The median window must consume the (tile, value, count)
    collapse — an exchange keyed on the collapse, then Window; no
    Python, no cartesian."""
    from covertree_spark.queries import q_tile_median

    plan = _plan(q_tile_median(spark, SF_TINY))
    assert "Window" in plan
    assert "Python" not in plan


def test_events_cube_single_expand(spark):
    """rollup() is ONE Expand + hash aggregate, not a union of
    scans."""
    from covertree_spark.queries import q_events_cube

    plan = _plan(q_events_cube(spark, SF_TINY))
    assert plan.count("Expand") == 1
    assert "Python" not in plan


def test_cell_cover_union_equals_base_and_disjoint(spark):
    """The normalized cover's expansion back to res-6 cells must equal
    the base window cover exactly (no gaps, no overlaps)."""
    from covertree_spark.queries import (
        COVER_RES,
        _cover_ranges,
        q_cell_cover,
    )

    rows = q_cell_cover(spark, None).collect()
    expanded = set()
    for r in rows:
        res, cell = r.res, r.cell
        n = 1 << int(res)
        ix, iy = cell // n, cell % n
        shift = COVER_RES - int(res)
        side = 1 << shift
        for dx in range(side):
            for dy in range(side):
                leaf = ((ix << shift) + dx) * (1 << COVER_RES) + (
                    (iy << shift) + dy
                )
                assert leaf not in expanded, "overlapping cover cells"
                expanded.add(leaf)
    ix0, ix1, iy0, iy1 = _cover_ranges()
    base = {
        ix * (1 << COVER_RES) + iy
        for ix in range(ix0, ix1 + 1)
        for iy in range(iy0, iy1 + 1)
    }
    assert expanded == base
    assert len(rows) < len(base)  # it actually coarsened
