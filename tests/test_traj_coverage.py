"""traj_coverage semantics + the TRAJ_R clearance pin at the gated sf.

The mutual-coverage definition is checked against a direct numpy
oracle on a hand-built micro-fixture (including the P=100 case, which
is exactly discrete Hausdorff <= R both ways); the clearance test
recomputes the full cross-pair distance spectrum at sf0.01 and pins
the measured gap around TRAJ_R, so a regenerated fixture or a changed
radius fails loudly instead of silently flipping predicate decisions.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from covertree_spark import queries as Q
from covertree_spark.core import covertree as ct
from covertree_spark.core import geometry
from covertree_spark.operators.ball_join import ball_self_join

from .conftest import SF_SMALL


def _mutual_cov_oracle(pts_by_user, r, pct):
    """Direct numpy evaluation of the definition."""
    users = sorted(pts_by_user)
    out = []
    for i, u1 in enumerate(users):
        for u2 in users[i + 1 :]:
            A, B = pts_by_user[u1], pts_by_user[u2]
            D = np.sqrt(ct.pairwise_sq_dists(A, B))
            cov12 = int((D.min(axis=1) <= r).sum())
            cov21 = int((D.min(axis=0) <= r).sum())
            if 100 * cov12 >= pct * len(A) and 100 * cov21 >= pct * len(B):
                out.append((u1, u2, cov12, cov21, len(A), len(B)))
    return sorted(out)


@pytest.mark.parametrize("pct", [100, 60])
def test_mutual_coverage_semantics(spark, pct):
    """3 users on a line (1-D embedded in 3-D), r=1.0: u0={0,1},
    u1={0.5, 1.5}, u2={10, 11, 30}. At pct=100: (u0,u1) qualify
    (Hausdorff 0.5 both ways); u2's point at 30 is uncovered by
    anyone. At pct=60: u2 still fails against u0/u1 (0/3 covered)."""
    raw = {
        0: np.array([[0.0, 0, 0], [1.0, 0, 0]]),
        1: np.array([[0.5, 0, 0], [1.5, 0, 0]]),
        2: np.array([[10.0, 0, 0], [11.0, 0, 0], [30.0, 0, 0]]),
    }
    rows, pid = [], 0
    for u, X in raw.items():
        for p in X:
            rows.append((pid, u, [float(v) for v in p]))
            pid += 1
    df = spark.createDataFrame(rows, "id bigint, u bigint, vec array<float>")
    pts = df.withColumn("cell", (F.col("id") % 4).cast("bigint"))
    edges = ball_self_join(pts.select("id", "vec", "cell"), 1.0, d=3).select(
        "src", "dst"
    )
    um = df.select("id", "u")
    e = (
        edges.join(um.select(F.col("id").alias("src"), F.col("u").alias("us")), "src")
        .join(um.select(F.col("id").alias("dst"), F.col("u").alias("ud")), "dst")
        .filter(F.col("us") != F.col("ud"))
    )
    cov = e.groupBy("us", "ud").agg(F.countDistinct("src").alias("c"))
    got_cov = {(r["us"], r["ud"]): r["c"] for r in cov.collect()}
    n = {u: len(X) for u, X in raw.items()}
    got = sorted(
        (u1, u2, got_cov.get((u1, u2), 0), got_cov.get((u2, u1), 0), n[u1], n[u2])
        for u1 in raw
        for u2 in raw
        if u1 < u2
        and 100 * got_cov.get((u1, u2), 0) >= pct * n[u1]
        and 100 * got_cov.get((u2, u1), 0) >= pct * n[u2]
    )
    want = _mutual_cov_oracle(
        {u: X.astype(np.float64) for u, X in raw.items()}, 1.0, pct
    )
    assert got == want
    if pct == 100:
        assert [(u1, u2) for u1, u2, *_ in got] == [(0, 1)]


def test_traj_r_clearance(spark):
    """min |d - TRAJ_R| over ALL cross pairs at sf0.01 must exceed the
    cross-engine evaluation bound by orders of magnitude. The GEMM
    d^2 (engine) and explicit-difference d^2 (oracle) agree to ~4 ulps
    (~1e-15 absolute at d<=2); the pinned gap is >= 2e-7."""
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    ids = np.array([r[0] for r in ev.select("event_id").collect()])
    lon, lat = geometry.lonlat_from_id(ids)
    X = geometry.lonlat_to_xyz(lon, lat).astype(np.float32).astype(np.float64)
    D = np.sqrt(ct.pairwise_sq_dists(X, X))
    np.fill_diagonal(D, np.inf)
    gap = float(np.abs(D - Q.TRAJ_R).min())
    assert gap > 2e-7, f"distance within {gap} of TRAJ_R {Q.TRAJ_R}"
