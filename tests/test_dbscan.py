"""DBSCAN (operators/dbscan.py) vs a driver-side reference
implementation of the KDD'96 definitions, on seeded random points —
roles (core/border/noise), cluster labels (min core id), totality
(every input id appears exactly once) — plus a hand-checkable
fixture where the border/noise distinction is explicit.
"""

import numpy as np
from pyspark.sql import functions as F

from covertree_spark.operators.dbscan import dbscan_labels


def ref_dbscan(X, eps, min_pts):
    """O(n^2) reference: exact KDD'96 roles + min-id cluster labels."""
    n = len(X)
    D = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    nbrs = [np.where(D[i] <= eps)[0] for i in range(n)]  # self included
    core = np.array([len(nb) >= min_pts for nb in nbrs])
    # components of core points under eps-adjacency
    label = {}
    for i in np.where(core)[0]:
        if i in label:
            continue
        stack, members = [i], []
        seen = {i}
        while stack:
            u = stack.pop()
            members.append(u)
            for v in nbrs[u]:
                if core[v] and v not in seen:
                    seen.add(v)
                    stack.append(v)
        m = min(members)
        for u in members:
            label[u] = m
    out = []
    for i in range(n):
        if core[i]:
            out.append((i, 2, label[i]))
        else:
            cl = [label[v] for v in nbrs[i] if core[v]]
            if cl:
                out.append((i, 1, min(cl)))
            else:
                out.append((i, 0, -1))
    return sorted(out)


def points_df(spark, X):
    # one coarse cell stresses nothing; spread over a grid so the
    # cogroup plan actually crosses cell boundaries
    rows = [
        (int(i), [float(v) for v in x], int(i) % 7) for i, x in enumerate(X)
    ]
    return spark.createDataFrame(
        rows, "id bigint, vec array<float>, cell bigint"
    )


def got(df):
    return sorted(
        (r["id"], r["role"], r["cluster"]) for r in df.collect()
    )


def test_random_blobs_match_reference(spark):
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(5, 3)) * 4
    X = np.concatenate(
        [c + rng.normal(scale=0.35, size=(60, 3)) for c in centers]
        + [rng.uniform(-8, 8, size=(40, 3))]  # sparse noise field
    ).astype(np.float32)
    eps, min_pts = 0.6, 5
    out = got(dbscan_labels(points_df(spark, X), eps, min_pts, d=3))
    assert out == ref_dbscan(X.astype(np.float64), eps, min_pts)


def test_hand_fixture_roles(spark):
    # line of 4 tight points (all core at min_pts=3), one hanger-on
    # within eps of exactly one core (border), one far point (noise)
    X = np.array(
        [
            [0.0, 0.0],
            [0.5, 0.0],
            [1.0, 0.0],
            [1.5, 0.0],
            [2.4, 0.0],  # within 1.0 of id 3 only -> border
            [9.0, 9.0],  # noise
        ],
        dtype=np.float32,
    )
    out = got(dbscan_labels(points_df(spark, X), 1.0, 3, d=2))
    assert out == [
        (0, 2, 0),
        (1, 2, 0),
        (2, 2, 0),
        (3, 2, 0),
        (4, 1, 0),
        (5, 0, -1),
    ]
    assert out == ref_dbscan(X.astype(np.float64), 1.0, 3)


def test_every_id_exactly_once(spark):
    rng = np.random.default_rng(11)
    X = rng.normal(size=(150, 2)).astype(np.float32)
    df = dbscan_labels(points_df(spark, X), 0.3, 4, d=2)
    ids = [r["id"] for r in df.select("id").collect()]
    assert sorted(ids) == list(range(150))
    # roles partition the id space
    roles = df.groupBy("role").count().collect()
    assert sum(r["count"] for r in roles) == 150
