"""k-means + SemDeDup (operators/kmeans.py) vs driver-side numpy
references. Fixtures use well-separated blobs / clear cosine margins
so last-ulp summation-order differences between the distributed
partial-sum reduce and the numpy reference cannot flip any
assignment (the repo's clearance discipline).
"""

import numpy as np
from pyspark.sql import functions as F

from covertree_spark.operators.kmeans import lloyd_kmeans, semdedup_keep


def ref_lloyd(X, k, iters):
    C = X[:k].astype(np.float64).copy()
    for _ in range(iters):
        a = np.argmin(
            (C * C).sum(1)[None, :] - 2.0 * (X @ C.T), axis=1
        )
        for j in range(k):
            m = a == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    return np.argmin((C * C).sum(1)[None, :] - 2.0 * (X @ C.T), axis=1), C


def pts_df(spark, X):
    rows = [(int(i), [float(v) for v in x]) for i, x in enumerate(X)]
    return spark.createDataFrame(rows, "id bigint, vec array<float>")


def test_kmeans_matches_reference(spark):
    rng = np.random.default_rng(2)
    centers = rng.normal(size=(4, 8)) * 10  # wide separation
    X = np.concatenate(
        [c + rng.normal(scale=0.3, size=(50, 8)) for c in centers]
    ).astype(np.float32)
    # shuffle so init ids span blobs (ids stay the identity)
    perm = rng.permutation(len(X))
    X = X[perm]
    want_a, want_C = ref_lloyd(X.astype(np.float64), 4, 5)
    assign, C = lloyd_kmeans(pts_df(spark, X), 4, iters=5)
    got = {r["id"]: r["cluster"] for r in assign.collect()}
    assert got == {i: int(want_a[i]) for i in range(len(X))}
    assert np.allclose(C, want_C, rtol=1e-9, atol=1e-12)


def test_kmeans_empty_cluster_keeps_center(spark):
    # k=3 but only two real blobs; the init center that loses all its
    # points must keep its previous position, not NaN out
    X = np.array(
        [[0.0, 0.0], [0.1, 0.0], [10.0, 10.0], [10.1, 10.0], [0.0, 0.1]],
        dtype=np.float32,
    )
    assign, C = lloyd_kmeans(pts_df(spark, X), 3, iters=4)
    assert np.isfinite(C).all()
    got = {r["id"]: r["cluster"] for r in assign.collect()}
    assert len(got) == 5


def unit(X):
    return X / np.linalg.norm(X, axis=1, keepdims=True)


def ref_semdedup(U, k, tau, iters):
    a, _ = ref_lloyd(U, k, iters)
    keep = []
    for i in range(len(U)):
        dup = any(
            a[j] == a[i] and float(U[j] @ U[i]) >= tau for j in range(i)
        )
        if not dup:
            keep.append(i)
    return sorted(keep)


def test_semdedup_matches_reference(spark):
    rng = np.random.default_rng(9)
    base = unit(rng.normal(size=(30, 16)))
    # near-dups: 10 vectors tightly perturbed from the first 10
    dups = unit(base[:10] + rng.normal(scale=0.01, size=(10, 16)))
    U = unit(np.concatenate([base, dups])).astype(np.float32)
    tau = 0.9
    want = ref_semdedup(U.astype(np.float64), 3, tau, 4)
    got = sorted(
        r["id"] for r in semdedup_keep(pts_df(spark, U), 3, tau, iters=4).collect()
    )
    assert got == want
    # every dropped doc really has a kept smaller-id near-dup somewhere
    assert len(got) < len(U)
