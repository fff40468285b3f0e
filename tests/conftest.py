import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_TINY = os.environ.get("SPARK_GRAFT_SF_TINY", "/root/testdata/sf0.001")
SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.01")


def make_blobs(n, d, n_clusters, seed=42, spread=1.0, cluster_sizes=None):
    """Seeded Gaussian blobs (mirrors the intent of
    /root/reference/ptgen.py:18-26 without sklearn)."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-10, 10, size=(n_clusters, d))
    if cluster_sizes is None:
        base = n // n_clusters
        cluster_sizes = [base] * n_clusters
        cluster_sizes[-1] += n - base * n_clusters
    pts = []
    for c, sz in zip(centers, cluster_sizes):
        pts.append(c + rng.normal(0, spread, size=(sz, d)))
    X = np.concatenate(pts).astype(np.float32)
    perm = rng.permutation(len(X))
    return X[perm]


def brute_ball_edges(X, r):
    """Oracle: sorted set of ordered (src,dst) pairs with d<=r, src!=dst.
    Float64 math, matching the engine (reference 'bf' semantics,
    /root/reference/src/dist_point_vector.cpp:194-216)."""
    from covertree_spark.core.covertree import pairwise_sq_dists

    D2 = pairwise_sq_dists(X, X)
    hit = D2 <= r * r
    np.fill_diagonal(hit, False)
    src, dst = np.nonzero(hit)
    order = np.lexsort((dst, src))
    return np.stack([src[order], dst[order]], axis=1)


def brute_knn(X, Q, k, exclude_self_idx=None):
    """Oracle: per query the k smallest (dist, id); returns
    (qidx, pidx, dist) sorted by (q, dist, id)."""
    from covertree_spark.core.covertree import pairwise_sq_dists

    D = np.sqrt(pairwise_sq_dists(Q, X))
    n = X.shape[0]
    rows = []
    for qi in range(Q.shape[0]):
        d = D[qi]
        ids = np.arange(n)
        if exclude_self_idx is not None:
            m = ids != exclude_self_idx[qi]
            d, ids = d[m], ids[m]
        order = np.lexsort((ids, d))[:k]
        for j in order:
            rows.append((qi, ids[j], d[j]))
    q = np.array([r[0] for r in rows], dtype=np.int64)
    p = np.array([r[1] for r in rows], dtype=np.int64)
    dd = np.array([r[2] for r in rows], dtype=np.float64)
    return q, p, dd


@pytest.fixture(scope="session")
def spark():
    from covertree_spark.plans.session import get_spark

    s = get_spark(app_name="covertree-tests")
    yield s
