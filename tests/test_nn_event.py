"""nn_event (cross-table nearest-neighbour join): rank-1 clearance
pin at the gated sf + assignment parity vs numpy brute force."""

import numpy as np
import pyarrow.parquet as pq

from covertree_spark import queries as Q
from covertree_spark.core import covertree as ct
from covertree_spark.core import geometry

from .conftest import SF_SMALL


def _xyz(table, col):
    ids = (
        pq.read_table(f"{SF_SMALL}/{table}.parquet", columns=[col])
        [col].to_numpy()
    )
    lon, lat = geometry.lonlat_from_id(ids)
    return ids, geometry.lonlat_to_xyz(lon, lat).astype(np.float32).astype(
        np.float64
    )


def test_nn_event_rank_clearance():
    """For every document, the gap between its 1st- and 2nd-nearest
    event distances must beat the cross-engine evaluation bound by
    orders of magnitude — the condition under which the engine's GEMM
    ranking and the oracle's explicit-difference ranking agree."""
    _, D = _xyz("documents", "doc_id")
    _, E = _xyz("events", "event_id")
    d2 = np.sort(ct.pairwise_sq_dists(D, E), axis=1)
    gap = float((np.sqrt(d2[:, 1]) - np.sqrt(d2[:, 0])).min())
    assert gap > 1e-6, f"rank1-rank2 NN gap {gap} too tight"


def test_nn_event_matches_numpy(spark):
    """Engine assignment == argmin over the full distance matrix
    (ties impossible by the clearance test above)."""
    did, D = _xyz("documents", "doc_id")
    eid, E = _xyz("events", "event_id")
    d2 = ct.pairwise_sq_dists(D, E)
    want = {int(d): int(eid[j]) for d, j in zip(did, d2.argmin(axis=1))}
    rows = Q.catalog()["nn_event"][0](spark, SF_SMALL).collect()
    got = {r["doc_id"]: r["event_id"] for r in rows}
    assert got == want
    assert all(r["m"] >= 0 for r in rows)


def test_event_knn_rank_clearance():
    """min adjacent gap among each doc's first EVKNN_K+1 cross
    distances at sf0.01 must beat the cross-engine evaluation bound by
    orders of magnitude — a regenerated fixture or deeper k fails
    loudly instead of silently flipping ranks."""
    import numpy as np
    import pyarrow.parquet as pq

    from covertree_spark import queries as Q
    from covertree_spark.core import covertree as ct
    from covertree_spark.core import geometry

    from .conftest import SF_SMALL

    ids = pq.read_table(
        f"{SF_SMALL}/documents.parquet", columns=["doc_id"]
    )["doc_id"].to_numpy()
    eids = pq.read_table(
        f"{SF_SMALL}/events.parquet", columns=["event_id"]
    )["event_id"].to_numpy()
    lon, lat = geometry.lonlat_from_id(ids)
    X = geometry.lonlat_to_xyz(lon, lat).astype(np.float32).astype(np.float64)
    lon2, lat2 = geometry.lonlat_from_id(eids)
    E = geometry.lonlat_to_xyz(lon2, lat2).astype(np.float32).astype(np.float64)
    D = np.sqrt(ct.pairwise_sq_dists(X, E))
    D.sort(axis=1)
    k = Q.EVKNN_K
    gaps = D[:, 1 : k + 2] - D[:, 0 : k + 1]
    assert float(gaps.min()) > 1e-7
