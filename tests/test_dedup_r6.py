"""Round-6 optimization tests: the data-adaptive small paths of the
posting-list Jaccard (operators/dedup.py ngram_jaccard_pairs) must be
result-identical to the distributed expansion on every regime —
direct-from-docs kernel, posting-list kernel, and the JVM pair
explosion — including boilerplate shingles over the df cut."""

import pytest
from pyspark.sql import functions as F

from covertree_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark):
    """Synthetic corpus with exact dup pairs, near-dups and a
    boilerplate prefix whose shingles exceed the df cut."""
    boiler = "terms of service apply to all"
    rows = []
    for i in range(40):
        body = f"alpha beta gamma delta {i} epsilon zeta eta theta {i % 7}"
        rows.append((i, f"{boiler} {body}"))
        if i % 4 == 0:  # near-dup: one token changed
            rows.append((1000 + i, f"{boiler} {body} extra"))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("max_df", [None, 6])
def test_jaccard_small_paths_match_distributed(spark, docs, monkeypatch, max_df):
    want = None
    # force each regime in turn by gating the dial constants
    for rows_cut, pairs_cut in [
        (10**9, 10**9),  # direct-from-docs kernel (or lists kernel for None)
        (0, 0),  # distributed JVM expansion
    ]:
        monkeypatch.setattr(dedup, "_JACCARD_SMALL_ROWS", rows_cut)
        monkeypatch.setattr(dedup, "_JACCARD_SMALL_PAIRS", pairs_cut)
        got = _rows(
            dedup.ngram_jaccard_pairs(docs, n=3, min_jaccard_pct=50, max_df=max_df)
        )
        assert got, "regimes must produce non-trivial output to compare"
        if want is None:
            want = got
        else:
            assert got == want


def test_jaccard_lists_kernel_matches_distributed(spark, docs, monkeypatch):
    """The posting-list kernel regime specifically (direct gate fails,
    exact pair probe passes): pin PAIRS between the direct path's
    bound and the true pair count."""
    n_rows = int(
        dedup.shingle_counts_df(docs, 3).agg(F.sum("sz")).collect()[0][0]
    )
    max_df = 6
    bound = n_rows * (max_df - 1) // 2
    grp = (
        dedup.shingles_df(docs, 3)
        .groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_df)
    )
    exact_pairs = int(
        grp.agg(F.sum(F.col("df") * (F.col("df") - 1) / 2)).collect()[0][0]
    )
    assert exact_pairs < bound  # the regimes are genuinely distinct here
    monkeypatch.setattr(dedup, "_JACCARD_SMALL_ROWS", 10**9)
    monkeypatch.setattr(dedup, "_JACCARD_SMALL_PAIRS", exact_pairs)
    via_lists = _rows(
        dedup.ngram_jaccard_pairs(docs, n=3, min_jaccard_pct=50, max_df=max_df)
    )
    monkeypatch.setattr(dedup, "_JACCARD_SMALL_PAIRS", 0)
    distributed = _rows(
        dedup.ngram_jaccard_pairs(docs, n=3, min_jaccard_pct=50, max_df=max_df)
    )
    assert via_lists == distributed
