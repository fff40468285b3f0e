"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash -> CORRECTNESS_r{N}.json).

The catalog lives in covertree_spark/queries.py: every operator is a
(spark_fn, oracle_sql) pair; rows-only ops (minhash/simhash LSH,
fingerprints, approximate IVF) have no SQL entry by design.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from covertree_spark import queries as Q  # noqa: E402


def _prepare(spark: SparkSession) -> None:
    """Ship the package to Python workers (same artifact as
    spark-submit --py-files) — idempotent."""
    from covertree_spark.plans.session import _package_zip

    try:
        spark.sparkContext.addPyFile(_package_zip())
    except Exception:
        pass  # already registered


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: exact k=10 geo kNN self-join over points derived
    from the documents table at sf0.001 (the BASELINE headline metric)."""
    _prepare(spark)
    return Q.q_geo_knn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {}
    for name, (fn, _sql) in Q.catalog().items():
        def wrapped(spark, sf_dir, _fn=fn):
            _prepare(spark)
            return _fn(spark, sf_dir)

        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in Q.catalog().items() if sql is not None}
