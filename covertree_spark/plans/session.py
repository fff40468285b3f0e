"""SparkSession factory with the engine's standard configuration.

Tuned for correctness-at-scale defaults: AQE on (runtime re-plan +
skew-join splitting), Arrow transfer for all pandas UDF boundaries,
explicit shuffle-partition sizing. Tests and bench override
parallelism via ``local[N]``.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def _package_zip() -> str:
    """Zip the covertree_spark package for worker distribution — the
    same artifact ``spark-submit --py-files`` would ship (north_rule
    deployment mode). Cached per process."""
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.path.dirname(pkg_dir)
    out = os.path.join(tempfile.gettempdir(), "covertree_spark_pyfiles.zip")
    with zipfile.ZipFile(out, "w") as z:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for f in filenames:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return out


# ---- persisted-intermediate registry (caching contract) --------------------
# Operators persist transient intermediates (candidate sets, input re-scans)
# because several downstream jobs consume them. A long-lived session running
# many queries (bench.py, the driver gate) would otherwise accumulate cached
# blocks until storage eviction (ADVICE round 1). Operators register such
# DataFrames here; callers invoke release_intermediates() once the query's
# result is materialized. Inputs the CALLER persisted (e.g. the catalog's
# prepared-points cache) are never registered, so they survive release.
_RELEASABLE: list = []


def mark_releasable(df):
    _RELEASABLE.append(df)
    return df


def release_intermediates() -> int:
    """Unpersist every operator-persisted intermediate. Call after the
    query result is materialized (never before: the plan would
    recompute). Returns the number released.

    SCOPE CONTRACT (round-2 ADVICE): the registry is global and
    assumes ONE query in flight per session at a time — build a query,
    materialize it, release, then build the next. If two catalog
    queries are built before either materializes, releasing after the
    first drops the second's registered persists (e.g. the kNN
    ``parts`` persist) and silently reintroduces the union
    double-compute its persist exists to prevent. Interleaved callers
    must materialize every outstanding operator result first — the
    dist_comps accumulator doubling is the regression signal."""
    n = len(_RELEASABLE)
    for df in _RELEASABLE:
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass
    _RELEASABLE.clear()
    return n


def get_spark(
    app_name: str = "covertree_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 8)
    # Worker-process memory hygiene, inherited via the JVM child env:
    #  - glibc: never mmap/munmap large numpy buffers (first-touch page
    #    faults are pathologically slow on this hardware; keep the heap
    #    and reuse it across tasks)
    #  - BLAS: one thread per worker (local[N] already saturates cores)
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    os.environ.setdefault("MKL_NUM_THREADS", "1")
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.addPyFile(_package_zip())
    return spark
