"""dist_comps instrumentation — the reference's efficiency metric.

The reference counts every metric evaluation in a global counter
(/root/reference/include/point_vector.h:11) and reports it per run
(/root/reference/rgraph.py:131-176); without it, pruning regressions
are invisible. Here the counter lives in
``covertree_spark.core.covertree.DIST_COMPS`` (a per-process int
bumped by every distance kernel); this module bridges it to a Spark
accumulator: operators wrap their pandas-UDF iterator functions with
``counted_stream`` so each task adds its delta on completion, and
bench.py installs a fresh accumulator per query to emit
``dist_comps`` in BENCH_r{N}.json.

The accumulator is captured in the UDF closure at PLAN BUILD time, so
``install`` must run before the operator function is called. Driver-
side distance work (Voronoi sampling, hierarchy derivation) is
counted separately via ``driver_snapshot``/``driver_delta``.
"""

from __future__ import annotations

_CURRENT = None


def install(spark):
    """Create and register a fresh dist_comps accumulator. Returns it."""
    global _CURRENT
    _CURRENT = spark.sparkContext.accumulator(0)
    return _CURRENT


def current():
    """The active accumulator (or None when instrumentation is off)."""
    return _CURRENT


def counted_stream(fn, acc=None):
    """Wrap a mapInPandas iterator function so the worker-side
    DIST_COMPS delta of each invocation is added to ``acc``. No-op
    when instrumentation is off (zero overhead in the hot path)."""
    if acc is None:
        acc = _CURRENT
    if acc is None:
        return fn

    def wrapped(batches):
        from ..core import covertree as _ct

        start = _ct.DIST_COMPS
        try:
            yield from fn(batches)
        finally:
            acc.add(_ct.DIST_COMPS - start)

    return wrapped


def driver_snapshot() -> int:
    from ..core import covertree as _ct

    return _ct.DIST_COMPS


def driver_delta(snapshot: int) -> int:
    from ..core import covertree as _ct

    return _ct.DIST_COMPS - snapshot
