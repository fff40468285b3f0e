"""Replicates the driver's correctness gate: run every catalog query
on Spark AND its oracle SQL on DuckDB at sf0.01, compare sorted row
sets (superset of the driver's row-count + schema + value-hash)."""

import duckdb
import pytest

import __spark_entry__ as E
from covertree_spark.sources.tables import TABLES
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMALL}/{t}.parquet')"
        )
    return c


@pytest.fixture(scope="module")
def qmap():
    return E.queries()


@pytest.fixture(scope="module")
def omap():
    return E.oracle_sql()


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"src", "dst", "rank"}


ORACLE_NAMES = sorted(E.oracle_sql())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_equality(spark, con, qmap, omap, name):
    sdf = qmap[name](spark, SF_SMALL)
    cols = sorted(sdf.columns)
    srows = sorted(tuple(r[c] for c in cols) for r in sdf.collect())
    ores = con.sql(omap[name])
    oc = [d[0] for d in ores.description]
    order = [oc.index(c) for c in cols]
    orows = sorted(tuple(row[i] for i in order) for row in ores.fetchall())
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)} rows"
    assert srows == orows, f"{name}: value mismatch"


ROWS_ONLY = sorted(set(E.queries()) - set(E.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_run(spark, qmap, name):
    df = qmap[name](spark, SF_SMALL)
    assert df.count() >= 0
