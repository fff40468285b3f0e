"""Deployment-path test: the north_rule's `spark-submit --py-files`
mode, end-to-end. A driver script running from a NEUTRAL cwd with no
repo on PYTHONPATH imports the engine exclusively from the shipped
zip, runs a catalog query at sf0.001, and must produce the identical
sorted row set the in-process session produces."""

import hashlib
import json
import os
import shutil
import subprocess
import sys
import textwrap

import pytest

from covertree_spark.plans.session import _package_zip
from covertree_spark import queries as Q
from tests.conftest import SF_TINY

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _rows_digest(rows) -> str:
    return hashlib.sha256(
        json.dumps(sorted(map(list, rows))).encode()
    ).hexdigest()[:16]


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_py_files_runs_catalog_query(spark, tmp_path):
    expected = _rows_digest(
        tuple(r) for r in Q.catalog()["geo_cell_histogram"][0](
            spark, SF_TINY
        ).collect()
    )

    driver = tmp_path / "driver.py"
    driver.write_text(textwrap.dedent(f"""
        import hashlib, json
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[2]")
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        # import AFTER session start: the package must resolve from the
        # --py-files zip (this file's cwd has no covertree_spark)
        from covertree_spark import queries as Q

        df = Q.catalog()["geo_cell_histogram"][0](spark, {SF_TINY!r})
        rows = sorted(list(r) for r in df.collect())
        digest = hashlib.sha256(json.dumps(rows).encode()).hexdigest()[:16]
        print("SUBMIT_OK", len(rows), digest)
        spark.stop()
    """))

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    res = subprocess.run(
        [SPARK_SUBMIT, "--py-files", _package_zip(), str(driver)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),
        env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    line = next(
        (ln for ln in res.stdout.splitlines() if ln.startswith("SUBMIT_OK")),
        None,
    )
    assert line, f"no SUBMIT_OK in stdout: {res.stdout[-1000:]}"
    _tag, _n, digest = line.split()
    assert digest == expected
