"""Sources: testdata tables -> the engine's canonical point layout.

Canonical points schema (SURVEY.md §1.1): ``(id BIGINT, vec
ARRAY<DOUBLE>, cell BIGINT?)``. Geometry points are derived from the
``documents`` table (id -> lon/lat via exact integer arithmetic, ->
unit-sphere xyz), vector points from the ``embeddings`` table. The
lon/lat and cell derivations are rendered from the *same* SQL
fragments the DuckDB oracle uses, so both engines compute bit-equal
doubles (replaces the reference's fvecs readers,
/root/reference/src/dist_point_vector.cpp:11-74 — parquet + Catalyst
scan pruning instead of MPI-IO).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

from ..core import geometry

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def doc_points_lonlat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (id, lon, lat): deterministic geometry per doc_id.

    Pure Spark-SQL expressions (no Python), identical text to the
    oracle fragments -> bit-equal doubles.
    """
    lon_e, lat_e = geometry.sql_lonlat_exprs("doc_id")
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            F.col("doc_id").alias("id"),
            F.expr(lon_e).alias("lon"),
            F.expr(lat_e).alias("lat"),
        )
    )


@F.pandas_udf(ArrayType(DoubleType()))
def _xyz_udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
    xyz = geometry.lonlat_to_xyz(lon.to_numpy(), lat.to_numpy())
    return pd.Series(list(xyz))


def doc_points_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (id, vec[3]) unit-sphere chord-metric points."""
    return doc_points_lonlat(spark, sf_dir).select(
        "id", _xyz_udf("lon", "lat").alias("vec")
    )


def embedding_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings -> (id, vec[d]) with float32 values widened to
    float64 (exact) so engine math matches the DOUBLE[] oracle."""
    return load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast(ArrayType(DoubleType())).alias("vec"),
    )


def vec_matrix(pdf: pd.DataFrame, col: str = "vec") -> np.ndarray:
    """Stack an ARRAY<DOUBLE> pandas column into an (n, d) float64
    block — the reference's row-major PointVector layout
    (/root/reference/include/point_vector.h:48-50) materialized from
    Arrow."""
    return np.stack(pdf[col].to_numpy()).astype(np.float64, copy=False)
