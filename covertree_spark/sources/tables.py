"""Sources: testdata tables -> the engine's canonical point layout.

Canonical points schema (SURVEY.md §1.1): ``(id BIGINT, vec
ARRAY<FLOAT>, cell BIGINT?)``. FLOAT32 POINT PAYLOADS are the
reference's entire type system (``Atom`` = float32,
/root/reference/include/utils.h:17-18; src/dist_point_vector.cpp:38
asserts sizeof(Atom)==4): every vector rides shuffles, caches and
parquet at 4 bytes/dim — half the bytes through the memory system,
the binding resource of the scaling gate. Exactness contract: values
are float32-REPRESENTABLE but all kernel math widens to float64, so
engine results stay bit-comparable with a float64 SQL oracle over the
same f32-representable inputs (the derivation fragments below round
through FLOAT in BOTH engines).

Geometry points are derived from the ``documents`` table (id ->
lon/lat via exact integer arithmetic, -> unit-sphere xyz), vector
points from the ``embeddings`` table (float32 in parquet already —
the cast is exact). The lon/lat and cell derivations are rendered
from the *same* SQL fragments the DuckDB oracle uses, so both engines
compute bit-equal doubles (replaces the reference's fvecs readers,
/root/reference/src/dist_point_vector.cpp:11-74 — parquet + Catalyst
scan pruning instead of MPI-IO).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

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


@F.pandas_udf(ArrayType(FloatType()))
def _xyz_udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
    """float64 trig, then ONE float32 rounding — the same rounding the
    oracle's shared xyz fragment applies (CAST(... AS FLOAT)), so both
    engines hold bit-identical f32-representable coordinates."""
    xyz = geometry.lonlat_to_xyz(lon.to_numpy(), lat.to_numpy())
    return pd.Series(list(xyz.astype(np.float32)))


def doc_points_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (id, vec[3]) unit-sphere chord-metric points."""
    return doc_points_lonlat(spark, sf_dir).select(
        "id", _xyz_udf("lon", "lat").alias("vec")
    )


def event_points_lonlat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> (id, lon, lat): the per-ping location, same shared
    id->geometry derivation (and therefore the same oracle fragments)
    as the documents table."""
    lon_e, lat_e = geometry.sql_lonlat_exprs("event_id")
    return load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("id"),
        F.expr(lon_e).alias("lon"),
        F.expr(lat_e).alias("lat"),
    )


def points_xyz(lonlat: DataFrame) -> DataFrame:
    """(id, lon, lat) -> (id, vec[3]): the one f32 rounding shared with
    the oracle's xyz fragment (see _xyz_udf)."""
    return lonlat.select("id", _xyz_udf("lon", "lat").alias("vec"))


def embedding_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings -> (id, vec[d]): the parquet column is float32
    already, so the native FLOAT array is EXACT; kernels widen to
    float64, matching the DOUBLE[] oracle bit-for-bit."""
    return load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("vec"),
    )


def vec_matrix(pdf: pd.DataFrame, col: str = "vec") -> np.ndarray:
    """Stack an ARRAY<FLOAT> pandas column into an (n, d) float64
    block — the reference's row-major PointVector layout
    (/root/reference/include/point_vector.h:48-50) materialized from
    Arrow. The f32 -> f64 widening is exact and O(n*d) — negligible
    next to the GEMMs it feeds; the 2x byte saving lives where it
    matters (shuffle/cache/Arrow transfer of the column itself)."""
    return np.stack(pdf[col].to_numpy()).astype(np.float64, copy=False)
