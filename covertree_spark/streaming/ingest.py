"""Structured-streaming ingest: pages stream -> derived points.

The reference is batch-only (SURVEY §2.9); BASELINE keeps ``warc_ts``
so incremental append = re-run over new snapshots. This module gives
the engine a native incremental path anyway: a parquet-directory
stream of pages is transformed with the SAME exact-arithmetic
derivations as the batch path (one code path, so batch/stream parity
is a test, not a hope) and appended to a points table. Downstream
index builds then checkpoint per cell (plans/checkpoint.py), so a new
micro-batch only rebuilds the cells it touched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import cells as cellcodec
from ..core import geometry
from ..sources.pages import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def stream_points(pages: DataFrame, res: int) -> DataFrame:
    """Same derivations as the batch path (byte-identical text carried
    through; exact-arithmetic lon/lat; JVM-only expressions so the
    stream never blocks on Python)."""
    lon_e, lat_e = geometry.sql_lonlat_exprs("id")
    cell_e = cellcodec.sql_cell_expr(lon_e, lat_e, res)
    return pages.select(
        "id",
        "url",
        "warc_ts",
        "text",
        F.expr(lon_e).alias("lon"),
        F.expr(lat_e).alias("lat"),
        F.expr(cell_e).alias("cell"),
    )


def run_ingest(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    checkpoint_path: str,
    res: int = 4,
) -> None:
    """One availableNow pass: drain whatever is in ``src_path`` into
    the points table exactly once (checkpointed offsets -> restarts
    resume mid-stream, mirroring the batch layer's snapshot resume)."""
    pages = read_pages_stream(spark, src_path)
    pts = stream_points(pages, res)
    q = (
        pts.writeStream.format("parquet")
        .option("path", dst_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


def windowed_cell_counts(pages: DataFrame, res: int, window: str = "1 hour") -> DataFrame:
    """Streaming per-cell arrival histogram with late-data handling:
    watermarked event-time windows over warc_ts — the streaming analog
    of the load-bearing cell histogram (reference A3)."""
    pts = stream_points(pages, res)
    return (
        pts.withWatermark("warc_ts", "2 hours")
        .groupBy(F.window("warc_ts", window), F.col("cell"))
        .agg(F.count("*").alias("cnt"))
    )
