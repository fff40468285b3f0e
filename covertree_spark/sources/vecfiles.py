"""fvecs / fbin / u8bin vector-file sources (reference formats) and
the dataset slicer — SURVEY §2 rows S3/S6.

Format semantics match the reference readers
(/root/reference/dataset_io.py:24-66; C++ MPI-IO parallel read
/root/reference/src/dist_point_vector.cpp:11-74):

  * ``.fvecs``  — per row: little-endian ``int32 d`` + ``float32 x d``;
                  no global header (n = filesize / (4*(d+1)))
  * ``.fbin``   — header ``uint32 n, uint32 d``, then ``n*d float32``
  * ``.u8bin``  — header ``uint32 n, uint32 d``, then ``n*d uint8``

Spark-first distribution: every format is a FIXED-STRIDE record file,
so the driver reads only the tiny header, then ``spark.range`` over
row ids gives contiguous id ranges per partition and each Arrow batch
does ONE seek + bulk ``np.fromfile`` for its rows — the moral
equivalent of the reference's MPI-IO strided filetype read, with
Spark's scheduler replacing the communicator. No full-file driver
read, no per-row Python.

The reference's dataset slicer (``read_*(start, count)`` -> rows
[start, start+count)) maps to the same range mechanics: ``start`` /
``count`` push straight into the id range.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def info_file(path: str) -> tuple[int, int, str]:
    """(n_rows, dim, atom dtype) from the header / file size alone."""
    size = os.path.getsize(path)
    if path.endswith(".fvecs"):
        with open(path, "rb") as f:
            d = int(np.fromfile(f, dtype="<i4", count=1)[0])
        if size % (4 * (d + 1)) != 0:
            raise ValueError(f"{path}: size {size} not a multiple of 4*({d}+1)")
        return size // (4 * (d + 1)), d, "float32"
    if path.endswith(".fbin") or path.endswith(".u8bin"):
        with open(path, "rb") as f:
            n, d = (int(x) for x in np.fromfile(f, dtype="<u4", count=2))
        return n, d, "uint8" if path.endswith(".u8bin") else "float32"
    raise ValueError(f"unsupported vector file extension: {path}")


def _layout(path: str, d: int) -> tuple[int, int, int]:
    """(header_bytes, row_stride_bytes, payload_offset_in_row)."""
    if path.endswith(".fvecs"):
        return 0, 4 * (d + 1), 4  # skip the per-row dim prefix
    if path.endswith(".fbin"):
        return 8, 4 * d, 0
    if path.endswith(".u8bin"):
        return 8, d, 0
    raise ValueError(path)


def read_vectors(
    spark: SparkSession,
    path: str,
    start: int = 0,
    count: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed read -> (id BIGINT, vec ARRAY<FLOAT>); ``id`` is the
    row index in the file. ``start``/``count`` select rows
    [start, start+count) — the reference's slicer semantics. uint8
    atoms widen to float32 (exact)."""
    path = os.path.abspath(path)
    n, d, atom = info_file(path)
    if start < 0 or start > n:
        raise ValueError(f"start {start} outside [0, {n}]")
    end = n if count is None else min(n, start + count)
    parts = partitions or spark.sparkContext.defaultParallelism
    header, stride, pay_off = _layout(path, d)
    rec_dtype = np.dtype("<u1") if atom == "uint8" else np.dtype("<f4")
    per_row = d  # payload atoms per row

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["id"].to_numpy()
            lo, hi = int(ids.min()), int(ids.max())
            # spark.range partitions are contiguous; guard anyway
            if hi - lo + 1 != len(ids):
                order = np.sort(ids)
                if not np.array_equal(order, np.arange(lo, hi + 1)):
                    raise AssertionError("non-contiguous id batch")
            m = hi - lo + 1
            with open(path, "rb") as f:
                raw = np.fromfile(
                    f,
                    dtype=np.uint8,
                    count=m * stride,
                    offset=header + lo * stride,
                )
            rows = raw.reshape(m, stride)[:, pay_off:]
            X = (
                rows.reshape(-1)
                .view(rec_dtype)
                .reshape(m, per_row)
                .astype(np.float32)
            )
            out_ids = np.arange(lo, hi + 1, dtype=np.int64)
            sel = np.argsort(ids, kind="stable")  # emit in batch id order
            inv = ids - lo
            yield pd.DataFrame({"id": ids[sel], "vec": list(X[inv[sel]])})

    return (
        spark.range(start, end, 1, parts)
        .mapInPandas(scan, schema="id bigint, vec array<float>")
    )


def slice_points(points: DataFrame, start: int, count: int,
                 id_col: str = "id") -> DataFrame:
    """Dataset slicer over a canonical points table: rows with
    ``start <= id < start + count`` (the reference slicer contract,
    dataset_io.py:44-66, applied to the id column so the filter pushes
    down to the parquet scan)."""
    return points.filter(
        (F.col(id_col) >= int(start)) & (F.col(id_col) < int(start + count))
    )


def write_fvecs(path: str, X: np.ndarray) -> None:
    """Serial writer for fixtures/exports (reference dataset_io.py:80)."""
    X = np.asarray(X, dtype=np.float32)
    n, d = X.shape
    out = np.empty((n, d + 1), dtype=np.float32)
    out[:, 0] = np.frombuffer(
        np.full(n, d, dtype="<i4").tobytes(), dtype="<f4"
    )
    out[:, 1:] = X
    out.tofile(path)


def write_fbin(path: str, X: np.ndarray) -> None:
    X = np.asarray(X, dtype=np.float32)
    with open(path, "wb") as f:
        np.asarray(X.shape, dtype="<u4").tofile(f)
        X.tofile(f)


def write_u8bin(path: str, X: np.ndarray) -> None:
    X = np.asarray(X, dtype=np.uint8)
    with open(path, "wb") as f:
        np.asarray(X.shape, dtype="<u4").tofile(f)
        X.tofile(f)
