"""Persistent per-cell cover-tree index: build, save, query.

The reference builds per-cell trees transiently inside the query
(/root/reference/src/dist_point_vector.cpp:994). Here the build is its
own checkpointable stage: per cell, the CSR arrays (the reference's
exact layout, include/cover_tree.h:29-32) plus the point block and
global ids serialize to ONE parquet row per cell — resumable index
construction and the measured "tree construction phase" of the
BASELINE scaling target.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..core import covertree as ct
from ..plans.grouped import grouped_apply
from ..sources.tables import vec_matrix

TREE_SCHEMA = (
    "cell bigint, n bigint, childarr array<bigint>, childptrs array<bigint>, "
    "centers array<bigint>, radii array<double>, ids array<bigint>, "
    "points array<double>"
)


def build_trees(
    points: DataFrame,
    d: int,
    cover: float = ct.DEFAULT_COVER,
    leaf_size: int = ct.DEFAULT_LEAF_SIZE,
    cell_col: str = "cell",
    strategy: str = "range",
) -> DataFrame:
    """One row per cell: CSR tree + flattened point block + global ids."""

    def per_cell(cell, pdf: pd.DataFrame) -> pd.DataFrame:
        X = vec_matrix(pdf)
        tree = ct.build(X, cover=cover, leaf_size=leaf_size)
        return pd.DataFrame(
            {
                "cell": [np.int64(cell)],
                "n": [np.int64(len(pdf))],
                "childarr": [tree.childarr],
                "childptrs": [tree.childptrs],
                "centers": [tree.centers],
                "radii": [tree.radii],
                "ids": [pdf["id"].to_numpy()],
                "points": [X.ravel()],
            }
        )

    return grouped_apply(
        points.select(cell_col, "id", "vec").withColumnRenamed(cell_col, "cell"),
        "cell",
        per_cell,
        TREE_SCHEMA,
        strategy=strategy,
    )


def tree_from_row(row) -> tuple[ct.CoverTree, np.ndarray, np.ndarray]:
    """Deserialize one cell row -> (tree, point block, global ids)."""
    tree = ct.CoverTree(
        childarr=np.asarray(row["childarr"], dtype=np.int64),
        childptrs=np.asarray(row["childptrs"], dtype=np.int64),
        centers=np.asarray(row["centers"], dtype=np.int64),
        radii=np.asarray(row["radii"], dtype=np.float64),
    )
    ids = np.asarray(row["ids"], dtype=np.int64)
    n = int(row["n"])
    pts = np.asarray(row["points"], dtype=np.float64).reshape(n, -1)
    return tree, pts, ids
