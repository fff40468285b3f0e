"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES F1;
BASELINE input_hint schema: url, warc_ts, html, text, lang).

Content is a pure function of (seed, row index) — generated
distributively with ``spark.range`` + ``mapInPandas`` so the exact same
table materializes at any parallelism level and any scale (10^12 rows
reach this same code path; only ``n`` differs). No external data.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = (
    "id bigint, url string, warc_ts timestamp, html binary, text string, lang string"
)

_LANGS = ["en", "de", "fr", "es", "zh"]
_VOCAB_SIZE = 50_000
_EPOCH = np.datetime64("2025-01-01T00:00:00")


def _vocab() -> np.ndarray:
    """50k deterministic pseudo-words."""
    rng = np.random.default_rng(42)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    lens = rng.integers(3, 9, size=_VOCAB_SIZE)
    return np.array(
        ["".join(letters[rng.integers(0, 26, size=L)]) for L in lens], dtype=object
    )


def _row_text(i: int, vocab: np.ndarray, seed: int = 42) -> str:
    """Deterministic token sequence for row i: sha256-seeded stream,
    20-200 tokens (FIXTURES F1 rule)."""
    h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    n_tok = int(rng.integers(20, 201))
    idx = rng.integers(0, _VOCAB_SIZE, size=n_tok)
    return " ".join(vocab[j] for j in idx)


def generate_pages(spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vocab = _vocab()
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = [_row_text(int(i), vocab, seed) for i in ids]
            urls = [f"https://site{int(i) % 10_000}.example/p/{int(i)}" for i in ids]
            ts = _EPOCH + ((ids * 37) % 31_536_000).astype("timedelta64[s]")
            htmls = [b"<html>" + t.encode() + b"</html>" for t in texts]
            langs = [_LANGS[int(i) % 5] for i in ids]
            yield pd.DataFrame(
                {
                    "id": ids,
                    "url": urls,
                    "warc_ts": ts,
                    "html": htmls,
                    "text": texts,
                    "lang": langs,
                }
            )

    return spark.range(0, n, 1, parts).mapInPandas(gen, schema=PAGES_SCHEMA)


def pages_to_points(pages: DataFrame) -> DataFrame:
    """pages -> (id, lon, lat, text) — geometry derived from the id via
    the exact-arithmetic recipe; ``text`` passes through UNTOUCHED
    (byte-identity invariant, input_hint)."""
    from pyspark.sql import functions as F

    from ..core import geometry

    lon_e, lat_e = geometry.sql_lonlat_exprs("id")
    return pages.select(
        "id", F.expr(lon_e).alias("lon"), F.expr(lat_e).alias("lat"), "text"
    )


def blob_points(
    spark: SparkSession,
    n: int,
    d: int = 32,
    n_clusters: int = 256,
    spread: float = 0.05,
    seed: int = 42,
    partitions: int | None = None,
    ambient: int | None = None,
) -> DataFrame:
    """Deterministic distributed Gaussian-ish blobs (the reference's
    benchmark generator shape, /root/reference/ptgen.py:9-33 /
    job_nersc_blobs.sh): cluster = id % n_clusters, offset = integer-
    hash uniform noise — a pure function of (seed, id), so identical
    at any parallelism. Returns (id, vec ARRAY<FLOAT>, cell) with
    cell = true cluster id (callers may re-partition via Voronoi);
    the f32 rounding is part of the deterministic data definition, so
    outputs stay identical at any parallelism.

    ``ambient``: like the reference's ptgen.py zero-pad + random QR
    rotation — points are generated in d intrinsic dimensions, padded
    to the ambient dimension and rotated by a seeded orthogonal matrix
    (distances preserved exactly; the workload gains the reference's
    high-ambient/low-intrinsic structure instead of axis-aligned
    coordinates)."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-1.0, 1.0, size=(n_clusters, d))
    parts = partitions or spark.sparkContext.defaultParallelism
    # per-dimension decay -> LOW INTRINSIC DIMENSION (~6 effective):
    # cover trees (like the reference's real datasets: corel, sift)
    # rely on bounded doubling dimension; uniform full-d noise is the
    # degenerate case where covering numbers explode
    scales = spread * (0.7 ** np.arange(d))
    rot = None
    if ambient is not None and ambient > d:
        # seeded QR of a gaussian -> uniform(Haar) orthogonal rotation
        # (ptgen.py:27-31); applied as one GEMM per batch
        q, _ = np.linalg.qr(rng.normal(size=(ambient, ambient)))
        rot = q[:, :d].T.copy()  # (d, ambient): vec_amb = x @ rot

    def _splitmix64(x: np.ndarray) -> np.ndarray:
        # full-avalanche mixer: a weak multiplicative hash here produces
        # structured collisions (identical noise offsets for id pairs),
        # i.e. EXACT distance ties that different BLAS evaluation orders
        # tie-break differently — discovered via the oracle gate
        x = (x + np.uint64(0x9E3779B97F4A7C15))
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            c = (ids % n_clusters).astype(np.int64)
            j = np.arange(d, dtype=np.uint64)
            key = ids.astype(np.uint64)[:, None] * np.uint64(d) + j[None, :] + np.uint64(seed)
            h = _splitmix64(key)
            noise = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53) - 0.5
            X = centers[c] + scales[None, :] * noise
            if rot is not None:
                X = X @ rot
            yield pd.DataFrame(
                {"id": ids, "vec": list(X.astype(np.float32)), "cell": c}
            )

    return spark.range(0, n, 1, parts).mapInPandas(
        gen, schema="id bigint, vec array<float>, cell bigint"
    )


def featurize_text(pages: DataFrame, d: int = 16, seed: int = 42) -> DataFrame:
    """pages -> (id, vec ARRAY<FLOAT>) seeded feature-hash of text
    (vectorized; float32 like the reference's Atom type)."""
    from ..functions.text import hash_tokens

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            # one flat token-hash array for the whole batch; per-doc
            # feature buckets via a single 2-D scatter-add (doc*d +
            # bucket), then row-normalize — no per-document loop
            toks = [t.split() for t in pdf["text"]]
            lens = np.fromiter((len(t) for t in toks), dtype=np.int64,
                               count=len(toks))
            V = np.zeros((len(pdf), d), dtype=np.float64)
            if int(lens.sum()):
                flat = np.concatenate(
                    [np.asarray(t, dtype=object) for t in toks if t]
                )
                h = hash_tokens(flat)
                doc = np.repeat(np.arange(len(lens)), lens)
                bucket = (h % np.uint64(d)).astype(np.int64)
                sign = np.where((h >> np.uint64(32)) & np.uint64(1), 1.0, -1.0)
                np.add.at(V.reshape(-1), doc * d + bucket, sign)
            nrm = np.linalg.norm(V, axis=1, keepdims=True)
            V = np.divide(V, nrm, out=V, where=nrm > 0)
            yield pd.DataFrame({"id": pdf["id"], "vec": list(V.astype(np.float32))})

    return pages.select("id", "text").mapInPandas(gen, schema="id bigint, vec array<float>")
