"""Deduplication operators over the ``documents`` table — exact,
n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

Scale notes (the 100 TB story):
  * exact_dedup        — single hash-shuffle groupBy on the text (at
                         real scale: groupBy on a 128-bit content hash
                         so the shuffle carries 16 bytes, not the text;
                         both shapes are implemented).
  * ngram_jaccard      — shingle -> explode -> self-equi-join on
                         shingle -> pair-count aggregation. All
                         built-in shuffle joins; prefiltered by
                         requiring a shared shingle, so complexity
                         tracks true-near-dup density, not n^2.
  * minhash_lsh        — signature per doc (numpy, engine-neutral
                         hashes) -> band buckets -> candidate pairs via
                         equi-join on (band, bucket) -> exact-Jaccard
                         verification of candidates only. The standard
                         web-dedup plan.
  * simhash            — 64-bit signature, Hamming-ball candidates via
                         4x16-bit chunk banding (exact for distance<=3
                         by pigeonhole... chunk count > max distance).
  * embedding near-dup — cosine >= tau pairs; JVM-side zip_with dot
                         products over a broadcast-sized self-join at
                         test scale (LSH-bucketed variant in
                         similarity.py for the scale path).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash_tokens, rolling_fingerprints, simhash64


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """Duplicate-text groups: (keeper_id, dup_count) per distinct text.
    keeper = min doc_id. One hash-aggregate; map-side partial."""
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("keeper_id"),
        F.count("*").alias("dup_count"),
    ).select("keeper_id", "dup_count")


def exact_dedup_keep(docs: DataFrame) -> DataFrame:
    """The deduplicated id set (doc_id of one representative per text)."""
    return docs.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select("doc_id")


def tokens_df(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.split(F.trim(F.col("text")), "[ ]+").alias("toks")
    )


def shingles_df(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle).
    Built-in transform over the token array — JVM-side."""
    t = tokens_df(docs)
    shingle_arr = F.when(
        F.size("toks") >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(F.col("toks"), i + j + 1) for j in range(n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))  # short docs: no shingles,
    # matching the SQL oracle's empty generate_series
    return t.select("doc_id", F.explode(shingle_arr).alias("shingle"))


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, min_jaccard_pct: int = 50
) -> DataFrame:
    """Pairs (a, b, inter, uni) with a < b and
    ``100*inter >= min_jaccard_pct * uni`` over distinct word n-gram
    shingles. Integer-only outputs -> exact oracle comparison."""
    sh = shingles_df(docs, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    pairs = (
        sh.alias("x")
        .join(sh.alias("y"), F.col("x.shingle") == F.col("y.shingle"))
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b")
        )
        .agg(F.count("*").alias("inter"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "szb"), "b")
        .withColumn("uni", F.col("sza") + F.col("szb") - F.col("inter"))
        .filter(F.lit(100) * F.col("inter") >= F.lit(min_jaccard_pct) * F.col("uni"))
        .select("a", "b", "inter", "uni")
    )


def sql_ngram_jaccard_pairs(n: int = 3, min_jaccard_pct: int = 50, table="documents") -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '[ ]+') AS t FROM {table}
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(t) - {n - 1}),
                               i -> array_to_string(t[i:i+{n - 1}], ' '))) AS shingle
  FROM toks
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
), pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT a, b, inter, sa.sz + sb.sz - inter AS uni
FROM pairs JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
WHERE 100 * inter >= {min_jaccard_pct} * (sa.sz + sb.sz - inter)
"""


# ---- MinHash + LSH ----------------------------------------------------------

_MH_PRIME = (1 << 61) - 1


def _mh_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MH_PRIME, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MH_PRIME, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(docs: DataFrame, n: int = 3, num_perm: int = 64, seed: int = 42) -> DataFrame:
    """(doc_id, sig ARRAY<BIGINT>) — minhash over word-n-gram shingle
    hashes. Engine-neutral polynomial hashes; permutations are the
    classic (a*h+b) mod p family, seeded."""
    a, b = _mh_params(num_perm, seed)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            sigs = []
            for text in pdf["text"]:
                toks = np.asarray(text.strip().split(), dtype=object)
                if len(toks) >= n:
                    sh = np.asarray(
                        [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)],
                        dtype=object,
                    )
                else:
                    sh = np.asarray([" ".join(toks)], dtype=object)
                h = np.unique(hash_tokens(sh))
                # (a*h+b) mod p per permutation, take min
                vals = (a[None, :] * h[:, None] + b[None, :]) % np.uint64(_MH_PRIME)
                sig = vals.min(axis=0).astype(np.int64)
                sigs.append(sig)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sig": sigs})

    return docs.select("doc_id", "text").mapInPandas(gen, schema="doc_id bigint, sig array<bigint>")


def minhash_lsh_candidates(sigs: DataFrame, bands: int = 16) -> DataFrame:
    """Band the signature and equi-join on (band, bucket-hash):
    candidate pairs (a, b), a < b, deduplicated."""
    num_perm_col = F.size("sig")
    rows_per_band = (num_perm_col / bands).cast("int")
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bidx: F.slice(
                    "sig", bidx * rows_per_band + 1, rows_per_band
                ),
            )
        ).alias("band", "bucket"),
    )
    return (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame, n: int = 3, num_perm: int = 64, bands: int = 16,
    min_jaccard_pct: int = 50,
) -> DataFrame:
    """Full MinHash-LSH plan: signatures -> band buckets -> candidates
    -> exact shingle-Jaccard verification of candidates only."""
    sigs = minhash_signatures(docs, n, num_perm)
    cand = minhash_lsh_candidates(sigs, bands)
    sh = shingles_df(docs, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("a"), "shingle"), "a")
        .join(sh.select(F.col("doc_id").alias("b"), "shingle"), ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb")), "b")
        .withColumn("uni", F.col("sza") + F.col("szb") - F.col("inter"))
        .filter(F.lit(100) * F.col("inter") >= F.lit(min_jaccard_pct) * F.col("uni"))
        .select("a", "b", "inter", "uni")
    )


# ---- SimHash ----------------------------------------------------------------

def simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, sim BIGINT) — 64-bit simhash of token hashes (stored
    as signed int64 bit pattern)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            hs = [
                hash_tokens(np.asarray(t.strip().split(), dtype=object))
                for t in pdf["text"]
            ]
            sig = simhash64(hs).astype(np.int64)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sim": sig})

    return docs.select("doc_id", "text").mapInPandas(gen, schema="doc_id bigint, sim bigint")


def simhash_neardup_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Pairs with Hamming(sim_a, sim_b) <= max_hamming. Candidates via
    16-bit chunk banding (4 chunks; any pair within distance 3 shares
    at least one exact chunk by pigeonhole), verified exactly with
    bit_count — all JVM-side."""
    sigs = simhash_signatures(docs)
    chunks = sigs.select(
        "doc_id",
        "sim",
        F.posexplode(
            F.array(*[(F.shiftright("sim", 16 * i).bitwiseAND(F.lit(0xFFFF))) for i in range(4)])
        ).alias("chunk_idx", "chunk"),
    )
    cand = (
        chunks.alias("x")
        .join(
            chunks.alias("y"),
            (F.col("x.chunk_idx") == F.col("y.chunk_idx"))
            & (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("a"),
            F.col("y.doc_id").alias("b"),
            F.col("x.sim").alias("sa"),
            F.col("y.sim").alias("sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("ham", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("ham") <= max_hamming)
        .select("a", "b", "ham")
    )


# ---- embedding cosine near-dup ----------------------------------------------

def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def embedding_neardup_pairs(embs: DataFrame, min_cos: float) -> DataFrame:
    """Pairs (a, b), a < b, with cosine similarity >= min_cos. JVM-side
    zip_with/aggregate arithmetic (no Python). Exact quadratic plan —
    the scale path buckets by IVF cell first (similarity.py)."""
    v = embs.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    norm = v.withColumn("n", F.sqrt(_dot("v", "v")))
    x = norm.select(F.col("id").alias("a"), F.col("v").alias("va"), F.col("n").alias("na"))
    y = norm.select(F.col("id").alias("b"), F.col("v").alias("vb"), F.col("n").alias("nb"))
    return (
        x.join(y, F.col("a") < F.col("b"))
        .withColumn("cos", _dot("va", "vb") / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= min_cos)
        .select("a", "b")
    )


# ---- fingerprints ------------------------------------------------------------

def doc_fingerprints(docs: DataFrame, window: int = 4) -> DataFrame:
    """(doc_id, fp BIGINT) exploded winnowing fingerprints."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = []
            fps = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                h = hash_tokens(np.asarray(text.strip().split(), dtype=object))
                f = rolling_fingerprints(h, window).astype(np.int64)
                ids.extend([did] * len(f))
                fps.extend(f.tolist())
            yield pd.DataFrame({"doc_id": ids, "fp": fps})

    return docs.select("doc_id", "text").mapInPandas(gen, schema="doc_id bigint, fp bigint")
