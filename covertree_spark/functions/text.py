"""Text analysis for large-scale training-data pipelines: token
counting, quality scoring, language ID, fingerprinting.

Each op has (a) a Spark implementation using built-in JVM functions
(whole-stage codegen, no Python in the hot path) and (b) a DuckDB SQL
rendering with identical semantics for the oracle gate. Hash-based ops
(fingerprints, shingle hashes) use a polynomial rolling hash over
UTF-8 bytes implemented in vectorized numpy — deterministic and
engine-independent (NOT Spark's murmur3 or DuckDB's hash(), which
differ from each other).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---- token counting --------------------------------------------------------

TOKEN_SPLIT_RE = "[ ]+"  # documents.text is single-space separated; keep the
# split regex trivial so Spark (Java regex) and DuckDB (RE2) agree.


def token_count_col(text: Column) -> Column:
    return F.size(F.split(F.trim(text), TOKEN_SPLIT_RE))


def sql_token_count(text_expr: str) -> str:
    return f"length(regexp_split_to_array(trim({text_expr}), '{TOKEN_SPLIT_RE}'))"


# ---- quality scoring -------------------------------------------------------
# Integer-valued component metrics (exact across engines); a composite
# float score would be engine-sensitive, so the oracle-checked surface
# is the components.


def quality_components(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return df.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        token_count_col(t).alias("n_tokens"),
        F.length(F.regexp_replace(t, "[^a-z]", "")).alias("n_alpha"),
        F.length(F.regexp_replace(t, "[^ ]", "")).alias("n_spaces"),
    )


def sql_quality_components(table: str = "documents") -> str:
    return f"""
SELECT doc_id,
       length(text) AS n_chars,
       {sql_token_count('text')} AS n_tokens,
       length(regexp_replace(text, '[^a-z]', '', 'g')) AS n_alpha,
       length(regexp_replace(text, '[^ ]', '', 'g')) AS n_spaces
FROM {table}
"""


# ---- language ID (stopword-hit heuristic) ----------------------------------

LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "los", "que", "es", "una"],
    "zh": ["de", "shi", "le", "zai", "he"],
}
_LANGS = sorted(LANG_MARKERS)


def _marker_count_col(text: Column, words: list[str]) -> Column:
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    c = F.lit(0)
    for w in words:
        # occurrences of " w " : (len - len(replace))/len(" w ")... use
        # size(split)-1 which both engines express identically
        c = c + F.size(F.split(padded, f" {w} ", -1)) - F.lit(1)
    return c


def lang_scores(
    df: DataFrame, text_col: str = "text", carry: tuple = ()
) -> DataFrame:
    """``carry``: extra input columns passed through beside the
    scores, so consumers needing e.g. the label column avoid a
    doc_id self-join back onto the table the scores came from."""
    t = F.col(text_col)
    cols = [
        _marker_count_col(t, LANG_MARKERS[lang]).alias(f"score_{lang}")
        for lang in _LANGS
    ]
    return df.select("doc_id", *carry, *cols)


def sql_lang_scores(table: str = "documents") -> str:
    parts = []
    for lang in _LANGS:
        terms = " + ".join(
            f"(length(regexp_split_to_array(' ' || text || ' ', ' {w} ')) - 1)"
            for w in LANG_MARKERS[lang]
        )
        parts.append(f"({terms}) AS score_{lang}")
    return f"SELECT doc_id, {', '.join(parts)} FROM {table}"


# ---- html -> text extraction (input_hint invariant surface) ----------------

HTML_TAG_RE = "<[^>]*>"


def extract_text_col(html: Column) -> Column:
    """``html:binary`` -> extracted text, entirely JVM-side (UTF-8
    decode + regexp tag-strip, inside whole-stage codegen — no Python
    anywhere on the path, so it runs at scan throughput over a 10^12-row
    Iceberg table).

    The BASELINE input_hint pins *byte-identical extracted text per
    url* as the per-row invariant. For wrapper-style markup — tags
    carrying no inter-tag text of their own, the synthetic pages format
    (sources/pages.py:58) — extraction reproduces the ``text`` column
    byte-for-byte: oracle-gated by the ``extract_text`` catalog entry
    and asserted against ``generate_pages`` in tests."""
    return F.regexp_replace(F.decode(html, "UTF-8"), HTML_TAG_RE, "")


# ---- repetition metrics (Gopher-style quality signals) ---------------------
# Training-data pipelines gate documents on REPETITION: type/token
# ratio and the share of the most common n-gram (Rae et al. 2021,
# "Scaling Language Models", table A1 — public). All components are
# INTEGER-exact across engines (the oracle playbook: never emit a
# float ratio; downstream predicates use integer cross-multiplication).


def repetition_components(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens, n_bigrams,
    n_distinct_bigrams, top_bigram_count) — all bigint, all computed
    INSIDE one row (no explode/shuffle: the per-document arrays never
    leave the scan task, so the op runs at scan throughput at any
    corpus size; contrast explode->groupBy(doc, bigram), which
    shuffles one row per TOKEN).

    ``top_bigram_count`` (the max multiplicity of any word bigram) is
    a sort + one fold over the sorted array — O(m log m) per doc,
    whole-stage-codegen'd, no Python. Equal-length slice pair keeps
    zip_with away from null padding."""
    w = F.split(F.trim(F.col(text_col)), TOKEN_SPLIT_RE)
    n = F.size(w)
    bg = F.zip_with(
        F.slice(w, F.lit(1), n - F.lit(1)),
        F.slice(w, F.lit(2), n - F.lit(1)),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    sorted_bg = F.sort_array(bg)
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top = F.aggregate(sorted_bg, zero, step, lambda acc: acc["best"])
    return df.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(w)).cast("bigint").alias("n_distinct_tokens"),
        F.size(bg).cast("bigint").alias("n_bigrams"),
        F.size(F.array_distinct(bg)).cast("bigint").alias("n_distinct_bigrams"),
        top.cast("bigint").alias("top_bigram_count"),
    )


def sql_repetition_components(table: str = "documents") -> str:
    # the oracle recomputes top_bigram_count the O(distinct x m) naive
    # way — different algorithm, same integers (stronger evidence than
    # mirroring the fold)
    return f"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '{TOKEN_SPLIT_RE}') AS ws
  FROM {table}
), base AS (
  SELECT doc_id, ws,
         list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1]) AS bg
  FROM w
)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_tokens,
       CAST(len(bg) AS BIGINT) AS n_bigrams,
       CAST(len(list_distinct(bg)) AS BIGINT) AS n_distinct_bigrams,
       CAST(coalesce(list_max(list_transform(list_distinct(bg),
            g -> len(list_filter(bg, x -> x = g)))), 0) AS BIGINT)
         AS top_bigram_count
FROM base
"""


# ---- deterministic content-keyed dataset split ------------------------------
# Train/val/test assignment must be (a) reproducible across runs and
# engines, (b) keyed on CONTENT, not row id — exact duplicates (and
# anything sharing their text) must land in the SAME split, or dedup
# order silently leaks eval text into train. Bucket = first 32 bits of
# sha256(text) mod 100 — both engines compute the identical integer
# (Spark conv(hex,16,10) / DuckDB CAST('0x'||hex AS BIGINT)).


def split_bucket_col(text: Column) -> Column:
    return (
        F.conv(F.substring(F.sha2(text, 256), 1, 8), 16, 10).cast("bigint")
        % 100
    )


def split_col(text: Column, train_pct: int = 80, val_pct: int = 10) -> Column:
    b = split_bucket_col(text)
    return (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def sql_split_bucket(text_expr: str) -> str:
    return f"(CAST('0x' || substr(sha256({text_expr}), 1, 8) AS BIGINT) % 100)"


def sql_split(text_expr: str, train_pct: int = 80, val_pct: int = 10) -> str:
    b = sql_split_bucket(text_expr)
    return (
        f"(CASE WHEN {b} < {train_pct} THEN 'train' "
        f"WHEN {b} < {train_pct + val_pct} THEN 'val' "
        f"ELSE 'test' END)"
    )


# ---- deterministic token / shingle hashing (numpy, engine-neutral) ---------

_HASH_BASE = 257
_MH_PRIME31 = (1 << 31) - 1  # Mersenne prime: minhash-domain reduction


def mod_mersenne31(x: np.ndarray) -> np.ndarray:
    """x mod (2^31 - 1) for uint64 x, via Mersenne folding (2^31 = 1
    mod p): shift/AND/add only — numpy's 64-bit integer ``%`` has no
    SIMD path and is ~30x slower on large arrays."""
    p = np.uint64(_MH_PRIME31)
    m = np.uint64(_MH_PRIME31)
    y = (x & m) + ((x >> np.uint64(31)) & m) + (x >> np.uint64(62))
    y = (y & m) + (y >> np.uint64(31))
    return np.where(y >= p, y - p, y)


def mod_mersenne61(x: np.ndarray) -> np.ndarray:
    """x mod (2^61 - 1) for x < 2^63 (one fold + conditional subtract)."""
    p = np.uint64((1 << 61) - 1)
    y = (x & p) + (x >> np.uint64(61))
    return np.where(y >= p, y - p, y)


def hash_tokens(tokens: np.ndarray) -> np.ndarray:
    """Vectorized polynomial hash of a string array -> uint64.

    h(s) = Horner(codepoint_i, base=257) in uint64 arithmetic (wraps
    mod 2^64 — deterministic, platform-independent; NOT a mod-p
    family, see minhash for the honest universal reduction). Zero
    per-row Python in the hot loop: strings go through fixed-width
    UCS4 numpy views, Horner runs column-wise.

    Tokens are bucketed into POWER-OF-TWO LENGTH BANDS before the
    fixed-width view: a batch's matrix used to be n_tokens x Lmax, so
    ONE pathological long token (URL/base64 junk, routine in web
    corpora) inflated memory and time for the whole batch by orders of
    magnitude (round-2 ADVICE); per-band, each token pays at most 2x
    its own length. Padding is masked BY POSITION (j < len(token)),
    not by NUL value, so tokens containing embedded NUL codepoints
    hash distinctly ('a\\x00b' != 'ab' — the value-mask collided
    them)."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    toks = np.asarray(tokens, dtype=object)
    lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=n)
    h = np.zeros(n, dtype=np.uint64)
    nz = np.flatnonzero(lens > 0)
    if not len(nz):
        return h
    base = np.uint64(_HASH_BASE)
    # band = ceil(log2(len)): tokens of length (2^(b-1), 2^b]
    band = np.zeros(n, dtype=np.int64)
    band[nz] = np.ceil(np.log2(lens[nz])).astype(np.int64)
    for b in np.unique(band[nz]):
        idx = np.flatnonzero((band == b) & (lens > 0))
        sub = np.asarray(toks[idx], dtype=str)  # UCS4, width = band max
        L = sub.dtype.itemsize // 4
        codes = (
            np.ascontiguousarray(sub).view(np.uint32).reshape(len(idx), L)
        ).astype(np.uint64)
        sl = lens[idx]
        hb = np.zeros(len(idx), dtype=np.uint64)
        for j in range(L):
            live = j < sl  # POSITION mask: embedded NULs participate
            hb[live] = hb[live] * base + codes[live, j]
        h[idx] = hb
    return h


def shingle_hashes_flat(texts, n: int = 3):
    """Vectorized word-n-gram shingle hashes for a BATCH of documents.

    Returns (doc_offsets, shingle_hash) where ``shingle_hash`` is one
    flat uint64 array and ``doc_offsets[i]:doc_offsets[i+1]`` slices
    document i's shingles. Shingle hash = Horner combine of the n
    token hashes (base 2^31-ish odd constant, wraps mod 2^64) — no
    shingle STRINGS are ever built, so the whole batch is a handful
    of vector ops over one flat token array.

    Convention: documents with fewer than ``n`` tokens yield ZERO
    shingles — identical to the JVM ``shingles_df`` path, so LSH and
    exact-Jaccard agree on which docs participate (ADVICE round 1)."""
    toks_per_doc = [t.strip().split() for t in texts]  # C-level split
    lens = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64,
                       count=len(toks_per_doc))
    if int(lens.sum()) == 0:
        return np.zeros(len(texts) + 1, dtype=np.int64), np.empty(0, np.uint64)
    flat = np.concatenate([np.asarray(t, dtype=object) for t in toks_per_doc if t])
    th = hash_tokens(flat)
    # sliding n-window combine over the flat token-hash array
    T = len(th)
    n_sh_per_doc = np.maximum(lens - (n - 1), 0)
    if T >= n:
        comb = th[: T - n + 1].copy()
        mult = np.uint64(0x9E3779B1)  # odd -> bijective mixing in 2^64
        for j in range(1, n):
            comb = comb * mult + th[j : T - n + 1 + j]
    else:
        comb = np.empty(0, dtype=np.uint64)
    # keep only windows fully inside one document
    tok_starts = np.concatenate([[0], np.cumsum(lens)])
    valid_idx = [
        np.arange(tok_starts[i], tok_starts[i] + n_sh_per_doc[i])
        for i in range(len(lens))
        if n_sh_per_doc[i] > 0
    ]
    doc_offsets = np.concatenate([[0], np.cumsum(n_sh_per_doc)]).astype(np.int64)
    if valid_idx:
        sh = comb[np.concatenate(valid_idx)]
    else:
        sh = np.empty(0, dtype=np.uint64)
    return doc_offsets, sh


# (simhash voting and winnowing fingerprints live vectorized-per-batch
# in operators/dedup.py — the per-document helpers that used to sit
# here were the round-1 per-row-Python hot path.)
