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


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    cols = [
        _marker_count_col(t, LANG_MARKERS[lang]).alias(f"score_{lang}")
        for lang in _LANGS
    ]
    return df.select("doc_id", *cols)


def sql_lang_scores(table: str = "documents") -> str:
    parts = []
    for lang in _LANGS:
        terms = " + ".join(
            f"(length(regexp_split_to_array(' ' || text || ' ', ' {w} ')) - 1)"
            for w in LANG_MARKERS[lang]
        )
        parts.append(f"({terms}) AS score_{lang}")
    return f"SELECT doc_id, {', '.join(parts)} FROM {table}"


# ---- deterministic token / shingle hashing (numpy, engine-neutral) ---------

_HASH_MOD = (1 << 61) - 1  # Mersenne prime
_HASH_BASE = 257


def hash_tokens(tokens: np.ndarray) -> np.ndarray:
    """Vectorized polynomial rolling hash of a string array -> uint64.

    h(s) = sum(byte_i * BASE^(n-1-i)) mod (2^61-1). Pure integer math,
    identical on any platform; used for shingles, minhash and simhash
    so results never depend on Spark/DuckDB hash internals."""
    out = np.zeros(len(tokens), dtype=np.uint64)
    mod = np.uint64(_HASH_MOD)
    base = np.uint64(_HASH_BASE)
    # group by length for vectorization
    lens = np.char.str_len(tokens.astype(str))
    arr = tokens.astype(str)
    for L in np.unique(lens):
        idx = np.nonzero(lens == L)[0]
        if L == 0:
            continue
        sub = arr[idx]
        # bytes matrix (n, L) — via uint32 codepoints (ASCII data; for
        # non-ASCII the codepoint itself feeds the hash, still stable)
        codes = np.array([[ord(c) for c in s] for s in sub], dtype=np.uint64)
        h = np.zeros(len(idx), dtype=np.uint64)
        for j in range(int(L)):
            h = (h * base + codes[:, j]) % mod
        out[idx] = h
    return out


def simhash64(token_hashes: list[np.ndarray]) -> np.ndarray:
    """64-bit simhash per document from its token-hash array."""
    out = np.zeros(len(token_hashes), dtype=np.uint64)
    for i, hs in enumerate(token_hashes):
        if len(hs) == 0:
            continue
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        sig = np.uint64(0)
        for b in range(64):
            if votes[b] > 0:
                sig |= np.uint64(1) << np.uint64(b)
        out[i] = sig
    return out


def rolling_fingerprints(token_hashes: np.ndarray, window: int = 4) -> np.ndarray:
    """Winnowing-style document fingerprint: min shingle-hash per
    sliding window of ``window`` token hashes, deduplicated."""
    if len(token_hashes) < window:
        return np.unique(token_hashes)
    sw = np.lib.stride_tricks.sliding_window_view(token_hashes, window)
    return np.unique(sw.min(axis=1))
