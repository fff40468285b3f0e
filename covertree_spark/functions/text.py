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
