"""Geohash codec (public-domain Niemeyer scheme): base-32 string cell
ids with the prefix-containment property — an ALTERNATIVE global
partitioner to the quad codec in core/cells.py (same role as the
reference's rank decomposition; SURVEY §2.9 H3/S2 row). A geohash
prefix of length p is the ancestor cell, so prefix equality gives
hierarchical co-location joins for free on a string key.

Engine portability: the encoder is rendered as ONE SQL fragment used
verbatim by both Spark and DuckDB. No bit operators (shift/and differ
across dialects) — bits are extracted with floor-division by powers of
two, which is EXACT in double arithmetic for all inputs here (values
< 2^40 are representable; dividing by 2^k only changes the exponent),
so both engines compute identical characters.
"""

from __future__ import annotations

import numpy as np

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lon: np.ndarray, lat: np.ndarray, nchars: int = 8) -> list[str]:
    """Vectorized reference encoder (tests / numpy kernels). Even
    ``nchars`` keeps lon/lat bit counts equal (standard geohash
    interleaves lon first)."""
    assert nchars % 2 == 0, "odd lengths split bits unevenly; use even"
    nbits = 5 * nchars // 2
    n = 1 << nbits
    xb = np.clip(np.floor((np.asarray(lon) + 180.0) / 360.0 * n), 0, n - 1).astype(
        np.int64
    )
    yb = np.clip(np.floor((np.asarray(lat) + 90.0) / 180.0 * n), 0, n - 1).astype(
        np.int64
    )
    out = []
    for x, y in zip(xb, yb):
        chars = []
        for k in range(nchars):
            v = 0
            for t in range(5):
                j = 5 * k + t  # global bit index, 0 = MSB, even = lon
                if j % 2 == 0:
                    bit = (x >> (nbits - 1 - j // 2)) & 1
                else:
                    bit = (y >> (nbits - 1 - (j - 1) // 2)) & 1
                v = (v << 1) | int(bit)
            chars.append(ALPHABET[v])
        out.append("".join(chars))
    return out


def sql_geohash_expr(lon_expr: str, lat_expr: str, nchars: int = 8) -> str:
    """The shared SQL fragment: same clamp, same bit extraction (pure
    floor-division arithmetic), same alphabet lookup, in either
    engine."""
    assert nchars % 2 == 0
    nbits = 5 * nchars // 2
    n = 1 << nbits
    xb = (
        f"least(greatest(CAST(floor((({lon_expr}) + 180.0) / 360.0 * {n}) "
        f"AS BIGINT), 0), {n - 1})"
    )
    yb = (
        f"least(greatest(CAST(floor((({lat_expr}) + 90.0) / 180.0 * {n}) "
        f"AS BIGINT), 0), {n - 1})"
    )

    def bit(src: str, p: int) -> str:
        # (src DIV 2^p) % 2 without dialect-specific operators
        if p == 0:
            return f"(({src}) % 2)"
        return f"(CAST(floor(({src}) / {1 << p}.0) AS BIGINT) % 2)"

    chars = []
    for k in range(nchars):
        terms = []
        for t in range(5):
            j = 5 * k + t
            if j % 2 == 0:
                b = bit("_xb", nbits - 1 - j // 2)
            else:
                b = bit("_yb", nbits - 1 - (j - 1) // 2)
            terms.append(f"{b} * {1 << (4 - t)}")
        val = " + ".join(terms)
        chars.append(f"substring('{ALPHABET}', CAST({val} AS INT) + 1, 1)")
    concat = "concat(" + ", ".join(chars) + ")"
    # inline _xb/_yb (no CTE: the fragment must drop into any SELECT)
    return concat.replace("_xb", xb).replace("_yb", yb)
