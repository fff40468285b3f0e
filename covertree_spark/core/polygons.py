"""Point-in-polygon primitives (pure numpy) + deterministic fixtures.

The reference has no polygon support (SURVEY.md §2.9) — this is the
BASELINE-required extension. Exact even-odd ray-crossing test,
vectorized over (points x polygon edges); convex fixtures additionally
admit a half-plane SQL oracle (each edge a sign-of-cross-product
predicate), which is what oracle_sql() emits.
"""

from __future__ import annotations

import numpy as np


def point_in_polygon(px: np.ndarray, py: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Even-odd ray crossing. ``poly``: (m, 2) float64 vertex ring
    (closed implicitly). Returns boolean (n,). Points exactly on an
    edge may land either way — fixtures avoid measure-zero placements.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    x1, y1 = poly[:, 0], poly[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    # edge straddles the horizontal ray at py
    straddle = (y1[None, :] > py[:, None]) != (y2[None, :] > py[:, None])
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1[None, :] + (py[:, None] - y1[None, :]) / (y2 - y1)[None, :] * (x2 - x1)[None, :]
    crossings = (straddle & (px[:, None] < xint)).sum(axis=1)
    return (crossings % 2) == 1


def point_in_convex(px: np.ndarray, py: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Half-plane conjunction for a CCW convex polygon (boundary
    inclusive) — the exact arithmetic the SQL oracle reproduces."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    x1, y1 = poly[:, 0], poly[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    cross = (x2 - x1)[None, :] * (py[:, None] - y1[None, :]) - (y2 - y1)[None, :] * (
        px[:, None] - x1[None, :]
    )
    return np.all(cross >= 0.0, axis=1)


def _dlit(v: float) -> str:
    """Vertex literal as explicit DOUBLE: Spark and DuckDB both parse a
    bare decimal literal as DECIMAL, and decimal-exact subtraction need
    not equal the numpy kernel's float64 op in the last ulp (round-4
    ADVICE). repr() emits the shortest round-tripping digits, so the
    nearest double to the decimal IS the original float — the CAST
    recovers bit-identical float64 arithmetic in both engines."""
    return f"CAST({float(v)!r} AS DOUBLE)"


def sql_convex_predicate(lon_expr: str, lat_expr: str, poly: np.ndarray) -> str:
    """SQL predicate equivalent to point_in_convex (same op order)."""
    terms = []
    m = len(poly)
    for i in range(m):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % m]
        terms.append(
            f"(({_dlit(x2)} - {_dlit(x1)}) * (({lat_expr}) - {_dlit(y1)}) - "
            f"({_dlit(y2)} - {_dlit(y1)}) * (({lon_expr}) - {_dlit(x1)})) "
            ">= CAST(0 AS DOUBLE)"
        )
    return "(" + " AND ".join(terms) + ")"


def sql_concave_predicate(lon_expr: str, lat_expr: str, poly: np.ndarray) -> str:
    """SQL predicate equivalent to ``point_in_polygon`` (even-odd ray
    crossing), SAME OP ORDER as the numpy kernel so both engines make
    bit-identical decisions on float64: per edge,
    ``xint = x1 + (lat - y1) / (y2 - y1) * (x2 - x1)`` and a crossing
    counts when the edge straddles the ray AND lon < xint. The
    division is guarded by a nested CASE (evaluated only when the edge
    straddles, which implies y1 != y2 — numpy masks the same lanes).
    Vertex literals are explicit DOUBLE (_dlit) so both engines run the
    numpy kernel's float64 ops, not decimal arithmetic."""
    terms = []
    m = len(poly)
    for i in range(m):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % m]
        straddle = (
            f"(({_dlit(y1)} > ({lat_expr})) <> ({_dlit(y2)} > ({lat_expr})))"
        )
        xint = (
            f"{_dlit(x1)} + (({lat_expr}) - {_dlit(y1)}) / "
            f"({_dlit(y2)} - {_dlit(y1)}) * ({_dlit(x2)} - {_dlit(x1)})"
        )
        terms.append(
            f"(CASE WHEN {straddle} THEN "
            f"(CASE WHEN ({lon_expr}) < {xint} THEN 1 ELSE 0 END) "
            "ELSE 0 END)"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"


def concave_fixture_polygons(count: int = 4, seed: int = 7) -> list[np.ndarray]:
    """Deterministic CONCAVE (star-shaped simple) polygons: vertices at
    sorted angles with alternating inner/outer radii — every polygon is
    simple by construction and genuinely concave (inner vertices make
    reflex angles). Literal float64 vertices embedded verbatim into
    both engines, like the convex fixtures."""
    rng = np.random.default_rng(seed)
    polys = []
    for _ in range(count):
        cx = rng.uniform(-150, 150)
        cy = rng.uniform(-70, 70)
        nspike = int(rng.integers(4, 7))
        angles = np.sort(rng.uniform(0, 2 * np.pi, 2 * nspike))
        radii = np.where(
            np.arange(2 * nspike) % 2 == 0,
            rng.uniform(18.0, 30.0, 2 * nspike),
            rng.uniform(5.0, 10.0, 2 * nspike),
        )
        xs = cx + radii * np.cos(angles)
        ys = cy + radii * np.sin(angles)
        polys.append(np.stack([xs, ys], axis=1).astype(np.float64))
    return polys


def convex_fixture_polygons(count: int = 8, seed: int = 42) -> list[np.ndarray]:
    """Deterministic CCW convex polygons scattered in lon/lat space.

    Literal float64 vertices (seeded RNG on the driver only) — they are
    embedded verbatim into both the Spark plan and the SQL oracle, so
    determinism across parallelism is trivial.
    """
    rng = np.random.default_rng(seed)
    polys = []
    for i in range(count):
        cx = rng.uniform(-150, 150)
        cy = rng.uniform(-70, 70)
        nv = int(rng.integers(5, 10))
        angles = np.sort(rng.uniform(0, 2 * np.pi, nv))
        radii = rng.uniform(8.0, 28.0, nv)
        xs = cx + radii * np.cos(angles)
        ys = cy + radii * np.sin(angles)
        hull = _convex_hull(np.stack([xs, ys], axis=1))
        polys.append(hull)
    return polys


def _convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; returns CCW hull without repeated last
    vertex."""
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(points):
        out: list[np.ndarray] = []
        for p in points:
            while len(out) >= 2:
                o, a = out[-2], out[-1]
                if (a[0] - o[0]) * (p[1] - o[1]) - (a[1] - o[1]) * (p[0] - o[0]) <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1], dtype=np.float64)


def segments_properly_cross(pa: np.ndarray, pb: np.ndarray) -> bool:
    """True iff any edge of ring ``pa`` PROPERLY crosses any edge of
    ring ``pb`` (each segment's endpoints strictly on opposite sides
    of the other's supporting line: d1*d2 < 0 AND d3*d4 < 0).
    Vectorized over all edge pairs; float64 products — the SQL twin
    (``sql_poly_overlap_query``) evaluates the identical expression
    shapes, so both engines make bit-identical decisions even on
    degenerate inputs."""
    ax1, ay1 = pa[:, 0], pa[:, 1]
    ax2, ay2 = np.roll(ax1, -1), np.roll(ay1, -1)
    bx1, by1 = pb[:, 0], pb[:, 1]
    bx2, by2 = np.roll(bx1, -1), np.roll(by1, -1)
    # orient(p, q, r) = (qx-px)*(ry-py) - (qy-py)*(rx-px), (na, nb)
    d1 = (ax2 - ax1)[:, None] * (by1[None, :] - ay1[:, None]) - (
        ay2 - ay1
    )[:, None] * (bx1[None, :] - ax1[:, None])
    d2 = (ax2 - ax1)[:, None] * (by2[None, :] - ay1[:, None]) - (
        ay2 - ay1
    )[:, None] * (bx2[None, :] - ax1[:, None])
    d3 = (bx2 - bx1)[None, :] * (ay1[:, None] - by1[None, :]) - (
        by2 - by1
    )[None, :] * (ax1[:, None] - bx1[None, :])
    d4 = (bx2 - bx1)[None, :] * (ay2[:, None] - by1[None, :]) - (
        by2 - by1
    )[None, :] * (ax2[:, None] - bx1[None, :])
    return bool(((d1 * d2 < 0) & (d3 * d4 < 0)).any())


def poly_pair_intersects(pa: np.ndarray, pb: np.ndarray) -> bool:
    """Polygon-polygon intersection predicate (simple rings, planar):
    a vertex of one ring lies (even-odd) inside the other, OR some
    edge pair properly crosses. Covers partial overlap, containment,
    and the cross-shape (no vertex inside either). Touching-only
    contact (shared boundary point, zero-area intersection) lands on
    whichever side the even-odd arithmetic puts it — measure-zero,
    and decided by the IDENTICAL expressions in both engines, so the
    pair set is well-defined and oracle-stable either way."""
    if bool(point_in_polygon(pa[:, 0], pa[:, 1], pb).any()):
        return True
    if bool(point_in_polygon(pb[:, 0], pb[:, 1], pa).any()):
        return True
    return segments_properly_cross(pa, pb)


def poly_pairs_intersect_batch(PA: np.ndarray, PB: np.ndarray) -> np.ndarray:
    """Batched ``poly_pair_intersects`` over fixed-arity ring stacks:
    PA (n, ma, 2) vs PB (n, mb, 2), pairwise along axis 0 -> bool (n,).
    SAME float64 expression shapes as the scalar kernels (vectorization
    reorders nothing), so decisions are bit-identical — this is the
    per-Arrow-batch fast path: one kernel call per (ma, mb) group
    instead of a Python iteration per candidate pair. A closed-bbox
    reject runs first (a pure candidate superset: an odd-crossings
    vertex lies inside the other ring's bbox by the Jordan argument,
    and a proper crossing needs overlapping closed bboxes)."""
    n = PA.shape[0]
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    ax, ay = PA[:, :, 0], PA[:, :, 1]
    bx, by = PB[:, :, 0], PB[:, :, 1]
    live = ~(
        (ax.max(axis=1) < bx.min(axis=1))
        | (bx.max(axis=1) < ax.min(axis=1))
        | (ay.max(axis=1) < by.min(axis=1))
        | (by.max(axis=1) < ay.min(axis=1))
    )
    if not live.any():
        return out
    ax, ay, bx, by = ax[live], ay[live], bx[live], by[live]

    def _vin(px, py, x1, y1, x2, y2):
        # (g, mp, mq): vertex j of the probe vs edge k of the ring
        pxe = px[:, :, None]
        pye = py[:, :, None]
        e_x1, e_y1 = x1[:, None, :], y1[:, None, :]
        e_x2, e_y2 = x2[:, None, :], y2[:, None, :]
        straddle = (e_y1 > pye) != (e_y2 > pye)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = e_x1 + (pye - e_y1) / (e_y2 - e_y1) * (e_x2 - e_x1)
        crossings = (straddle & (pxe < xint)).sum(axis=2)
        return ((crossings % 2) == 1).any(axis=1)

    ax2, ay2 = np.roll(ax, -1, axis=1), np.roll(ay, -1, axis=1)
    bx2, by2 = np.roll(bx, -1, axis=1), np.roll(by, -1, axis=1)
    hit = _vin(ax, ay, bx, by, bx2, by2) | _vin(bx, by, ax, ay, ax2, ay2)
    todo = ~hit
    if todo.any():
        a1x, a1y = ax[todo][:, :, None], ay[todo][:, :, None]
        a2x, a2y = ax2[todo][:, :, None], ay2[todo][:, :, None]
        b1x, b1y = bx[todo][:, None, :], by[todo][:, None, :]
        b2x, b2y = bx2[todo][:, None, :], by2[todo][:, None, :]
        d1 = (a2x - a1x) * (b1y - a1y) - (a2y - a1y) * (b1x - a1x)
        d2 = (a2x - a1x) * (b2y - a1y) - (a2y - a1y) * (b2x - a1x)
        d3 = (b2x - b1x) * (a1y - b1y) - (b2y - b1y) * (a1x - b1x)
        d4 = (b2x - b1x) * (a2y - b1y) - (b2y - b1y) * (a2x - b1x)
        hit[todo] = ((d1 * d2 < 0) & (d3 * d4 < 0)).any(axis=(1, 2))
    out[live] = hit
    return out
