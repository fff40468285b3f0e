"""Cover-tree invariant checks — the unit-test surface.

Mirrors the reference's structural guarantees (SURVEY.md §2.2 C2;
/root/reference/src/cover_tree.cpp:38-96): covering, separation,
nesting, leaf rule, CSR well-formedness, and exactly-once leaf
coverage. Pure numpy; used by tests and by debug assertions.
"""

from __future__ import annotations

import numpy as np

from .covertree import LEAF_EPS, CoverTree, dists_to


def csr_well_formed(tree: CoverTree) -> None:
    m = tree.num_vertices
    assert tree.childptrs.shape == (m + 1,)
    assert tree.childptrs[0] == 0
    assert tree.childptrs[-1] == len(tree.childarr)
    assert np.all(np.diff(tree.childptrs) >= 0), "childptrs not monotone"
    if m > 1:
        assert len(tree.childarr) == m - 1, "every non-root vertex is a child exactly once"
        assert np.array_equal(np.sort(tree.childarr), np.arange(1, m))
    # preorder contiguity: children of v have consecutive ids
    for v in range(m):
        ch = tree.children(v)
        if ch.size:
            assert np.all(np.diff(np.sort(ch)) >= 1)


def leaves_cover_points_exactly_once(tree: CoverTree, n: int) -> None:
    """Every input point appears exactly once as a leaf vertex."""
    leaf_mask = tree.is_leaf_mask()
    leaf_centers = tree.centers[leaf_mask]
    assert len(leaf_centers) == n, f"{len(leaf_centers)} leaves != {n} points"
    assert np.array_equal(np.sort(leaf_centers), np.arange(n))


def radii_bound_descendants(tree: CoverTree, points: np.ndarray) -> None:
    """Every descendant leaf point is within ``radii[v]`` of v's center
    (the covering property the radius-query prune depends on)."""
    P = np.asarray(points, dtype=np.float64)
    m = tree.num_vertices
    # collect descendant leaves per vertex via reverse preorder
    desc: list[list[int]] = [[] for _ in range(m)]
    for v in range(m - 1, -1, -1):
        ch = tree.children(v)
        if ch.size == 0:
            desc[v] = [int(tree.centers[v])]
        else:
            acc: list[int] = []
            for c in ch:
                acc.extend(desc[c])
            desc[v] = acc
    for v in range(m):
        d = dists_to(P[np.asarray(desc[v])], P[tree.centers[v]])
        assert np.all(d <= tree.radii[v] + 1e-9), (
            f"vertex {v}: descendant at {d.max()} > radius {tree.radii[v]}"
        )


def nesting(tree: CoverTree) -> None:
    """Parent's center reappears as the center of one of its children
    (for internal vertices whose children are not pure leaf fanout)."""
    m = tree.num_vertices
    for v in range(m):
        ch = tree.children(v)
        if ch.size == 0:
            continue
        assert tree.centers[v] in tree.centers[ch], (
            f"vertex {v}: center {tree.centers[v]} not among child centers"
        )


def separation_and_covering(
    points: np.ndarray, cover: float, leaf_size: int
) -> None:
    """Re-run the hub-splitting recursion structurally, asserting the
    Gonzalez loop's guarantees at every hub: (a) each added site was
    farther than the level target from all previously-added sites of
    that hub (separation); (b) on exit every hub point is within target
    of its assigned site (covering).

    The LEAF RULE (``size <= leaf_size or radius <= eps`` stops
    refinement) is verified behaviorally here too — the recursion
    below applies the same stopping condition the builder does, so a
    builder that refined past (or stopped before) the rule would
    diverge from this traversal. A purely structural check on the
    finished CSR is impossible: a vertex whose child hubs all became
    singleton leaf hubs is shape-identical to a leaf-hub fanout (the
    reference produces the same shape)."""
    from .covertree import _Hub  # reuse the builder's traversal shape
    from collections import deque

    P = np.asarray(points, dtype=np.float64)
    n = P.shape[0]
    root_d = dists_to(P, P[0])
    maxdist = float(root_d.max())
    if n == 1 or maxdist <= LEAF_EPS:
        return
    hubs = deque(
        [
            _Hub(
                vertex=0,
                level=0,
                ids=np.arange(n, dtype=np.int64),
                dists=root_d,
                cells=np.zeros(n, dtype=np.int64),
                candidate=int(root_d.argmax()),
                site=0,
            )
        ]
    )
    while hubs:
        h = hubs.popleft()
        target = (cover ** (-(h.level) - 1.0)) * maxdist
        ids, dists, cells = h.ids, h.dists.copy(), h.cells.copy()
        sites = [h.site]
        cand = h.candidate
        first_iter = True
        while True:
            new_site = cand
            if new_site not in sites:
                # separation: a site added *because* the previous sep
                # exceeded target is farther than target from all
                # existing sites. (The do-while's very first addition is
                # unconditional in the reference, so it is exempt.)
                if not first_iter:
                    d_to_sites = dists_to(P[np.asarray(sites)], P[new_site])
                    assert np.all(d_to_sites > target), (
                        f"separation violated at level {h.level}"
                    )
                sites.append(new_site)
                d = dists_to(P[ids], P[new_site])
                closer = d < dists
                dists = np.where(closer, d, dists)
                cells = np.where(closer, new_site, cells)
            first_iter = False
            sep_i = int(dists.argmax())
            sep = dists[sep_i]
            cand = int(ids[sep_i])
            if sep <= target:
                break
        assert np.all(dists <= target), "covering violated"
        for site in sites:
            mask = cells == site
            cids = ids[mask]
            cdists = dists[mask]
            if cids.size == 0:
                continue
            rel = int(cdists.argmax())
            radius = float(cdists[rel])
            if cids.size > leaf_size and radius > LEAF_EPS:
                hubs.append(
                    _Hub(
                        vertex=0,
                        level=h.level + 1,
                        ids=cids,
                        dists=cdists,
                        cells=np.full(cids.size, site, dtype=np.int64),
                        candidate=int(cids[rel]),
                        site=site,
                    )
                )


def check_all(tree: CoverTree, points: np.ndarray, cover: float, leaf_size: int) -> None:
    csr_well_formed(tree)
    leaves_cover_points_exactly_once(tree, len(points))
    radii_bound_descendants(tree, points)
    nesting(tree)
    separation_and_covering(points, cover, leaf_size)
