"""Neighbor table vs brute force (SURVEY.md section 4, 'Unit: neighbor
index' row), children-index consistency, moral-graph coloring validity."""

import numpy as np
import pytest

from pynngp_tpu import neighbors


def brute_force_table(pts, m):
    n = len(pts)
    idx = np.zeros((n, m), dtype=np.int32)
    mask = np.zeros((n, m), dtype=bool)
    for i in range(n):
        if i == 0:
            continue
        d = np.sqrt(((pts[:i] - pts[i]) ** 2).sum(-1))
        k = min(m, i)
        sel = np.argsort(d, kind="stable")[:k]
        idx[i, :k] = sel
        mask[i, :k] = True
    return idx, mask


@pytest.mark.parametrize("n,m,block", [(50, 5, 16), (300, 10, 64), (500, 15, 2048)])
def test_table_matches_brute_force(rng, n, m, block):
    coords = rng.uniform(size=(n, 2))
    tab = neighbors.build_neighbor_table(coords, m, ordering="coordinate", block_size=block)
    pts = coords[tab.order]
    bidx, bmask = brute_force_table(pts, m)
    assert (tab.nn_mask == bmask).all()
    # compare as sets per row (ties may order differently)
    for i in range(n):
        got = set(tab.nn_idx[i][tab.nn_mask[i]])
        want = set(bidx[i][bmask[i]])
        assert got == want, f"row {i}"
    # preceding-ness: every neighbor index < site index
    ii = np.arange(n)[:, None]
    assert (tab.nn_idx < np.maximum(ii, 1))[tab.nn_mask[...]].all()


def test_orderings_are_permutations(rng):
    coords = rng.uniform(size=(100, 2))
    for ordering in ["coordinate", "maxmin", "none"]:
        tab = neighbors.build_neighbor_table(coords, 5, ordering=ordering)
        assert sorted(tab.order) == list(range(100))
        np.testing.assert_array_equal(tab.order[tab.inverse_order], np.arange(100))


def test_children_table_consistency(rng):
    coords = rng.uniform(size=(120, 2))
    tab = neighbors.build_neighbor_table(coords, 8)
    ch = neighbors.build_children_table(tab.nn_idx, tab.nn_mask)
    # forward: child_idx[p] lists exactly the j with p in N(j), at right slot
    for p in range(120):
        listed = {
            (int(j), int(s))
            for j, s, ok in zip(ch.child_idx[p], ch.child_slot[p], ch.child_mask[p])
            if ok
        }
        truth = {
            (j, s)
            for j in range(120)
            for s in range(8)
            if tab.nn_mask[j, s] and tab.nn_idx[j, s] == p
        }
        assert listed == truth


def test_moral_coloring_is_proper(rng):
    coords = rng.uniform(size=(150, 2))
    tab = neighbors.build_neighbor_table(coords, 6)
    colors = neighbors.color_moral_graph(tab.nn_idx, tab.nn_mask)
    n = 150
    # build moral adjacency independently
    adj = np.zeros((n, n), dtype=bool)
    for j in range(n):
        par = tab.nn_idx[j][tab.nn_mask[j]]
        for p in par:
            adj[j, p] = adj[p, j] = True
        for a in par:
            for b in par:
                if a != b:
                    adj[a, b] = True
    ii, jj = np.nonzero(adj)
    assert (colors[ii] != colors[jj]).all()
    assert colors.min() == 0


def test_dotproduct_metric_table(rng):
    x = rng.standard_normal((80, 8))
    tab = neighbors.build_neighbor_table(x, 5, metric="dotproduct")
    pts = x[tab.order]
    pn = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    for i in range(1, 80):
        d = 1.0 - pn[:i] @ pn[i]
        k = min(5, i)
        want = set(np.argsort(d, kind="stable")[:k])
        got = set(tab.nn_idx[i][tab.nn_mask[i]])
        assert got == want


def _maxmin_profile(coords, order):
    """Sequence of max-min distances realized by an ordering."""
    pts = coords[order]
    out = np.empty(len(order))
    out[0] = np.inf
    mind = ((pts[1:] - pts[0]) ** 2).sum(axis=1)
    for i in range(1, len(order)):
        out[i] = np.sqrt(mind[i - 1])
        if i + 1 < len(order):
            d = ((pts[i + 1 :] - pts[i]) ** 2).sum(axis=1)
            mind[i:] = np.minimum(mind[i:], d)
    return out


def test_maxmin_heap_matches_dense_profile(rng):
    """The scalable lazy-heap path must realize the SAME max-min distance
    profile as the O(n^2) dense sweep (the order itself is tie-ambiguous)."""
    coords = rng.uniform(size=(600, 2))
    dense = neighbors._order_maxmin_dense(coords)
    heap = neighbors._order_maxmin_heap(coords, batch=64)
    assert sorted(heap) == list(range(600))
    p_dense = _maxmin_profile(coords, dense)
    p_heap = _maxmin_profile(coords, heap)
    np.testing.assert_allclose(p_heap[1:], p_dense[1:], rtol=1e-10)
    # and the profile is non-increasing (the defining max-min property)
    assert (np.diff(p_heap[1:]) <= 1e-12).all()


def test_maxmin_large_n_fast(rng):
    import time

    coords = rng.uniform(size=(60_000, 2))
    t0 = time.time()
    order = neighbors.order_maxmin(coords)
    dt = time.time() - t0
    assert sorted(order) == list(range(60_000))
    assert dt < 30.0, f"maxmin at n=60k took {dt:.1f}s"
