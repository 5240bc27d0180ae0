"""Native C++ host preprocessing vs the Python implementations."""

import numpy as np
import pytest

from pynngp_tpu import native, neighbors


pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native toolchain unavailable"
)


def test_native_neighbor_table_matches_python(rng):
    coords = rng.uniform(size=(800, 2))
    order = neighbors.order_by_coordinate(coords)
    pts = coords[order]
    nn_idx, nn_mask = native.neighbor_table(pts, 10)
    tab = neighbors.build_neighbor_table(coords, 10, use_native="never")
    assert (nn_mask == tab.nn_mask).all()
    for i in range(800):
        got = set(nn_idx[i][nn_mask[i]])
        want = set(tab.nn_idx[i][tab.nn_mask[i]])
        assert got == want, i


def test_native_neighbor_3d(rng):
    coords = rng.uniform(size=(400, 3))
    tab_n = neighbors.build_neighbor_table(coords, 8, use_native="auto")
    tab_p = neighbors.build_neighbor_table(coords, 8, use_native="never")
    for i in range(400):
        assert set(tab_n.nn_idx[i][tab_n.nn_mask[i]]) == set(
            tab_p.nn_idx[i][tab_p.nn_mask[i]]
        )


def test_native_children_matches_python(rng):
    coords = rng.uniform(size=(500, 2))
    tab = neighbors.build_neighbor_table(coords, 7)
    ch_n = native.children_table(tab.nn_idx, tab.nn_mask)
    ch_p = neighbors.build_children_table(tab.nn_idx, tab.nn_mask, use_native="never")
    ci_n, cs_n, cm_n = ch_n
    for p in range(500):
        got = {(int(j), int(s)) for j, s, ok in zip(ci_n[p], cs_n[p], cm_n[p]) if ok}
        want = {
            (int(j), int(s))
            for j, s, ok in zip(
                ch_p.child_idx[p], ch_p.child_slot[p], ch_p.child_mask[p]
            )
            if ok
        }
        assert got == want, p


def test_native_coloring_proper_and_balanced(rng):
    coords = rng.uniform(size=(1200, 2))
    tab = neighbors.build_neighbor_table(coords, 8)
    colors = neighbors.color_moral_graph(tab.nn_idx, tab.nn_mask)
    n = 1200
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
    counts = np.bincount(colors)
    # balanced: largest class within 3x of the mean
    assert counts.max() <= 3 * counts.mean()


def test_native_speed_smoke(rng):
    """Native path handles n=50k quickly (sanity against regressions)."""
    import time

    coords = rng.uniform(size=(50_000, 2))
    t0 = time.time()
    tab = neighbors.build_neighbor_table(coords, 15)
    dt = time.time() - t0
    assert tab.nn_mask[20:].all()
    assert dt < 30.0, f"native neighbor build too slow: {dt:.1f}s"


def test_native_maxmin_matches_dense_profile(rng):
    from pynngp_tpu import native, neighbors
    from tests.test_neighbors import _maxmin_profile

    if not native.native_available():
        import pytest

        pytest.skip("native lib unavailable")
    coords = rng.uniform(size=(700, 2))
    order = native.order_maxmin(coords)
    assert sorted(order) == list(range(700))
    dense = neighbors._order_maxmin_dense(coords)
    np.testing.assert_allclose(
        _maxmin_profile(coords, order)[1:],
        _maxmin_profile(coords, dense)[1:],
        rtol=1e-10,
    )


def test_native_maxmin_3d(rng):
    from pynngp_tpu import native, neighbors
    from tests.test_neighbors import _maxmin_profile

    if not native.native_available():
        import pytest

        pytest.skip("native lib unavailable")
    coords = rng.uniform(size=(400, 3))
    order = native.order_maxmin(coords)
    assert sorted(order) == list(range(400))
    dense = neighbors._order_maxmin_dense(coords)
    np.testing.assert_allclose(
        _maxmin_profile(coords, order)[1:],
        _maxmin_profile(coords, dense)[1:],
        rtol=1e-10,
    )
