"""Native neighbor engine vs the scipy/sklearn oracles it replaces.

Every query type (k-NN, ball, pairs, DBSCAN) is checked for exact
agreement on random and lattice-like point sets, in 2D and 3D, plus the
miss conventions (upper bound, k > n) and the pure-Python fallback path.
"""

import numpy as np
import pytest
from scipy import spatial

from atomai_tpu.native import neighbors


pytestmark = pytest.mark.skipif(
    neighbors.get_lib() is None, reason="native toolchain unavailable")


def _points(n, dim, seed, lattice=False):
    rng = np.random.RandomState(seed)
    if lattice:
        side = int(np.ceil(n ** (1.0 / dim)))
        grid = np.stack(np.meshgrid(
            *[np.arange(side, dtype=float)] * dim,
            indexing="ij"), -1).reshape(-1, dim)[:n]
        return grid + rng.randn(n, dim) * 0.05
    return rng.rand(n, dim) * 10


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("lattice", [False, True])
def test_knn_matches_ckdtree(dim, lattice):
    pts = _points(400, dim, seed=0, lattice=lattice)
    q = _points(57, dim, seed=1, lattice=False)
    d, i = neighbors.knn(pts, q, k=4)
    d_ref, i_ref = spatial.cKDTree(pts).query(q, k=4)
    np.testing.assert_allclose(d, d_ref, rtol=1e-12)
    np.testing.assert_array_equal(i, i_ref)


def test_knn_upper_bound_miss_convention():
    pts = _points(100, 2, seed=2)
    q = pts[:10] + 0.01
    d, i = neighbors.knn(pts, q, k=5, upper_bound=0.3)
    d_ref, i_ref = spatial.cKDTree(pts).query(
        q, k=5, distance_upper_bound=0.3)
    np.testing.assert_allclose(d, d_ref, rtol=1e-12)
    np.testing.assert_array_equal(i, i_ref)
    assert (i == len(pts)).any(), "expected at least one miss"


def test_knn_k_larger_than_n():
    pts = _points(3, 2, seed=3)
    d, i = neighbors.knn(pts, pts, k=5)
    assert np.isinf(d[:, 3:]).all()
    assert (i[:, 3:] == 3).all()
    np.testing.assert_allclose(d[:, 0], 0.0)


@pytest.mark.parametrize("dim", [2, 3])
def test_ball_query_matches_ckdtree(dim):
    pts = _points(300, dim, seed=4)
    q = _points(40, dim, seed=5)
    r = 1.2
    ours = neighbors.ball_query(pts, q, r)
    ref = spatial.cKDTree(pts).query_ball_point(q, r=r)
    assert len(ours) == len(ref)
    for a, b in zip(ours, ref):
        np.testing.assert_array_equal(a, np.sort(b))


@pytest.mark.parametrize("dim", [2, 3])
def test_query_pairs_matches_ckdtree(dim):
    pts = _points(250, dim, seed=6, lattice=True)
    r = 1.5
    ours = neighbors.query_pairs(pts, r)
    ref = spatial.cKDTree(pts).query_pairs(r, output_type="ndarray")
    ours = ours[np.lexsort((ours[:, 1], ours[:, 0]))]
    ref = np.sort(ref, axis=1)
    ref = ref[np.lexsort((ref[:, 1], ref[:, 0]))]
    np.testing.assert_array_equal(ours, ref)


def _canon(labels):
    """Renumber cluster labels by first occurrence so partitions compare."""
    out = np.full(len(labels), -1)
    nxt = 0
    for i, l in enumerate(labels):
        if l < 0 or out[i] != -1:
            continue
        out[labels == l] = nxt
        nxt += 1
    return out


@pytest.mark.parametrize("dim", [2, 3])
def test_dbscan_matches_sklearn(dim):
    sklearn = pytest.importorskip("sklearn.cluster")
    rng = np.random.RandomState(7)
    blobs = [rng.randn(50, dim) * 0.2 + c
             for c in (np.zeros(dim), np.full(dim, 5.0), np.full(dim, -5.0))]
    noise = rng.rand(10, dim) * 30 - 15
    pts = np.concatenate(blobs + [noise])
    ours = neighbors.dbscan(pts, eps=0.8, min_samples=5)
    ref = sklearn.DBSCAN(eps=0.8, min_samples=5).fit(pts).labels_
    np.testing.assert_array_equal(_canon(ours), _canon(ref))
    assert len(np.unique(ours[ours >= 0])) == 3


def test_fallback_path(monkeypatch):
    """ATOMAI_TPU_NATIVE=0 routes to scipy/sklearn and agrees."""
    pts = _points(100, 2, seed=8)
    d0, i0 = neighbors.knn(pts, pts[:5], k=3)
    monkeypatch.setenv("ATOMAI_TPU_NATIVE", "0")
    assert neighbors.get_lib() is None
    d1, i1 = neighbors.knn(pts, pts[:5], k=3)
    np.testing.assert_allclose(d0, d1, rtol=1e-12)
    np.testing.assert_array_equal(i0, i1)
    p1 = neighbors.query_pairs(pts, 0.5)
    b1 = neighbors.ball_query(pts, pts[:5], 0.5)
    monkeypatch.delenv("ATOMAI_TPU_NATIVE")
    p0 = neighbors.query_pairs(pts, 0.5)
    b0 = neighbors.ball_query(pts, pts[:5], 0.5)
    np.testing.assert_array_equal(
        p0[np.lexsort(p0.T)], p1[np.lexsort(p1.T)])
    for a, b in zip(b0, b1):
        np.testing.assert_array_equal(a, b)


def test_empty_and_single_point():
    pts = np.zeros((1, 2))
    d, i = neighbors.knn(pts, pts, k=2)
    assert d[0, 0] == 0 and np.isinf(d[0, 1])
    assert neighbors.query_pairs(pts, 1.0).shape == (0, 2)
    out = neighbors.ball_query(pts, pts, 1.0)
    np.testing.assert_array_equal(out[0], [0])
    labels = neighbors.dbscan(pts, eps=1.0, min_samples=2)
    np.testing.assert_array_equal(labels, [-1])


def test_far_outlier_does_not_overflow_grid():
    """A corrupted coordinate light-years away with a small eps must not
    overflow the cell-count computation (UB before the cap check)."""
    rng = np.random.RandomState(0)
    pts = rng.rand(64, 3) * 10
    pts[0] = [3e6, 3e6, 3e6]
    labels = neighbors.dbscan(pts, eps=0.5, min_samples=3)
    assert labels.shape == (64,)
    d, i = neighbors.knn(pts, pts, k=3)
    assert np.isfinite(d[1:, 1]).all()
    pairs = neighbors.query_pairs(pts, 0.5)
    assert pairs.ndim == 2


def test_one_dimensional_points_use_fallback():
    """dim == 1 must route to the scipy fallback — the native grid hash
    only implements 2-D/3-D and previously read uninitialized loop
    bounds (returning all-inf/all-noise silently)."""
    rng = np.random.RandomState(0)
    pts = rng.rand(50, 1) * 10
    d, i = neighbors.knn(pts, pts[:5], k=3)
    d_ref, i_ref = spatial.cKDTree(pts).query(pts[:5], k=3)
    np.testing.assert_allclose(d, d_ref, atol=1e-12)
    np.testing.assert_array_equal(i, i_ref)
    labels = neighbors.dbscan(pts, eps=0.2, min_samples=3)
    from sklearn.cluster import DBSCAN
    ref = DBSCAN(eps=0.2, min_samples=3).fit(pts).labels_
    # same clustering structure: noise matches; clusters are a relabeling
    np.testing.assert_array_equal(labels == -1, ref == -1)


def test_graph_rings_kill_switch(monkeypatch):
    """ATOMAI_TPU_NATIVE=0 must disable the native ring finder too, not
    only the neighbor engine."""
    import atomai_tpu.native as native

    monkeypatch.setenv("ATOMAI_TPU_NATIVE", "0")
    monkeypatch.setattr(native, "_lib", None)
    assert native.get_lib() is None
