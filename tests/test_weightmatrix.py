"""Graph-construction parity: on-device kNN vs scipy cKDTree, kernel
weights, symmetrization (reference weightmatrix.py semantics)."""

import numpy as np
import scipy.sparse as sp
import pytest

from graphlearning_tpu import weightmatrix


@pytest.fixture(scope="module")
def X(rng=None):
    rs = np.random.RandomState(3)
    return rs.randn(300, 8)


def test_brute_matches_kdtree(X):
    from scipy import spatial

    k = 12
    ind_b, dist_b = weightmatrix.knnsearch(X, k, method="brute")
    tree = spatial.cKDTree(X)
    dist_ref, ind_ref = tree.query(X, k=k)
    # distances must match (indices can differ on ties)
    np.testing.assert_allclose(dist_b, dist_ref, rtol=1e-4, atol=1e-5)
    assert np.mean(ind_b == ind_ref) > 0.99


def test_brute_angular(X):
    k = 5
    ind, dist = weightmatrix.knnsearch(X, k, method="brute", similarity="angular")
    Y = X / np.linalg.norm(X, axis=1, keepdims=True)
    D = np.linalg.norm(Y[:, None, :] - Y[None, :, :], axis=2)
    ref = np.sort(D, axis=1)[:, :k]
    np.testing.assert_allclose(dist, ref, rtol=1e-3, atol=1e-4)


def test_knn_gaussian_weights(X):
    k = 10
    W = weightmatrix.knn(X, k)
    n = X.shape[0]
    assert W.shape == (n, n)
    # symmetric, zero diagonal, nonnegative
    assert abs(W - W.T).max() < 1e-12
    assert np.all(W.diagonal() == 0)
    assert W.data.min() >= 0
    # check self-tuning weight formula on one row against direct computation
    from scipy import spatial

    tree = spatial.cKDTree(X)
    dist, ind = tree.query(X, k=k + 1)
    i = 7
    eps = dist[i, k] ** 2
    w_direct = np.exp(-4 * dist[i, 1:] ** 2 / eps)
    Wd = sp.coo_matrix(weightmatrix.knn(X, k, symmetrize=False))
    row = {j: v for r, j, v in zip(Wd.row, Wd.col, Wd.data) if r == i}
    for j, w in zip(ind[i, 1:], w_direct):
        assert abs(row.get(j, 0) - w) < 1e-5


def test_uniform_kernel_knn(X):
    W = weightmatrix.knn(X, 8, kernel="uniform")
    assert set(np.unique(W.data)) <= {1.0}


def test_epsilon_ball():
    rs = np.random.RandomState(0)
    Y = rs.rand(200, 2)
    eps = 0.15
    W = weightmatrix.epsilon_ball(Y, eps)
    D = np.linalg.norm(Y[:, None] - Y[None, :], axis=2)
    ref_mask = (D <= eps) & (D > 0)
    Wd = np.asarray(W.todense())
    got_mask = Wd > 0
    # same sparsity (modulo boundary ties)
    assert np.mean(got_mask == ref_mask) > 0.999
    i, j = np.where(ref_mask & got_mask)
    np.testing.assert_allclose(
        Wd[i, j], np.exp(-4 * D[i, j] ** 2 / eps**2), rtol=1e-10
    )


def test_grid_graph():
    W, XY = weightmatrix.grid_graph(4, 5, return_xy=True)
    assert W.shape == (20, 20)
    deg = np.asarray(W.sum(1)).ravel()
    # corner nodes have 2 neighbors, edge 3, interior 4
    assert deg.min() == 2 and deg.max() == 4
    assert (W != W.T).nnz == 0


def test_knn_graph_device(X):
    g = weightmatrix.knn_graph(X, 10)
    assert g.n == X.shape[0]
    W = weightmatrix.knn(X, 10)
    np.testing.assert_allclose(
        np.asarray(g.to_scipy().todense()), np.asarray(W.todense()), rtol=1e-5, atol=1e-7
    )


def test_ivf_knn_high_recall():
    """IVF approximate kNN must reach near-perfect recall vs brute force
    on a realistic clustered-embedding workload (the annoy replacement
    contract; unstructured high-d Gaussians are IVF-hostile by nature)."""
    from graphlearning_tpu.weightmatrix import knnsearch

    rs = np.random.RandomState(3)
    n, d, ncls = 4000, 30, 10
    centers = rs.randn(ncls, d) * 2.0
    labels = rs.randint(0, ncls, n)
    X = centers[labels] + rs.randn(n, d) * 0.5
    ind_b, dist_b = knnsearch(X, 10, method="brute")
    ind_i, dist_i = knnsearch(X, 10, method="ivf")
    recall = np.mean([
        len(np.intersect1d(ind_b[i], ind_i[i])) / 10 for i in range(len(X))
    ])
    assert recall > 0.95, recall
    # distances of the found neighbors are exact
    hit = ind_i == ind_b
    np.testing.assert_allclose(dist_i[hit], dist_b[hit], rtol=1e-5, atol=1e-5)


def test_annoy_routes_to_ivf(X):
    from graphlearning_tpu.weightmatrix import knnsearch

    ind, dist = knnsearch(X, 5, method="annoy")
    assert ind.shape == (len(X), 5)
    # self is its own nearest neighbor at distance 0
    np.testing.assert_array_equal(ind[:, 0], np.arange(len(X)))
