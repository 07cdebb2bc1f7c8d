"""Tests for remaining graph-class API surface (reference graph.py parity)
and utils solvers not covered elsewhere."""

import numpy as np
import pytest
import scipy.sparse as sp

import graphlearning_tpu as gl
from graphlearning_tpu import utils
from conftest import random_knn_csr


@pytest.fixture(scope="module")
def G():
    return gl.graph(random_knn_csr(150, 7, seed=9))


def test_adjacency_binary(G):
    A = G.adjacency()
    assert set(np.unique(A.toarray())) <= {0.0, 1.0}
    assert (A.toarray() > 0).sum() == (G.weight_matrix.toarray() > 0).sum()


def test_rand_randn_same_sparsity(G):
    R = G.rand(seed=0)
    N = G.randn(seed=0)
    W = G.weight_matrix
    np.testing.assert_array_equal((R.toarray() != 0), (W.toarray() != 0))
    assert N.shape == W.shape


def test_subgraph(G):
    ind = np.arange(40)
    S = G.subgraph(ind)
    np.testing.assert_allclose(
        S.toarray() if hasattr(S, "toarray") else gl.graph(S).weight_matrix.toarray(),
        G.weight_matrix[ind][:, ind].toarray())


def test_isconnected_detects_disconnection():
    W = sp.block_diag([np.ones((3, 3)) - np.eye(3)] * 2).tocsr()
    assert not gl.graph(W).isconnected()
    W2 = sp.csr_matrix(np.ones((5, 5)) - np.eye(5))
    assert gl.graph(W2).isconnected()


def test_degree_matrix_powers(G):
    D = G.degree_matrix(p=-1)
    deg = np.asarray(G.weight_matrix.sum(1)).ravel()
    np.testing.assert_allclose(D.diagonal(), 1.0 / deg, rtol=1e-10)


def test_laplacian_invalid_normalization(G):
    with pytest.raises((ValueError, SystemExit)):
        G.laplacian(normalization="bogus")


def test_infinity_laplacian_interpolates(G):
    rs = np.random.RandomState(0)
    u = rs.rand(G.num_nodes)
    Lu = G.infinity_laplacian(u)
    assert Lu.shape == (G.num_nodes,)
    # inf-Laplacian of a constant is 0
    np.testing.assert_allclose(
        G.infinity_laplacian(np.ones(G.num_nodes)), 0.0, atol=1e-12)


def test_constrained_solve_gmres_matches_direct():
    W = random_knn_csr(80, 6, seed=2)
    deg = np.asarray(W.sum(1)).ravel()
    L = sp.diags(deg) - W
    ind = np.array([0, 5, 17])
    gvals = np.zeros(80)
    gvals[ind] = [1.0, -1.0, 0.5]
    R = sp.eye(80).tocsr()      # constraint Rx = g on ind (reference API)
    u = utils.constrained_solve_gmres(L, np.zeros(80), R, gvals, ind)
    # Dirichlet condition holds and interior equation residual is small
    np.testing.assert_allclose(u[ind], gvals[ind], atol=1e-4)
    r = (L @ u)
    interior = np.setdiff1d(np.arange(80), ind)
    assert np.abs(r[interior]).max() < 1e-3


def test_dirichlet_eigenvectors():
    W = random_knn_csr(100, 6, seed=3)
    deg = np.asarray(W.sum(1)).ravel()
    L = sp.diags(deg) - W
    ind = np.arange(10)          # boundary nodes
    vals, vecs = utils.dirichlet_eigenvectors(L, ind, k=3)
    assert vecs.shape == (100, 3)
    np.testing.assert_allclose(vecs[ind], 0.0, atol=1e-12)
    # eigen-residual on the interior block
    interior = np.setdiff1d(np.arange(100), ind)
    Lsub = L[interior][:, interior]
    for j in range(3):
        v = vecs[interior, j]
        np.testing.assert_allclose(Lsub @ v, vals[j] * v, atol=1e-6)


def test_page_rank_teleport_vector(G):
    n = G.num_nodes
    v = np.zeros(n)
    v[0] = 1.0
    u = G.page_rank(alpha=0.85, v=v)
    assert abs(u.sum() - 1.0) < 1e-5
    assert u[0] > np.median(u)     # teleport node gets above-median mass


def test_neighbors_and_largest_connected_component():
    import scipy.sparse as sp
    from graphlearning_tpu.core.graphclass import graph

    # two components: a 0-1-2 triangle and a 3-4 edge
    W = sp.csr_matrix(
        np.array(
            [
                [0, 1, 1, 0, 0],
                [1, 0, 1, 0, 0],
                [1, 1, 0, 0, 0],
                [0, 0, 0, 0, 2.0],
                [0, 0, 0, 2.0, 0],
            ]
        )
    )
    G = graph(W)
    N, w = G.neighbors(1, return_weights=True)
    assert list(N) == [0, 2]
    np.testing.assert_allclose(w, [1.0, 1.0])
    assert list(G.neighbors(3)) == [4]
    G2, ind = G.largest_connected_component()
    assert G2.num_nodes == 3
    assert ind.tolist() == [True, True, True, False, False]
    assert G2.isconnected() and not G.isconnected()
