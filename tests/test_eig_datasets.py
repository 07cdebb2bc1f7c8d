"""Tests for the eigensolver stack, graph spectral API, datasets and
trainsets (reference graph.py:623-806, datasets.py, trainsets.py)."""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import graphlearning_tpu as gl
from conftest import random_knn_csr


@pytest.fixture(scope="module")
def G():
    return gl.graph(random_knn_csr(300, 8, seed=4))


def _scipy_smallest(L, k):
    vals, vecs = spla.eigsh(L.astype(float), k=k, which="SM")
    order = np.argsort(vals)
    return vals[order], vecs[:, order]


@pytest.mark.parametrize("normalization", ["combinatorial", "normalized"])
def test_eigen_decomp_matches_scipy(G, normalization):
    vals, vecs = G.eigen_decomp(normalization=normalization, k=5)
    W = G.weight_matrix
    deg = np.asarray(W.sum(1)).ravel()
    if normalization == "combinatorial":
        L = sp.diags(deg) - W
    else:
        s = 1.0 / np.sqrt(deg)
        L = sp.eye(W.shape[0]) - sp.diags(s) @ W @ sp.diags(s)
    ref_vals, ref_vecs = _scipy_smallest(L, 5)
    np.testing.assert_allclose(vals, ref_vals, atol=1e-4)
    # eigenvector parity up to sign
    for j in range(5):
        v, r = vecs[:, j], ref_vecs[:, j]
        err = min(np.abs(v - r).max(), np.abs(v + r).max())
        assert err < 1e-2, (j, err)


def test_eigen_cache_hit(G):
    v1 = G.eigen_decomp(k=4)
    assert ("combinatorial", "exact", 4, None, 0, 0, 1) in G.eigendata["combinatorial"]
    v2 = G.eigen_decomp(k=4)
    np.testing.assert_array_equal(v1[1], v2[1])


def test_fiedler_vector_bipartitions(G):
    f = G.fiedler_vector()
    assert f.shape == (G.num_nodes,)
    # Fiedler vector of a connected graph has both signs
    assert (f > 0).any() and (f < 0).any()


def test_lowrank_eigen_close_to_exact(G):
    vals_e, _ = G.eigen_decomp(normalization="normalized", k=4, method="exact")
    vals_l, _ = G.eigen_decomp(normalization="normalized", k=4,
                               method="lowrank", c=40, q=3)
    np.testing.assert_allclose(vals_e, vals_l, atol=5e-2)


def test_diffusion_map_shape(G):
    # reference semantics (graph.py:584-621): returns (vals, emb), trivial
    # mode dropped unless full=True
    vals, Phi = G.diffusion_map(k=2, d=6)
    assert Phi.shape == (G.num_nodes, 5)
    assert vals.shape == (5,)
    assert np.all(np.isfinite(Phi))
    vals_f, Phi_f = G.diffusion_map(k=2, d=6, full=True)
    assert Phi_f.shape == (G.num_nodes, 6)


def test_fiedler_return_value(G):
    f, lam = G.fiedler_vector(return_value=True)
    assert f.shape == (G.num_nodes,)
    assert 0 <= lam <= 2.0


def test_randomized_svd_vs_exact():
    rs = np.random.RandomState(0)
    A = rs.randn(100, 30) @ rs.randn(30, 100)  # rank 30
    P, S, Q = gl.utils.randomized_svd(sp.csr_matrix(A), k=5, c=25, q=4)
    _, S_ref, _ = np.linalg.svd(A)
    np.testing.assert_allclose(np.sort(S)[::-1], S_ref[:5], rtol=1e-2)


# -- datasets / trainsets -------------------------------------------------


def test_two_skies_shapes():
    X, labels = gl.datasets.two_skies(100, seed=1)
    assert X.shape[0] == labels.shape[0] == 100
    assert set(np.unique(labels)) == {0, 1}


def test_load_labels_offline():
    labels = gl.datasets.load("mnist", labels_only=True)
    assert labels.shape[0] == 70000
    assert labels.min() == 0 and labels.max() == 9


def test_load_graph_karate():
    G = gl.datasets.load_graph("karate")
    assert G.num_nodes == 34
    assert G.weight_matrix.nnz > 0


def test_trainsets_generate_counts():
    labels = np.repeat(np.arange(4), 25)
    ts = gl.trainsets.generate(labels, rate=3, seed=0)
    assert len(ts) == 12
    _, counts = np.unique(labels[ts], return_counts=True)
    assert np.all(counts == 3)
    # float rate = fraction per class
    ts_f = gl.trainsets.generate(labels, rate=0.2, seed=0)
    assert len(ts_f) == 4 * 5
    # per-class array rate
    ts_a = gl.trainsets.generate(labels, rate=np.array([1, 2, 3, 4]), seed=0)
    assert len(ts_a) == 10


def test_trainsets_reproducible():
    labels = np.repeat(np.arange(3), 20)
    a = gl.trainsets.generate(labels, rate=2, num_trials=3, seed=7)
    b = gl.trainsets.generate(labels, rate=2, num_trials=3, seed=7)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_trainsets_load_reference_fixture():
    perms = gl.trainsets.load("MNIST")
    assert len(perms) > 0
    labels = gl.datasets.load("mnist", labels_only=True)
    p0 = np.asarray(perms[0])
    assert p0.min() >= 0 and p0.max() < 70000
    # fixture permutations sample every class
    assert len(np.unique(labels[p0])) == 10


def test_negative_labels_excluded():
    labels = np.array([0, 0, 1, 1, -1, -1])
    ts = gl.trainsets.generate(labels, rate=1, seed=0)
    assert np.all(labels[ts] >= 0)
