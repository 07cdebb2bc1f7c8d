"""Tests for the clustering module (reference clustering.py parity)."""

import numpy as np
import pytest
import scipy.sparse as sp

import graphlearning_tpu as gl
from graphlearning_tpu import clustering as cl


@pytest.fixture(scope="module")
def moons():
    import sklearn.datasets as skd

    X, labels = skd.make_moons(n_samples=400, noise=0.08, random_state=0)
    W = gl.weightmatrix.knn(X, 10)
    return X, labels, W


def test_spectral_ngjordanweiss(moons):
    X, labels, W = moons
    pred = cl.spectral(W, num_clusters=2).fit_predict()
    assert cl.clustering_accuracy(pred, labels) > 90


@pytest.mark.parametrize("method", ["combinatorial", "ShiMalik"])
def test_spectral_other_embeddings(moons, method):
    X, labels, W = moons
    pred = cl.spectral(W, num_clusters=2, method=method).fit_predict()
    assert len(np.unique(pred)) == 2


def test_spectral_invalid_method(moons):
    X, labels, W = moons
    with pytest.raises(SystemExit):
        cl.spectral(W, num_clusters=2, method="bogus").fit_predict()


def test_predict_before_fit_exits(moons):
    X, labels, W = moons
    with pytest.raises(SystemExit):
        cl.spectral(W, num_clusters=2).predict()


def test_fokker_planck_small():
    # two 30-node cliques joined by one weak edge — FP diffusion separates
    n_half = 30
    A = np.ones((n_half, n_half)) - np.eye(n_half)
    W = sp.block_diag([A, A]).tolil()
    W[0, n_half] = W[n_half, 0] = 0.01
    labels = np.repeat([0, 1], n_half)
    pred = cl.fokker_planck(W.tocsr(), num_clusters=2, beta=0.5,
                            t=1).fit_predict()
    assert cl.clustering_accuracy(pred, labels) == 100


def test_incres_moons(moons):
    X, labels, W = moons
    pred = cl.incres(W, num_clusters=2, speed=5, T=60, seed=0).fit_predict()
    assert cl.clustering_accuracy(pred, labels) > 70


def test_withinss_exact_two_means():
    """withinss must find the exact optimal 1-D 2-means split (compare
    against brute-force over all split points)."""
    rs = np.random.RandomState(0)
    x = np.concatenate([rs.randn(50), rs.randn(50) + 6.0])
    w, m = cl.withinss(x)
    xs = np.sort(x)
    best = np.inf
    for i in range(1, len(xs)):
        a, b = xs[:i], xs[i:]
        ss = ((a - a.mean()) ** 2).sum() + ((b - b.mean()) ** 2).sum()
        best = min(best, ss)
    got = ((xs - xs.mean()) ** 2 + 0).sum()  # total ss
    # w is normalized within-ss: w = best_ss / (n sigma^2); check equality
    np.testing.assert_allclose(w, best / (len(x) * np.std(x) ** 2),
                               rtol=1e-10)
    # threshold splits the two blobs
    assert 1.5 < m < 4.5


def test_rp1d_separates_blobs():
    rs = np.random.RandomState(1)
    X = np.vstack([rs.randn(60, 5), rs.randn(60, 5) + 8.0])
    labels = np.repeat([0, 1], 60)
    pred = cl.RP1D(X, T=50, seed=0)
    assert cl.clustering_accuracy(pred, labels) == 100


def test_clustering_accuracy_permutation_invariant():
    true = np.array([0, 0, 1, 1, 2, 2])
    pred = np.array([2, 2, 0, 0, 1, 1])          # relabeled perfectly
    assert cl.clustering_accuracy(pred, true) == 100
    assert cl.purity(pred, true) == 100


def test_purity_counts_majorities():
    true = np.array([0, 0, 0, 1])
    pred = np.zeros(4)                            # one cluster, majority 0
    assert cl.purity(pred, true) == 75
