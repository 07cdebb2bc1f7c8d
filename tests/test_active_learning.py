"""Tests for active learning (reference active_learning.py parity)."""

import numpy as np
import pytest

import graphlearning_tpu as gl
from graphlearning_tpu import active_learning as al


@pytest.fixture(scope="module")
def setup():
    import sklearn.datasets as skd

    X, labels = skd.make_moons(n_samples=200, noise=0.1, random_state=0)
    W = gl.weightmatrix.knn(X, 8)
    model = gl.ssl.laplace(W)
    G = gl.graph(W)
    vals, vecs = G.eigen_decomp(normalization="normalized", k=20)
    return labels, W, model, vals, vecs


def test_unc_sampling_flavors(setup):
    labels, W, model, vals, vecs = setup
    train_ind = gl.trainsets.generate(labels, rate=3, seed=0)
    u = model.fit(train_ind, labels[train_ind])
    cand = np.arange(50)
    for m in ("norm", "entropy", "least_confidence", "smallest_margin",
              "largest_margin", "unc_2norm"):
        vals_ = al.unc_sampling(unc_method=m).compute(u, cand)
        assert vals_.shape == (50,) and np.all(np.isfinite(vals_))
    with pytest.raises(ValueError):
        al.unc_sampling(unc_method="bogus").compute(u, cand)


def test_var_opt_downdate_matches_direct(setup):
    """Rank-1 downdate C' = C - c_k c_k^T/(γ²+C_kk) must equal the direct
    formula (reference active_learning.py:307-317)."""
    labels, W, model, vals, vecs = setup
    rs = np.random.RandomState(0)
    A = rs.randn(30, 30)
    C = A @ A.T
    acq = al.var_opt(C, gamma2=0.01)
    k = 7
    ck = C[:, k].copy()
    expected = C - np.outer(ck, ck) / (0.01 + C[k, k])
    acq.update(np.array([k]), np.array([0]))
    np.testing.assert_allclose(np.asarray(acq.C), expected, atol=1e-8)


def test_truncated_storage_matches_full(setup):
    """Spectral-truncated covariance must give the same acquisition values
    as the full storage when V spans the full space."""
    rs = np.random.RandomState(1)
    n = 25
    A = rs.randn(n, n)
    Cfull = A @ A.T
    # full-rank truncation: C = I in eigenbasis of Cfull -> use V=I, C=Cfull
    acq_full = al.var_opt(Cfull, gamma2=0.04)
    acq_tr = al.var_opt(Cfull, V=np.eye(n), gamma2=0.04)
    cand = np.arange(n)
    np.testing.assert_allclose(acq_full.compute(None, cand),
                               acq_tr.compute(None, cand), atol=1e-8)
    acq_full.update([3], [0])
    acq_tr.update([3], [0])
    np.testing.assert_allclose(acq_full.compute(None, cand),
                               acq_tr.compute(None, cand), atol=1e-8)


def test_active_learning_loop_improves(setup):
    labels, W, model, vals, vecs = setup
    train_ind = gl.trainsets.generate(labels, rate=1, seed=2)
    # spectral-truncated covariance from the low-lying eigenvectors
    C0 = np.diag(1.0 / (vals + 0.11))
    learner = al.active_learner(
        model, al.var_opt(C0, V=vecs, gamma2=0.1**2),
        train_ind, labels[train_ind])
    acc0 = gl.ssl.ssl_accuracy(model.predict(), labels, learner.labeled_ind)
    for _ in range(10):
        q = learner.select_queries(batch_size=1)
        learner.update(q, labels[q])
    acc1 = gl.ssl.ssl_accuracy(model.predict(), labels, learner.labeled_ind)
    assert len(learner.labeled_ind) == len(train_ind) + 10
    assert acc1 >= acc0 - 2.0   # accuracy should not collapse; usually rises


def test_select_policies(setup):
    labels, W, model, vals, vecs = setup
    train_ind = gl.trainsets.generate(labels, rate=2, seed=3)
    learner = al.active_learner(
        model, al.unc_sampling(), train_ind, labels[train_ind])
    q_max = learner.select_queries(batch_size=3, policy="max")
    assert len(q_max) == 3
    assert np.intersect1d(q_max, learner.labeled_ind).size == 0
    np.random.seed(0)
    q_prop = learner.select_queries(batch_size=3, policy="prop")
    assert len(q_prop) == 3
    q_rand = learner.select_queries(batch_size=2, candidate_ind="rand",
                                    rand_frac=0.5)
    assert len(q_rand) == 2
    with pytest.raises(ValueError):
        learner.select_queries(candidate_ind="bogus")
