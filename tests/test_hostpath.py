"""Host small-graph fast path (native/hostpath.py): when the backend is a
remote TPU and the graph is tiny, fits route to host oracles / direct
factorization — results must match the device path."""

import numpy as np
import pytest

import graphlearning_tpu as gl
from graphlearning_tpu import config as _config
from graphlearning_tpu.native import hostpath as _hp


@pytest.fixture(scope="module")
def moons():
    import sklearn.datasets as datasets

    X, labels = datasets.make_moons(n_samples=400, noise=0.1, random_state=0)
    W = gl.weightmatrix.knn(X, 10)
    rs = np.random.RandomState(1)
    train_ind = np.concatenate(
        [rs.choice(np.where(labels == c)[0], 5, replace=False)
         for c in (0, 1)])
    return W, X, labels, train_ind


def _force_tpu(monkeypatch):
    monkeypatch.setattr(_config, "is_tpu", lambda: True)
    monkeypatch.delenv("GLT_NO_HOSTPATH", raising=False)


def test_use_host_gating(monkeypatch):
    _force_tpu(monkeypatch)
    assert _hp.use_host(100)
    assert not _hp.use_host(10**6)
    monkeypatch.setenv("GLT_NO_HOSTPATH", "1")
    assert not _hp.use_host(100)
    monkeypatch.delenv("GLT_NO_HOSTPATH")
    monkeypatch.setattr(_config, "is_tpu", lambda: False)
    assert not _hp.use_host(100)     # CPU backend: device path IS the host


def test_laplace_host_matches_device(moons, monkeypatch):
    W, X, labels, train_ind = moons
    m_dev = gl.ssl.laplace(W, tol=1e-10)
    u_dev = m_dev.fit(train_ind, labels[train_ind])
    _force_tpu(monkeypatch)
    m_host = gl.ssl.laplace(W)
    u_host = m_host.fit(train_ind, labels[train_ind])
    np.testing.assert_allclose(u_host, u_dev, rtol=1e-5, atol=1e-7)
    # normalized + tau + order exercise the generalized operator
    for kw in ({"normalization": "normalized"}, {"tau": 0.1},
               {"order": 2}):
        monkeypatch.setattr(_config, "is_tpu", lambda: False)
        u_dev = gl.ssl.laplace(W, tol=1e-10, **kw).fit(train_ind,
                                                       labels[train_ind])
        monkeypatch.setattr(_config, "is_tpu", lambda: True)
        u_host = gl.ssl.laplace(W, **kw).fit(train_ind, labels[train_ind])
        np.testing.assert_allclose(u_host, u_dev, rtol=1e-4, atol=1e-6), kw


def test_distance_wrappers_host_match_device(moons, monkeypatch):
    W, X, labels, train_ind = moons
    G = gl.graph(W)
    d_dev = G.dijkstra([0, 7])
    u_dev = G.peikonal([0], tol=1e-8)
    p_dev = G.plaplace(train_ind, labels[train_ind].astype(float), p=8)
    a_dev = G.amle(train_ind, labels[train_ind].astype(float), tol=1e-7)
    _force_tpu(monkeypatch)
    G2 = gl.graph(W)
    np.testing.assert_allclose(G2.dijkstra([0, 7]), d_dev, rtol=1e-8)
    np.testing.assert_allclose(G2.peikonal([0], tol=1e-8), u_dev,
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        G2.plaplace(train_ind, labels[train_ind].astype(float), p=8),
        p_dev, rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(
        G2.amle(train_ind, labels[train_ind].astype(float), tol=1e-7),
        a_dev, rtol=1e-2, atol=1e-3)


def test_ssl_models_host_path_predictions(moons, monkeypatch):
    W, X, labels, train_ind = moons
    preds_dev = {}
    for name, m in (("plaplace", gl.ssl.plaplace(W, p=10)),
                    ("amle", gl.ssl.amle(W)),
                    ("peikonal", gl.ssl.peikonal(W))):
        preds_dev[name] = m.fit_predict(train_ind, labels[train_ind])
    _force_tpu(monkeypatch)
    for name, m in (("plaplace", gl.ssl.plaplace(W, p=10)),
                    ("amle", gl.ssl.amle(W)),
                    ("peikonal", gl.ssl.peikonal(W))):
        pred = m.fit_predict(train_ind, labels[train_ind])
        agree = np.mean(pred == preds_dev[name])
        assert agree > 0.97, (name, agree)
