"""Sharded model execution (parallel/execute.py): every benchmark model
fits on the virtual 8-device CPU mesh via ``model.distribute(mesh)`` and
reproduces the unsharded predictions (VERDICT round-1 item 1; SURVEY.md
§7.1 item 4 / §7.2 step 6)."""

import numpy as np
import jax
import pytest

import graphlearning_tpu as gl
from graphlearning_tpu import parallel
from graphlearning_tpu.config import GLTConfig


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return parallel.make_mesh()


@pytest.fixture(scope="module")
def clusters():
    """3-class Gaussian-mixture kNN graph, n deliberately NOT a multiple
    of 8 (exercises mesh padding).  Cluster scale keeps the graph
    CONNECTED — a disconnected graph makes the normalized Laplacian
    singular and the Poisson CG ill-posed (reference behaves the same)."""
    rs = np.random.RandomState(0)
    n, ncls = 603, 3
    centers = rs.randn(ncls, 5) * 1.8
    labels = rs.randint(0, ncls, n)
    X = centers[labels] + rs.randn(n, 5)
    W = gl.weightmatrix.knn(X, 10)
    from scipy.sparse.csgraph import connected_components

    assert connected_components(W, directed=False)[0] == 1
    train_ind = np.concatenate(
        [rs.choice(np.where(labels == c)[0], 5, replace=False)
         for c in range(ncls)])
    return W, labels, train_ind


def _check(model_sh, model_ref, train_ind, labels, min_agree=0.99):
    pred_ref = model_ref.fit_predict(train_ind, labels[train_ind])
    pred_sh = model_sh.fit_predict(train_ind, labels[train_ind])
    agree = np.mean(pred_sh == pred_ref)
    assert agree >= min_agree, agree
    acc = gl.ssl.ssl_accuracy(pred_sh, labels, train_ind)
    assert acc > 80.0, acc
    return pred_sh


def test_laplace_sharded(mesh, clusters):
    W, labels, train_ind = clusters
    _check(gl.ssl.laplace(W).distribute(mesh), gl.ssl.laplace(W),
           train_ind, labels)
    # prob parity too (same solver math up to reduction order)
    m_sh = gl.ssl.laplace(W, tol=1e-10).distribute(mesh)
    m_ref = gl.ssl.laplace(W, tol=1e-10)
    u_sh = m_sh.fit(train_ind, labels[train_ind])
    u_ref = m_ref.fit(train_ind, labels[train_ind])
    np.testing.assert_allclose(u_sh, u_ref, rtol=1e-5, atol=1e-7)


def test_laplace_sharded_normalized_and_reweighted(mesh, clusters):
    W, labels, train_ind = clusters
    _check(gl.ssl.laplace(W, normalization="normalized").distribute(mesh),
           gl.ssl.laplace(W, normalization="normalized"), train_ind, labels)
    _check(gl.ssl.laplace(W, reweighting="wnll").distribute(mesh),
           gl.ssl.laplace(W, reweighting="wnll"), train_ind, labels)


def test_poisson_cg_sharded(mesh, clusters):
    W, labels, train_ind = clusters
    m_sh = gl.ssl.poisson(W, tol=1e-8).distribute(mesh)
    m_ref = gl.ssl.poisson(W, tol=1e-8)
    _check(m_sh, m_ref, train_ind, labels)
    np.testing.assert_allclose(m_sh.prob, m_ref.prob, rtol=1e-4, atol=1e-6)


def test_poisson_gd_sharded(mesh, clusters):
    W, labels, train_ind = clusters
    m_sh = gl.ssl.poisson(W, solver="gradient_descent").distribute(mesh)
    m_ref = gl.ssl.poisson(W, solver="gradient_descent")
    _check(m_sh, m_ref, train_ind, labels)
    # identical iteration counts (same mixing-time stop on the true n)
    np.testing.assert_allclose(m_sh.prob, m_ref.prob, rtol=1e-6, atol=1e-9)


def test_poisson_mbo_sharded(mesh, clusters):
    W, labels, train_ind = clusters
    priors = gl.utils.class_priors(labels)
    m_sh = gl.ssl.poisson_mbo(W, class_priors=priors, T=5).distribute(mesh)
    m_ref = gl.ssl.poisson_mbo(W, class_priors=priors, T=5)
    _check(m_sh, m_ref, train_ind, labels)


def test_volume_mbo_sharded(mesh, clusters):
    W, labels, train_ind = clusters
    priors = gl.utils.class_priors(labels)
    m_sh = gl.ssl.volume_mbo(W, class_priors=priors).distribute(mesh)
    m_ref = gl.ssl.volume_mbo(W, class_priors=priors)
    _check(m_sh, m_ref, train_ind, labels, min_agree=0.98)


def test_plaplace_amle_sharded(mesh, clusters):
    W, labels, train_ind = clusters
    _check(gl.ssl.plaplace(W, p=10).distribute(mesh),
           gl.ssl.plaplace(W, p=10), train_ind, labels)
    _check(gl.ssl.amle(W, weighted=True).distribute(mesh),
           gl.ssl.amle(W, weighted=True), train_ind, labels)


def test_distribute_via_config(mesh, clusters):
    """One GLTConfig drives the sharded path (SURVEY.md §5 config system)."""
    W, labels, train_ind = clusters
    cfg = GLTConfig(mesh_shape=(8,), mesh_axes=("nodes",))
    m = gl.ssl.poisson(W).distribute(cfg)
    assert m._dist.P == 8
    pred = m.fit_predict(train_ind, labels[train_ind])
    assert gl.ssl.ssl_accuracy(pred, labels, train_ind) > 80.0
    # distribute(None) disables
    m.distribute(None)
    assert m._dist is None


def test_sharded_trials_runner(mesh, clusters, tmp_path):
    """ssl_trials works end-to-end on a distributed model."""
    import graphlearning_tpu.ssl as sslm

    W, labels, train_ind = clusters
    old = sslm.results_dir
    sslm.results_dir = str(tmp_path)
    try:
        model = gl.ssl.poisson(W).distribute(mesh)
        res = model.ssl_trials([train_ind, np.roll(train_ind, 1)], labels,
                               overwrite=True)
        assert res.shape == (2, 2) and res[:, 1].min() > 80.0
    finally:
        sslm.results_dir = old


@pytest.mark.parametrize("method", ["NgJordanWeiss", "combinatorial"])
def test_spectral_clustering_sharded(mesh, clusters, method):
    """Sharded LOBPCG eigensolver (parallel/execute.eigen_decomp_sharded):
    spectral clustering over the mesh matches the unsharded clustering."""
    W, labels, train_ind = clusters
    ref = gl.clustering.spectral(W, num_clusters=3, method=method)
    sh = gl.clustering.spectral(W, num_clusters=3,
                                method=method).distribute(mesh)
    pred_ref = ref.fit_predict()
    pred_sh = sh.fit_predict()
    acc_ref = gl.clustering.clustering_accuracy(pred_ref, labels)
    acc_sh = gl.clustering.clustering_accuracy(pred_sh, labels)
    assert abs(acc_ref - acc_sh) < 2.0, (acc_ref, acc_sh)
    assert acc_sh > 85.0, acc_sh


def test_eigen_decomp_sharded_values(mesh, clusters):
    """Sharded eigenvalues match the single-device eigensolver."""
    from graphlearning_tpu.parallel import execute as _exec

    W, _, _ = clusters
    dist = _exec.Distributor(mesh)
    vals_sh, vecs_sh = _exec.eigen_decomp_sharded(
        dist, W, normalization="normalized", k=4)
    g = gl.graph(W)
    vals_ref, vecs_ref = g.eigen_decomp(normalization="normalized", k=4)
    assert np.allclose(np.asarray(vals_sh), np.asarray(vals_ref)[:4],
                       atol=1e-4), (vals_sh, vals_ref)
    assert vecs_sh.shape[0] == W.shape[0]
