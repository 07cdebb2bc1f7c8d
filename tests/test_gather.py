"""Degree-sorted segmented gather operator (ops/gather.py): the
band-hostile fast path (round-3 verdict item 1).  CPU-mesh parity: every
GatherAccel solver entry must reproduce the plain-XLA programs (the
operator only changes HOW the SpMM is computed)."""

import numpy as np
import jax.numpy as jnp
import pytest

import graphlearning_tpu as gl
from graphlearning_tpu.ops import accel as _accel
from graphlearning_tpu.ops.gather import GatherAccel, GatherSpMM


@pytest.fixture(scope="module")
def hubgraph():
    """Moderately high-dimensional kNN graph with hub-degree skew (the
    band-hostile family: 30-d model-benchmark surrogates)."""
    rs = np.random.RandomState(0)
    n, ncls, dim = 900, 3, 12
    centers = rs.randn(ncls, dim) * 1.6
    labels = rs.randint(0, ncls, n)
    X = centers[labels] + rs.randn(n, dim)
    W = gl.weightmatrix.knn(X, 8)
    train_ind = np.concatenate(
        [rs.choice(np.where(labels == c)[0], 5, replace=False)
         for c in range(ncls)])
    return W, labels, train_ind


def test_segmented_spmm_matches_scipy(hubgraph):
    W, _, _ = hubgraph
    n = W.shape[0]
    rs = np.random.RandomState(1)
    X = rs.randn(n, 7)
    gs = GatherSpMM(W, prec="f32")
    slots = sum((e - s) * kc for s, e, kc in gs.segs)
    assert slots < 1.5 * W.nnz          # bounded padding (vs kmax ELL)
    out = gs.from_perm(gs.spmm(gs.to_perm(jnp.asarray(X))))
    np.testing.assert_allclose(np.asarray(out), W @ X, atol=1e-8)
    # bf16 table mode: loose-precision but correct structure
    gb = GatherSpMM(W, prec="bf16")
    outb = gb.from_perm(gb.spmm(gb.to_perm(jnp.asarray(X))))
    ref = W @ X
    rel = np.max(np.abs(outb - ref)) / np.max(np.abs(ref))
    assert rel < 0.02, rel


def test_band_hostility_pregate():
    """A single high-dimensional blob (no cluster structure to order by)
    is band-hostile; a 2-d ring kNN graph is not.  (Small clustered
    graphs may pass the pre-gate — the full cost model still arbitrates
    for them.)"""
    rs = np.random.RandomState(7)
    Wh = gl.weightmatrix.knn(rs.randn(1500, 20), 8)
    assert _accel._band_hostile(Wh)
    rs = np.random.RandomState(2)
    t = np.sort(rs.rand(800) * 2 * np.pi)
    pts = np.stack([np.cos(t), np.sin(t)], 1) + 0.01 * rs.randn(800, 2)
    W2 = gl.weightmatrix.knn(pts, 6)
    assert not _accel._band_hostile(W2)


@pytest.fixture()
def force_gather(monkeypatch):
    """Make maybe_build run on CPU and take the gather branch (the real
    gate is TPU-only + band-hostility; the hub fixture IS hostile)."""
    monkeypatch.setattr(_accel, "enabled", lambda: True)
    monkeypatch.setattr(_accel, "_MIN_N", 1)
    monkeypatch.setattr(_accel, "_band_hostile", lambda W: True)
    yield


def _plain(model_cls, W, monkeypatch_none, *a, **kw):
    return model_cls(W, *a, **kw)


def test_models_through_gather_accel(hubgraph, force_gather, monkeypatch):
    """Model fits dispatched through GatherAccel reproduce the plain-XLA
    predictions (laplace, poisson CG/GD, randomwalk, MBO families,
    centered kernel, spectral eigendecomp)."""
    W, labels, train_ind = hubgraph

    acc = _accel.maybe_build(W.copy(), exact=True)
    assert isinstance(acc, GatherAccel)

    def pair(mk):
        m_acc = mk()
        pred_acc = m_acc.fit_predict(train_ind, labels[train_ind])
        assert any(isinstance(getattr(m_acc, a), GatherAccel)
                   for a in dir(m_acc) if a.startswith("_accel")), \
            "fit did not route through GatherAccel"
        monkeypatch.setattr(_accel, "enabled", lambda: False)
        try:
            m_ref = mk()
            pred_ref = m_ref.fit_predict(train_ind, labels[train_ind])
        finally:
            monkeypatch.setattr(_accel, "enabled", lambda: True)
        agree = np.mean(pred_acc == pred_ref)
        assert agree >= 0.99, (mk, agree)

    priors = gl.utils.class_priors(labels)
    pair(lambda: gl.ssl.laplace(W.copy(), tol=1e-8))
    pair(lambda: gl.ssl.poisson(W.copy(), tol=1e-8))
    pair(lambda: gl.ssl.poisson(W.copy(), solver="gradient_descent"))
    pair(lambda: gl.ssl.randomwalk(W.copy()))
    pair(lambda: gl.ssl.poisson_mbo(W.copy(), class_priors=priors, T=5))
    pair(lambda: gl.ssl.volume_mbo(W.copy(), class_priors=priors,
                                   temperature=0.0, max_iters=40))
    pair(lambda: gl.ssl.centered_kernel(W.copy()))


def test_eig_and_incres_through_gather_accel(hubgraph, force_gather,
                                             monkeypatch):
    W, labels, train_ind = hubgraph
    G = gl.graph(W.copy())
    vals_acc, vecs_acc = G.eigen_decomp(normalization="normalized", k=5)
    assert isinstance(getattr(G, "_accel_eig", None), GatherAccel)
    monkeypatch.setattr(_accel, "enabled", lambda: False)
    vals_ref, _ = gl.graph(W.copy()).eigen_decomp(
        normalization="normalized", k=5)
    np.testing.assert_allclose(np.asarray(vals_acc)[:5],
                               np.asarray(vals_ref)[:5], atol=1e-4)

    monkeypatch.setattr(_accel, "enabled", lambda: True)
    acc_cl = gl.clustering.incres(W.copy(), num_clusters=3, T=30, seed=0)
    pred = acc_cl.fit_predict()
    assert isinstance(getattr(acc_cl, "_accel_incres", None), GatherAccel)
    acc_pct = gl.clustering.clustering_accuracy(pred, labels)
    assert acc_pct > 70.0, acc_pct


def test_gather_bellman_ford_parity(hubgraph):
    """GatherAccel.bellman_ford (segmented min-plus) matches the plain
    Bellman-Ford distances and closest points — the Voronoi-init path
    volume_mbo rides on band-hostile graphs (config-4b regression fix)."""
    from graphlearning_tpu.solvers import eikonal as _eik

    W, labels, train_ind = hubgraph
    g = gl.SparseGraph.from_scipy(W)
    acc = GatherAccel(W, prec="f32")
    d_ref, cp_ref = _eik.dijkstra(g, train_ind[:6], bdy_val=0.0, f=1.0,
                                  return_cp=True)
    d_acc, cp_acc = acc.bellman_ford(
        np.where(np.isin(np.arange(W.shape[0]), train_ind[:6]), 0.0,
                 1e30).astype(np.float32), np.ones(W.shape[0], np.float32))
    d_acc = np.asarray(d_acc, float)
    np.testing.assert_allclose(d_acc, d_ref, atol=1e-5)
    assert np.mean(np.asarray(cp_acc) == cp_ref) > 0.99   # tie-breaks

    h_ref = _eik.dijkstra_hl(g, train_ind[:6], bdy_val=0.0, f=1.0)
    h_acc, _ = acc.bellman_ford(
        np.where(np.isin(np.arange(W.shape[0]), train_ind[:6]), 0.0,
                 1e30).astype(np.float32), np.ones(W.shape[0], np.float32),
        hopf_lax=True)
    np.testing.assert_allclose(np.asarray(h_acc, float), h_ref, atol=1e-5)


def test_hilbert_candidate_in_accel(monkeypatch):
    """weightmatrix.knn attaches low-dim point coordinates; AccelSpMM
    considers the Hilbert-curve ordering candidate and its banded SpMM
    stays exact (round-4 item 6 reaching the MODEL path)."""
    from graphlearning_tpu.ops.accel import (AccelSpMM, hilbert_order_2d,
                                             _band_hostile)

    rs = np.random.RandomState(3)
    n = 8192
    pts = rs.rand(n, 2)
    W = gl.weightmatrix.knn(pts, 8)
    assert getattr(W, "_glt_points", None) is not None
    acc = AccelSpMM(W, exact=True, interpret=True)
    X = rs.randn(n, 4)
    out = acc.from_perm(acc.spmm(acc.to_perm(jnp.asarray(X, jnp.float32))))
    ref = W @ X
    assert np.max(np.abs(np.asarray(out) - ref)) / np.max(np.abs(ref)) < 1e-5
    # the hilbert ordering must at least be a valid permutation here
    o = hilbert_order_2d(pts)
    assert sorted(o.tolist()) == list(range(n))


def test_morton_3d_order():
    """3-D point clouds get the Morton curve candidate; SpMM stays exact
    through whatever ordering the cost model picks."""
    from graphlearning_tpu.ops.accel import AccelSpMM, morton_order_3d

    rs = np.random.RandomState(5)
    n = 8192
    pts = rs.rand(n, 3)
    o = morton_order_3d(pts)
    assert sorted(o.tolist()) == list(range(n))
    W = gl.weightmatrix.knn(pts, 8)
    acc = AccelSpMM(W, exact=True, interpret=True)
    X = rs.randn(n, 4)
    out = acc.from_perm(acc.spmm(acc.to_perm(jnp.asarray(X, jnp.float32))))
    ref = W @ X
    assert np.max(np.abs(np.asarray(out) - ref)) / np.max(np.abs(ref)) < 1e-5
