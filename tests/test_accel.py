"""Tests for the RCM-accelerated SpMM context (ops/accel.py).

Run in Pallas interpret mode on CPU; on real TPUs the same code path is
engaged automatically by the CG solvers (poisson/laplace/randomwalk)."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

import graphlearning_tpu as gl
from graphlearning_tpu.ops.accel import AccelSpMM


@pytest.fixture(scope="module")
def knn_W():
    rs = np.random.RandomState(0)
    X = rs.rand(900, 2)
    return gl.weightmatrix.knn(X, 10), X


def test_accel_spmm_roundtrip(knn_W):
    W, _ = knn_W
    acc = AccelSpMM(W, interpret=True)
    rs = np.random.RandomState(1)
    X = rs.randn(W.shape[0], 8).astype(np.float32)
    out = acc.from_perm(acc.spmm(acc.to_perm(X)))
    ref = W @ X.astype(np.float64)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_accel_laplacian_matvec(knn_W):
    W, _ = knn_W
    acc = AccelSpMM(W, interpret=True)
    from graphlearning_tpu.core.sparse import SparseGraph
    from graphlearning_tpu.ops import graphops as ops

    g = SparseGraph.from_scipy(W)
    deg_p = acc.to_perm(ops.degree_vector(g).astype(jnp.float32))
    rs = np.random.RandomState(2)
    X = rs.randn(W.shape[0], 4).astype(np.float32)
    for norm in ("combinatorial", "randomwalk", "normalized"):
        mv = acc.laplacian_matvec(norm, deg_p)
        out = acc.from_perm(mv(acc.to_perm(X)))
        ref = np.asarray(ops.laplacian_matvec(g, jnp.asarray(X, jnp.float64),
                                              normalization=norm))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-4)


def test_poisson_accel_path_matches_plain(knn_W, monkeypatch):
    """Force the accel path on (interpret mode, low threshold): predictions
    must match the plain XLA path."""
    W, X = knn_W
    labels = (X[:, 0] > 0.5).astype(int)
    train_ind = gl.trainsets.generate(labels, rate=10, seed=0)

    from graphlearning_tpu.ops import accel as accel_mod

    monkeypatch.setattr(accel_mod, "_MIN_N", 1)
    monkeypatch.setattr(accel_mod, "enabled", lambda: True)
    monkeypatch.setenv("GLT_ACCEL_INTERPRET", "1")
    pred_acc = gl.ssl.poisson(W).fit_predict(train_ind, labels[train_ind])

    monkeypatch.setattr(accel_mod, "enabled", lambda: False)
    pred_plain = gl.ssl.poisson(W).fit_predict(train_ind, labels[train_ind])
    assert np.mean(pred_acc == pred_plain) > 0.995


def test_laplace_accel_path_matches_plain(knn_W, monkeypatch):
    W, X = knn_W
    labels = (X[:, 1] > 0.5).astype(int)
    train_ind = gl.trainsets.generate(labels, rate=10, seed=1)

    from graphlearning_tpu.ops import accel as accel_mod

    monkeypatch.setattr(accel_mod, "_MIN_N", 1)
    monkeypatch.setattr(accel_mod, "enabled", lambda: True)
    monkeypatch.setenv("GLT_ACCEL_INTERPRET", "1")
    for norm in ("combinatorial", "normalized"):
        pred_acc = gl.ssl.laplace(W, normalization=norm).fit_predict(
            train_ind, labels[train_ind])
        monkeypatch.setattr(accel_mod, "enabled", lambda: False)
        pred_plain = gl.ssl.laplace(W, normalization=norm).fit_predict(
            train_ind, labels[train_ind])
        monkeypatch.setattr(accel_mod, "enabled", lambda: True)
        assert np.mean(pred_acc == pred_plain) > 0.995


def test_randomwalk_accel_path_matches_plain(knn_W, monkeypatch):
    W, X = knn_W
    labels = (X[:, 0] + X[:, 1] > 1.0).astype(int)
    train_ind = gl.trainsets.generate(labels, rate=10, seed=2)

    from graphlearning_tpu.ops import accel as accel_mod

    monkeypatch.setattr(accel_mod, "_MIN_N", 1)
    monkeypatch.setattr(accel_mod, "enabled", lambda: True)
    monkeypatch.setenv("GLT_ACCEL_INTERPRET", "1")
    pred_acc = gl.ssl.randomwalk(W).fit_predict(train_ind, labels[train_ind])
    monkeypatch.setattr(accel_mod, "enabled", lambda: False)
    pred_plain = gl.ssl.randomwalk(W).fit_predict(train_ind,
                                                  labels[train_ind])
    assert np.mean(pred_acc == pred_plain) > 0.995
