"""Tests for utils misc (samplers, mesh, patches, boundary statistic),
VAE embedding, and graph persistence/drawing."""

import os

import numpy as np
import pytest

import graphlearning_tpu as gl
from graphlearning_tpu import utils
from conftest import random_knn_csr


def test_rand_ball_inside():
    X = utils.rand_ball(200, 3)
    assert X.shape == (200, 3)
    assert np.all(np.linalg.norm(X, axis=1) <= 1.0 + 1e-12)


def test_rand_annulus_radii():
    X = utils.rand_annulus(200, 2, 0.5, 1.0)
    r = np.linalg.norm(X, axis=1)
    assert np.all(r >= 0.5 - 1e-12) and np.all(r <= 1.0 + 1e-12)


def test_bean_data_shape():
    X = utils.bean_data(300, 0.2)
    assert X.shape[1] == 2 and X.shape[0] > 0


def test_mesh_covers_points():
    rs = np.random.RandomState(0)
    X = rs.rand(50, 2)
    tri = utils.mesh(X)
    assert tri.ndim == 2 and tri.shape[1] == 3
    assert tri.max() < 50


def test_image_patches_roundtrip():
    rs = np.random.RandomState(0)
    img = rs.rand(32, 32)
    P = utils.image_to_patches(img, patch_size=(8, 8))
    assert P.shape == (16, 64)
    back = utils.patches_to_image(P, (32, 32), patch_size=(8, 8))
    np.testing.assert_allclose(back, img)


def test_boundary_statistic_detects_boundary():
    """Points near the square's boundary must score lower (distance-to-
    boundary estimator) than deep-interior points."""
    rs = np.random.RandomState(1)
    X = rs.rand(3000, 2)
    T = utils.boundary_statistic(X, r=0.15)
    d_true = np.minimum.reduce([X[:, 0], 1 - X[:, 0], X[:, 1], 1 - X[:, 1]])
    near = T[d_true < 0.02]
    deep = T[d_true > 0.3]
    assert near.mean() < deep.mean()


def test_labels_to_onehot():
    oh = utils.labels_to_onehot(np.array([0, 2, 1]), 3)
    np.testing.assert_array_equal(oh, np.eye(3)[[0, 2, 1]])


def test_sparse_max():
    import scipy.sparse as sp

    A = sp.csr_matrix(np.array([[0.0, 2.0], [1.0, 0.0]]))
    B = sp.csr_matrix(np.array([[1.0, 0.0], [0.5, 3.0]]))
    M = utils.sparse_max(A, B).toarray()
    np.testing.assert_array_equal(M, [[1.0, 2.0], [1.0, 3.0]])


def test_graph_save_load(tmp_path):
    W = random_knn_csr(100, 6, seed=0)
    G = gl.graph(W)
    path = str(tmp_path / "g.pkl")
    G.save(path)
    G2 = gl.graph.load(path)
    assert G2.num_nodes == 100
    np.testing.assert_allclose(
        G2.weight_matrix.toarray(), G.weight_matrix.toarray())


def test_graph_draw(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rs = np.random.RandomState(0)
    X = rs.rand(30, 2)
    W = gl.weightmatrix.knn(X, 4)
    G = gl.graph(W)
    out = G.draw(X=X, c=np.arange(30))
    assert out.shape == (30, 2)
    plt.close("all")


def test_vae_embedding_separates():
    rs = np.random.RandomState(0)
    A = np.abs(rs.randn(80, 30))
    B = np.abs(rs.randn(80, 30)) + 4.0
    X = np.vstack([A, B])
    Z = gl.weightmatrix.vae(X, layer_widths=(32, 4), epochs=15, seed=0)
    assert Z.shape == (160, 4)
    mA, mB = Z[:80].mean(0), Z[80:].mean(0)
    spread = 0.5 * (Z[:80].std() + Z[80:].std())
    assert np.linalg.norm(mA - mB) > spread
