"""Tests for ARS t-SNE (graphlearning_tpu/ars.py vs reference
c_code/tsne.cpp semantics)."""

import numpy as np
import jax.numpy as jnp

from graphlearning_tpu import ars as ars_mod
from graphlearning_tpu.core.graphclass import graph


def test_perplexity_calibration_entropy():
    """Calibrated rows must have Shannon entropy log(perplexity)
    (the defining equation of the bisection, tsne.cpp:536-588)."""
    rs = np.random.RandomState(0)
    d2 = rs.rand(50, 40) * 3.0
    perplexity = 12.0
    P = np.asarray(ars_mod._calibrate_perplexity(jnp.asarray(d2), perplexity))
    np.testing.assert_allclose(P.sum(1), 1.0, atol=1e-5)
    H = -(P * np.log(np.maximum(P, 1e-35))).sum(1)
    np.testing.assert_allclose(H, np.log(perplexity), atol=1e-3)


def test_ars_separates_clusters():
    """Two well-separated 10-D Gaussian blobs must stay separated in the
    2-D ARS embedding (cluster-mean distance >> mean intra spread)."""
    rs = np.random.RandomState(3)
    n_half = 100
    A = rs.randn(n_half, 10) * 0.3
    B = rs.randn(n_half, 10) * 0.3
    B[:, 0] += 10.0
    X = np.vstack([A, B])
    Y = graph.ars(X, perplexity=15, iters=250, num_early=60, use_pca=False,
                  init="pca", chunk=64)
    assert Y.shape == (2 * n_half, 2)
    mA, mB = Y[:n_half].mean(0), Y[n_half:].mean(0)
    spread = 0.5 * (np.linalg.norm(Y[:n_half] - mA, axis=1).mean()
                    + np.linalg.norm(Y[n_half:] - mB, axis=1).mean())
    assert np.linalg.norm(mA - mB) > 3.0 * spread


def test_ars_init_array_and_zero_mean():
    rs = np.random.RandomState(1)
    X = rs.randn(60, 5)
    Y0 = rs.randn(60, 2) * 1e-4
    Y = ars_mod.ars(X, perplexity=10, iters=20, num_early=5, init=Y0,
                    use_pca=False, chunk=30)
    # iterate keeps the embedding zero-mean (tsne.cpp zeroMean each step)
    np.testing.assert_allclose(Y.mean(0), 0.0, atol=1e-5)
