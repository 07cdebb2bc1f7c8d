"""Parity tests: padded-ELL ops vs scipy reference semantics
(SURVEY.md §4: allclose on D^-1 W x, L x, CG iterates, ...)."""

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp
import pytest

from graphlearning_tpu.core.sparse import SparseGraph
from graphlearning_tpu import ops
from graphlearning_tpu.solvers.cg import conjgrad, constrained_solve
from graphlearning_tpu.solvers.pagerank import page_rank


def test_roundtrip(W_small):
    g = SparseGraph.from_scipy(W_small)
    W2 = g.to_scipy()
    assert (W_small != W2).nnz == 0


def test_spmm(W_small, rng):
    g = SparseGraph.from_scipy(W_small)
    X = rng.randn(W_small.shape[0], 7)
    np.testing.assert_allclose(np.asarray(ops.spmm(g, X)), W_small @ X, rtol=1e-12)
    x = rng.randn(W_small.shape[0])
    np.testing.assert_allclose(np.asarray(ops.spmm(g, x)), W_small @ x, rtol=1e-12)


def test_spmm_t(W_small, rng):
    # use an asymmetric matrix to actually exercise the transpose
    W = W_small.copy()
    W.data = W.data * (1 + 0.3 * rng.rand(len(W.data)))
    g = SparseGraph.from_scipy(W)
    X = rng.randn(W.shape[0], 3)
    np.testing.assert_allclose(np.asarray(ops.spmm_t(g, X)), W.T @ X, rtol=1e-12)


def test_degree_diag(W_small):
    g = SparseGraph.from_scipy(W_small)
    np.testing.assert_allclose(
        np.asarray(ops.degree_vector(g)), np.asarray(W_small.sum(1)).ravel(), rtol=1e-12
    )
    Wd = W_small.copy()
    Wd.setdiag(1.5)
    g2 = SparseGraph.from_scipy(Wd.tocsr())
    np.testing.assert_allclose(np.asarray(ops.diagonal(g2)), Wd.diagonal(), rtol=1e-12)


@pytest.mark.parametrize("norm", ["combinatorial", "randomwalk", "normalized"])
def test_laplacian_matvec(W_small, rng, norm):
    g = SparseGraph.from_scipy(W_small)
    n = W_small.shape[0]
    X = rng.randn(n, 4)
    d = np.asarray(W_small.sum(1)).ravel()
    I = sp.identity(n)
    if norm == "combinatorial":
        L = sp.spdiags(d, 0, n, n) - W_small
    elif norm == "randomwalk":
        L = I - sp.spdiags(1 / d, 0, n, n) @ W_small
    else:
        S = sp.spdiags(d**-0.5, 0, n, n)
        L = I - S @ W_small @ S
    np.testing.assert_allclose(
        np.asarray(ops.laplacian_matvec(g, X, norm)), L @ X, rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(ops.laplacian_diag(g, norm)), L.diagonal(), rtol=1e-10
    )


def test_gradient_divergence(W_small, rng):
    g = SparseGraph.from_scipy(W_small)
    n = W_small.shape[0]
    u = rng.randn(n)
    # device edge-field gradient row-sums match scipy sparse gradient row-sums
    Gref = sp.coo_matrix(W_small)
    gref = sp.coo_matrix(
        (Gref.data * (u[Gref.col] - u[Gref.row]), (Gref.row, Gref.col)), shape=(n, n)
    )
    E = ops.gradient(g, jnp.asarray(u), weighted=True, p=1.0)
    np.testing.assert_allclose(
        np.asarray(E.sum(axis=1)), np.asarray(gref.sum(axis=1)).ravel(), rtol=1e-10, atol=1e-12
    )
    # divergence of gradient = -2/2 * (L u) for weighted case:
    # div(grad u)_i = 1/2 sum_j w_ij(w_ij(u_j-u_i) - w_ij(u_i-u_j)) = sum_j w_ij^2 (u_j - u_i)
    mirror = ops.build_mirror(g)
    V = ops.gradient(g, jnp.asarray(u), weighted=False)
    div = ops.divergence(g, V, mirror=mirror, weighted=True, p=1.0)
    W2 = W_small  # w^1 weighting
    expected = W2 @ u - np.asarray(W2.sum(1)).ravel() * u
    np.testing.assert_allclose(np.asarray(div), expected, rtol=1e-9, atol=1e-12)


def test_infinity_laplacian(W_small, rng):
    g = SparseGraph.from_scipy(W_small)
    n = W_small.shape[0]
    u = rng.randn(n)
    W = sp.coo_matrix(W_small)
    vals = W.data * (u[W.col] - u[W.row])
    expected = np.zeros(n)
    for i in range(n):
        m = W.row == i
        expected[i] = vals[m].min() + vals[m].max()
    np.testing.assert_allclose(
        np.asarray(ops.infinity_laplacian(g, jnp.asarray(u))), expected, rtol=1e-10, atol=1e-12
    )


def test_conjgrad_vs_direct(W_small, rng):
    n = W_small.shape[0]
    d = np.asarray(W_small.sum(1)).ravel()
    L = sp.spdiags(d, 0, n, n) - W_small + 0.1 * sp.identity(n)  # SPD
    b = rng.randn(n, 3)
    g = SparseGraph.from_scipy(W_small)

    def A(X):
        return (jnp.asarray(d) + 0.1)[:, None] * X - ops.spmm(g, X)

    x, iters, res = conjgrad(A, jnp.asarray(b), tol=1e-12, max_iter=2000)
    from scipy.sparse.linalg import spsolve

    xref = spsolve(L.tocsc(), b)
    np.testing.assert_allclose(np.asarray(x), xref, rtol=1e-6, atol=1e-8)


def test_constrained_solve_matches_submatrix(W_small, rng):
    """Masked full-system CG == Schur-block solve (reference
    utils.py:321-384 semantics)."""
    n = W_small.shape[0]
    d = np.asarray(W_small.sum(1)).ravel()
    L = sp.spdiags(d, 0, n, n) - W_small
    bdy = np.zeros(n, dtype=bool)
    bdy[rng.choice(n, 20, replace=False)] = True
    gvals = np.zeros((n, 2))
    gvals[bdy] = rng.randn(bdy.sum(), 2)

    g = SparseGraph.from_scipy(W_small)

    def Lmv(X):
        return jnp.asarray(d)[:, None] * X - ops.spmm(g, X)

    u, _, _ = constrained_solve(
        Lmv, jnp.asarray(d), jnp.asarray(bdy), jnp.asarray(gvals), tol=1e-12, max_iter=5000
    )
    # scipy reference: submatrix solve
    from scipy.sparse.linalg import spsolve

    idx = ~bdy
    A = L[idx, :][:, idx]
    b = -L[idx, :][:, bdy] @ gvals[bdy]
    vref = spsolve(A.tocsc(), b)
    uref = gvals.copy()
    uref[idx] = vref
    np.testing.assert_allclose(np.asarray(u), uref, rtol=1e-6, atol=1e-8)


def test_page_rank(W_small):
    n = W_small.shape[0]
    u = page_rank(SparseGraph.from_scipy(W_small), alpha=0.85, tol=1e-12)
    d = np.asarray(W_small.sum(1)).ravel()
    P = W_small.T @ sp.spdiags(1 / d, 0, n, n)
    uref = np.ones(n) / n
    for _ in range(5000):
        unew = 0.85 * P @ uref + 0.15 / n
        if np.max(np.abs(unew - uref)) < 1e-14:
            break
        uref = unew
    np.testing.assert_allclose(np.asarray(u), uref, rtol=1e-8, atol=1e-10)


def test_from_knn():
    ind = np.array([[1, 2], [0, 2], [0, 1]])
    w = np.array([[0.5, 0.25], [0.5, 1.0], [0.25, 1.0]])
    g = SparseGraph.from_knn(ind, w)
    W = g.to_scipy()
    assert W[0, 1] == 0.5 and W[2, 1] == 1.0
