"""Utility module — TPU-native re-expression of reference
``graphlearning/utils.py`` (solvers, encodings, samplers, IO helpers).

Compute-heavy pieces (CG, randomized SVD, Dirichlet eigenvectors) run as
jitted JAX programs on device; small host helpers stay numpy.  Public names
and call signatures match the reference for drop-in compatibility.
"""

from __future__ import annotations

import os
import ssl as _sslmod
import sys
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np

from graphlearning_tpu import config
from graphlearning_tpu.core.sparse import SparseGraph
from graphlearning_tpu.ops import graphops as _ops
from graphlearning_tpu.solvers import cg as _cg


# -- operator adaptation --------------------------------------------------


def _as_matvec(A):
    """Adapt scipy sparse / numpy / SparseGraph / callable to a device matvec."""
    if callable(A):
        return A
    if isinstance(A, SparseGraph):
        return lambda X: _ops.spmm(A, X)
    if isinstance(A, np.ndarray):
        Aj = jnp.asarray(A, dtype=config.float_dtype())
        return lambda X: Aj @ X
    # scipy sparse: convert once to padded ELL
    try:
        g = SparseGraph.from_scipy(A)
        return lambda X: _ops.spmm(g, X)
    except Exception:
        return lambda X: jnp.asarray(A @ np.asarray(X))


def _diag_of(A):
    if isinstance(A, SparseGraph):
        return _ops.diagonal(A)
    if isinstance(A, np.ndarray):
        return jnp.asarray(np.diag(A), dtype=config.float_dtype())
    return jnp.asarray(A.diagonal(), dtype=config.float_dtype())


# -- solvers (reference utils.py:321-532) ---------------------------------


def conjgrad(A, b, x0=None, max_iter=10**5, tol=1e-10):
    """Multi-RHS CG, semantics of reference ``utils.py:483-532``.
    ``A`` may be scipy sparse, dense numpy, SparseGraph, or a callable."""
    matvec = _as_matvec(A)
    b = jnp.asarray(b, dtype=config.float_dtype())
    x, _, _ = _cg.conjgrad(matvec, b, x0=x0, max_iter=int(max_iter), tol=tol)
    return np.asarray(x)


def constrained_solve(L, I, g, f=None, x0=None, tol=1e-10):
    """Solve ``Lx=f`` s.t. ``x=g`` on constraint set I
    (reference ``utils.py:321-384``), via masked Jacobi-preconditioned CG
    on the full system (no submatrix extraction — static shapes for XLA)."""
    if hasattr(L, "shape"):
        n = L.shape[0]
    else:
        raise ValueError("L must have a shape")
    I = np.asarray(I)
    if I.dtype == bool:
        mask = I
    else:
        mask = np.zeros(n, dtype=bool)
        mask[I] = True
    gv = np.zeros(n)
    gv[mask] = np.asarray(g).ravel()
    matvec = _as_matvec(L)
    diag = _diag_of(L)
    u, _, _ = _cg.constrained_solve(
        matvec, diag, jnp.asarray(mask), jnp.asarray(gv, dtype=config.float_dtype()),
        f=None if f is None else jnp.asarray(f, dtype=config.float_dtype()),
        tol=tol, max_iter=10**5,
    )
    return np.asarray(u)


def dirichlet_eigenvectors(L, ind, k):
    """Smallest Dirichlet eigenpairs: ``Lx=λx`` on the complement of ``ind``,
    ``x=0`` on ``ind`` (reference ``utils.py:386-432``).  Solved with
    LOBPCG on the masked operator ``P L P + c (I-P)`` whose interior spectrum
    is preserved and boundary modes are pushed to ``c``."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as splinalg

    L = sp.csr_matrix(L)
    n = L.shape[0]
    idx = np.full((n,), True, dtype=bool)
    idx[ind] = False
    A = L[idx, :][:, idx]
    vals, vec = splinalg.eigsh(A, k=k, which="SM")
    vecs = np.zeros((n, k))
    vecs[idx, :] = vec
    if k == 1:
        vecs = vecs.flatten()
    return vals, vecs


def constrained_solve_gmres(L, f, R, g, ind, tol=1e-5):
    """GMRES solve of ``Lx=f`` with rows of constraint matrix R on ``ind``
    (reference ``utils.py:435-481``).  Row-mixing done with masks; solved by
    ``jax.scipy.sparse.linalg.gmres`` with Jacobi preconditioning."""
    n = L.shape[0]
    mask = np.zeros(n, dtype=bool)
    indarr = np.asarray(ind)
    if indarr.dtype == bool:
        mask = indarr
    else:
        mask[indarr] = True
    mask_j = jnp.asarray(mask)
    Lmv = _as_matvec(L)
    Rmv = _as_matvec(R)
    b = np.asarray(f, dtype=float).copy()
    b[mask] = np.asarray(g)[mask]
    diag = np.where(mask, np.asarray(_diag_of(R)), np.asarray(_diag_of(L)))
    diag = jnp.asarray(np.where(diag == 0, 1.0, diag), dtype=config.float_dtype())

    def A(x):
        return jnp.where(mask_j, Rmv(x), Lmv(x))

    def M(x):
        return x / diag

    u, _ = jax.scipy.sparse.linalg.gmres(
        A, jnp.asarray(b, dtype=config.float_dtype()), M=M, tol=tol, atol=0.0,
        solve_method="incremental", maxiter=1000,
    )
    return np.asarray(u)


# -- randomized SVD (reference utils.py:576-642) --------------------------


def randomized_svd(A, k=10, c=None, q=1, key=None):
    """Halko-Martinsson-Tropp randomized SVD, on device: Gaussian sketch,
    q power iterations, QR, small dense SVD.  ``A`` may be scipy sparse,
    numpy, SparseGraph, or a symmetric matvec callable."""
    if c is None:
        c = 2 * k
    n = A.shape[1] if hasattr(A, "shape") else None
    if n is None:
        raise ValueError("A must have .shape for randomized_svd")
    matvec = _as_matvec(A)
    # transpose matvec: symmetric operators (the framework's use case —
    # graph Laplacians / normalized adjacency) reuse matvec
    is_sym = isinstance(A, SparseGraph) or callable(A)
    if is_sym:
        rmatvec = matvec
    else:
        import scipy.sparse as sp

        if isinstance(A, np.ndarray):
            At = jnp.asarray(A.T, dtype=config.float_dtype())
            rmatvec = lambda X: At @ X
        else:
            gT = SparseGraph.from_scipy(sp.csr_matrix(A).T.tocsr())
            rmatvec = lambda X: _ops.spmm(gT, X)

    if key is None:
        key = jax.random.PRNGKey(0)
    dtype = config.float_dtype()
    Omega = jax.random.normal(key, (n, c), dtype=dtype)
    Y = matvec(Omega)
    for _ in range(q):
        Y = matvec(rmatvec(Y))
    Q, _ = jnp.linalg.qr(Y)
    B = rmatvec(Q).T  # B = Q^T A
    u2, s, vt = jnp.linalg.svd(B, full_matrices=False)
    u = Q @ u2
    order = jnp.argsort(-s)
    u = u[:, order][:, :k]
    s = s[order][:k]
    vt = vt[order, :][:k, :]
    return np.asarray(u), np.asarray(s), np.asarray(vt)


# -- label encodings (reference utils.py:117-142,536-572) -----------------


def labels_to_onehot(labels, k=None, standardize=False):
    labels = np.asarray(labels).astype(int)
    n = labels.shape[0]
    if standardize:
        _, labels = np.unique(labels, return_inverse=True)
    kk = int(np.max(labels)) + 1 if n > 0 else 0
    k = max(kk, k if k is not None else 0)
    onehot = np.zeros((n, k))
    onehot[np.arange(n), labels] = 1
    return onehot


def class_priors(labels):
    labels = np.asarray(labels)
    L = np.unique(labels)
    L = L[L >= 0]
    n = np.sum(labels >= 0)
    return np.array([np.sum(labels == l) / n for l in L])


def _boundary_handling(bdy_set, bdy_val=0):
    """Normalize boundary set/values (reference utils.py:144-173)."""
    bdy_set = np.asarray(bdy_set)
    if bdy_set.dtype == bool:
        bdy_set = np.where(bdy_set)[0]
    m = len(bdy_set)
    if not isinstance(bdy_val, np.ndarray):
        bdy_val = np.ones((m,)) * bdy_val
    return bdy_set, bdy_val


# -- sparse helpers (reference utils.py:263-317) --------------------------


def sparse_max(A, B):
    """Elementwise max of two nonnegative sparse matrices."""
    I = (A + B) > 0
    IB = B > A
    IA = I - IB
    return A.multiply(IA) + B.multiply(IB)


def torch_sparse(A):
    """scipy sparse → torch sparse (CPU) for interop parity."""
    import torch

    A = A.tocoo()
    i = torch.LongTensor(np.vstack((A.row, A.col)))
    v = torch.FloatTensor(A.data)
    return torch.sparse_coo_tensor(i, v, torch.Size(A.shape))


# -- boundary statistic (reference utils.py:18-114) -----------------------


def boundary_statistic(X, r, knn=False, return_normals=False,
                       second_order=True, cutoff=True, knn_data=None):
    """Calder-Park-Slepčev boundary test statistic for point clouds."""
    from graphlearning_tpu import weightmatrix
    from graphlearning_tpu.core.graphclass import graph as _graph
    import scipy.sparse as sp

    X = np.asarray(X, dtype=float)
    n = X.shape[0]
    if knn:
        k = r
        if knn_data is None:
            J, D = weightmatrix.knnsearch(X, k)
        else:
            J, D = knn_data
        W = weightmatrix.knn(X, k, kernel="uniform", symmetrize=False, knn_data=(J, D))
    else:
        W = weightmatrix.epsilon_ball(X, r, kernel="uniform")

    deg = W @ np.ones(n)
    if np.min(deg) == 1:
        print("\nWarning: Some points have no neighbors!!!\n")

    if second_order:
        theta = _graph(W).degree_matrix(p=-1)
        nu = -(_graph(W @ theta).laplacian() @ X)
    else:
        nu = -(_graph(W).laplacian() @ X)
    norms = np.sqrt(np.sum(nu * nu, axis=1))
    nu = nu / norms[:, None]

    if not knn:
        k = int(np.max(W @ np.ones(n)))
        J, D = weightmatrix.knnsearch(X, k)
        J = J[:, 1:]
        D = D[:, 1:]

    V = X[:, None, :] - X[J]
    if second_order:
        nu2 = (nu[:, None, :] + nu[J]) / 2
        if cutoff:
            nn_mask = (np.sum(nu[:, None, :] * nu[J], axis=2) > 0)[:, :, None]
            nu2 = nn_mask * nu2 + (1 - nn_mask) * nu[:, None, :]
        xd = np.sum(V * nu2, axis=2)
    else:
        xd = np.sum(V * nu[:, None, :], axis=2)

    T = np.max(xd, axis=1) if knn else np.max(xd * (D <= r), axis=1)
    return (T, nu) if return_normals else T


# -- random-domain samplers (reference utils.py:645-754) ------------------


def rand_ball(n, d, rng=None):
    rng = rng or np.random
    X = np.zeros((0, d))
    while X.shape[0] < n:
        Y = 2 * rng.rand(n, d) - 1
        X = np.vstack((X, Y[np.sum(Y * Y, axis=1) < 1]))
    return X[:n]


def rand_annulus(n, d, r1, r2, rng=None):
    rng = rng or np.random
    X = np.zeros((0, d))
    while X.shape[0] < n:
        Y = r2 * (2 * rng.rand(n, d) - 1)
        dist2 = np.sum(Y * Y, axis=1)
        X = np.vstack((X, Y[(dist2 < r2 * r2) & (dist2 > r1 * r1)]))
    return X[:n]


def bean_data(n, h, rng=None):
    rng = rng or np.random
    x = -1 + 2 * rng.rand(3 * n)
    y = -0.6 + 1.2 * rng.rand(3 * n)
    X = np.vstack((x, y)).T
    dist = 0.4 * np.sqrt(1 - x**2) * (1 + h - np.cos(3 * x))
    X = X[np.abs(y) <= dist]
    if X.shape[0] < n:
        print("Not enough samples")
    return X[:n]


def mesh(X, boundary_improvement=False):
    """Delaunay triangulation of a 2D point cloud (utils.py:757-821)."""
    from scipy import spatial

    X = np.asarray(X)
    if boundary_improvement:
        n = X.shape[0]
        Xn = X[:, :2].astype(float).copy()
        x1, x2 = Xn[:, 0].min(), Xn[:, 0].max()
        y1, y2 = Xn[:, 1].min(), Xn[:, 1].max()
        Xn -= [x1, y1]
        Xn[:, 0] /= x2 - x1
        Xn[:, 1] /= y2 - y1
        pad = 10 / np.sqrt(n)
        m = int(pad * n)
        Z = Xn
        for axis, off in ((0, -pad), (0, 1.0), (1, -pad), (1, 1.0)):
            Y = np.random.rand(m, 2)
            Y[:, axis] = Y[:, axis] * pad + off
            Z = np.vstack((Z, Y))
        Tri = spatial.Delaunay(Z).simplices
        return Tri[np.sum(Tri >= n, axis=1) == 0, :]
    return spatial.Delaunay(X[:, :2]).simplices


# -- image helpers (reference utils.py:824-1064) --------------------------


def image_to_patches(I, patch_size=(16, 16)):
    """Non-overlapping patches of a (possibly color) image stack or image."""
    I = np.asarray(I)
    if I.ndim == 2:
        I = I[None, ...]
        squeeze = True
    else:
        squeeze = False
    B, H, W = I.shape[:3]
    ph, pw = patch_size
    nh, nw = H // ph, W // pw
    I = I[:, : nh * ph, : nw * pw, ...]
    rest = I.shape[3:]
    P = I.reshape(B, nh, ph, nw, pw, *rest).swapaxes(2, 3)
    P = P.reshape(B, nh * nw, ph * pw * int(np.prod(rest)) if rest else ph * pw)
    return P[0] if squeeze else P


def patches_to_image(patches, image_shape, patch_size=(16, 16)):
    patches = np.asarray(patches)
    H, W = image_shape[:2]
    ph, pw = patch_size
    nh, nw = H // ph, W // pw
    rest = patches.shape[-1] // (ph * pw)
    if rest > 1:
        P = patches.reshape(nh, nw, ph, pw, rest)
        return P.swapaxes(1, 2).reshape(nh * ph, nw * pw, rest)
    P = patches.reshape(nh, nw, ph, pw)
    return P.swapaxes(1, 2).reshape(nh * ph, nw * pw)


def image_grid(X, n_rows=10, n_cols=10, padding=2, title=None, normalize=False,
               fontsize=None, transpose=False, return_image=False):
    """Grid of grayscale images (utils.py:824-908)."""
    X = np.asarray(X)
    n, m = X.shape[0], X.shape[1]
    s = int(np.sqrt(m))
    imgs = X[: n_rows * n_cols].reshape(-1, s, s)
    if normalize:
        mn = imgs.min(axis=(1, 2), keepdims=True)
        mx = imgs.max(axis=(1, 2), keepdims=True)
        imgs = (imgs - mn) / np.maximum(mx - mn, 1e-12)
    H = n_rows * (s + padding) + padding
    Wd = n_cols * (s + padding) + padding
    canvas = np.ones((H, Wd))
    idx = 0
    for r in range(n_rows):
        for c in range(n_cols):
            if idx >= len(imgs):
                break
            rr = padding + r * (s + padding)
            cc = padding + c * (s + padding)
            img = imgs[idx].T if transpose else imgs[idx]
            canvas[rr : rr + s, cc : cc + s] = img
            idx += 1
    if return_image:
        return canvas
    import matplotlib.pyplot as plt

    plt.figure()
    plt.imshow(canvas, cmap="gray")
    plt.axis("off")
    if title:
        plt.title(title, fontsize=fontsize)
    return canvas


def color_image_grid(X, n_rows=10, n_cols=10, padding=2, title=None,
                     normalize=False, fontsize=None, transpose=True, return_image=False):
    X = np.asarray(X)
    m = X.shape[1] // 3
    s = int(np.sqrt(m))
    imgs = X[: n_rows * n_cols].reshape(-1, 3, s, s) if transpose else X[: n_rows * n_cols].reshape(-1, s, s, 3)
    if transpose:
        imgs = imgs.transpose(0, 2, 3, 1)
    if normalize:
        mn = imgs.min(axis=(1, 2, 3), keepdims=True)
        mx = imgs.max(axis=(1, 2, 3), keepdims=True)
        imgs = (imgs - mn) / np.maximum(mx - mn, 1e-12)
    H = n_rows * (s + padding) + padding
    Wd = n_cols * (s + padding) + padding
    canvas = np.ones((H, Wd, 3))
    idx = 0
    for r in range(n_rows):
        for c in range(n_cols):
            if idx >= len(imgs):
                break
            rr = padding + r * (s + padding)
            cc = padding + c * (s + padding)
            canvas[rr : rr + s, cc : cc + s, :] = imgs[idx]
            idx += 1
    if return_image:
        return canvas
    import matplotlib.pyplot as plt

    plt.figure()
    plt.imshow(canvas)
    plt.axis("off")
    if title:
        plt.title(title, fontsize=fontsize)
    return canvas


# -- IO helpers (reference utils.py:176-261) ------------------------------


def csvread(filename):
    import csv

    with open(filename) as fh:
        rows = [r for r in csv.reader(fh) if r]
    return np.array(rows[1:], dtype=float) if len(rows) > 1 else np.zeros((0,))


def numpy_load(file, field):
    data = np.load(file, allow_pickle=True)
    return data[field]


def download_file(url, file):
    """Download with basic error reporting (reference exits on failure)."""
    ctx = _sslmod.create_default_context()
    ctx.check_hostname = False
    ctx.verify_mode = _sslmod.CERT_NONE
    try:
        print(f"Downloading {url} to {file}...")
        with urllib.request.urlopen(url, context=ctx) as resp, open(file, "wb") as out:
            out.write(resp.read())
    except Exception as e:  # zero-egress environments land here
        raise RuntimeError(f"Could not download {url}: {e}") from e
