"""Eigensolver stack — device-native low-lying Laplacian spectra.

Replaces the reference's scipy ``splinalg.svds`` / ``eigsh`` Lanczos calls
(reference ``graph.py:623-806``) with:

* ``exact``  — LOBPCG (``jax.experimental.sparse.linalg.lobpcg_standard``)
  on the *shifted* operator ``sI - L``: its top-k eigenpairs are exactly the
  smallest-k of ``L``, with no singular-value sign ambiguity.  Every
  iteration is SpMM + small dense algebra → MXU-friendly.
* ``lowrank`` — randomized SVD (Halko-Martinsson-Tropp) on the normalized
  adjacency, matching reference semantics (``vals = 1 - s``).

The randomwalk normalization reuses the symmetric (normalized) eigenproblem
and maps eigenvectors back through ``D^{-1/2}`` (as the reference does,
``graph.py:726-765``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from graphlearning_tpu import config
from graphlearning_tpu.core.sparse import SparseGraph
from graphlearning_tpu.ops import graphops as _ops


def _lobpcg_topk(matvec, n, k, tol, key=None, m=200, dtype=None, power=1):
    """Top-k eigenpairs of a symmetric PSD operator via LOBPCG.

    ``power > 1`` runs LOBPCG on ``A^power``: a spectral filter that
    amplifies relative gaps at the top of the spectrum, which is what makes
    tiny low-lying Laplacian gaps (λ₂ ~ 1e-4 next to a 2.0 shift)
    resolvable in float32 on TPU.  Eigenvectors of A^p equal those of A;
    callers recover eigenvalues of A by Rayleigh quotients."""
    from jax.experimental.sparse.linalg import lobpcg_standard

    if key is None:
        key = jax.random.PRNGKey(0)
    dtype = dtype or config.float_dtype()
    X = jax.random.normal(key, (n, k), dtype=dtype)

    if power == 1:
        op = matvec
    else:
        def op(Y):
            # rolled (fori_loop) to keep the compiled program one matvec
            # body deep regardless of `power` (see ops/gather.py eig note)
            return jax.lax.fori_loop(0, power, lambda i, Z: matvec(Z), Y)

    theta, U, iters = lobpcg_standard(op, X, m=m, tol=tol if tol else None)
    return theta, U


def _rayleigh(matvec, U):
    """Per-column Rayleigh quotients u^T A u / u^T u."""
    AU = matvec(U)
    return jnp.sum(U * AU, axis=0) / jnp.sum(U * U, axis=0)


def power_iteration(matvec, n, num_iter=100, key=None, dtype=None):
    """Largest eigenvalue estimate (for spectral shifts)."""
    if key is None:
        key = jax.random.PRNGKey(1)
    dtype = dtype or config.float_dtype()
    v = jax.random.normal(key, (n,), dtype=dtype)
    v = v / jnp.linalg.norm(v)

    def body(i, v):
        w = matvec(v[:, None])[:, 0]
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    v = jax.lax.fori_loop(0, num_iter, body, v)
    lam = jnp.vdot(v, matvec(v[:, None])[:, 0])
    return lam, v


def _default_power(dtype):
    """Spectral-filter power for LOBPCG: 1 suffices in f64; f32 (TPU)
    needs gap amplification to resolve near-degenerate low modes."""
    return 1 if jnp.finfo(dtype).bits >= 64 else 8


def smallest_eigh(matvec, n, k, shift, tol=0, key=None, m=200, dtype=None):
    """Smallest-k eigenpairs of symmetric operator via LOBPCG on
    ``(shift*I - Op)^p`` (``shift`` must upper-bound the spectrum);
    eigenvalues recovered by Rayleigh quotients on the unpowered operator."""
    dtype = dtype or config.float_dtype()

    def A(X):
        return shift * X - matvec(X)

    theta, U = _lobpcg_topk(A, n, k, tol, key=key, m=m, dtype=dtype,
                            power=_default_power(dtype))
    vals = shift - _rayleigh(A, U)
    order = jnp.argsort(vals)
    return vals[order], U[:, order]


def eigen_decomp(g: SparseGraph, normalization="combinatorial", method="exact",
                 k=10, c=None, gamma=0, tol=0, q=1, spmm=None, accel=None):
    """Low-lying spectrum of the graph Laplacian (reference
    ``graph.py:623-806`` semantics: increasing eigenvalues, vectors as
    columns; randomwalk vecs are ``D^{-1/2}``-conjugated normalized vecs;
    modularity via ``gamma > 0``).

    ``spmm``: optional override for the ``W @ X`` product (eager-safe
    callers only).  ``accel``: optional AccelSpMM — the normalized /
    randomwalk 'exact' branch then runs LOBPCG through the jitted
    banded-kernel entry point (band passed as a jit argument, NOT a closure
    constant), and 'lowrank' builds its eager sketch products from it."""
    if c is None:
        c = 2 * k
    n = g.n
    deg = _ops.degree_vector(g)
    dtype = g.vals.dtype
    if spmm is None:
        spmm = lambda X: _ops.spmm(g, X)

    if gamma != 0:
        # modularity operator: L v + (gamma/m) (deg2 . v) deg1
        # (reference graph.py:771-799)
        if normalization == "randomwalk":
            p1, p2, lap_norm = 1.5, 0.5, "normalized"
        else:
            p1, p2, lap_norm = 1.0, 1.0, normalization
        deg1 = deg**p1
        deg2 = deg**p2
        mm = jnp.sum(deg) / 2
        if lap_norm == "combinatorial":
            lap_mv = lambda X: deg[:, None] * X - spmm(X)
        elif lap_norm == "normalized":
            sL = 1.0 / jnp.sqrt(deg)
            lap_mv = lambda X: X - sL[:, None] * spmm(sL[:, None] * X)
        else:
            lap_mv = lambda X: _ops.laplacian_matvec(g, X, lap_norm, deg=deg)

        def Mop(X):
            LX = lap_mv(X)
            return LX + (gamma / mm) * deg1[:, None] * (deg2[None, :] @ X)

        lmax, _ = power_iteration(Mop, n, num_iter=100)
        shift = 1.01 * lmax + 1.0
        vals, vecs = smallest_eigh(Mop, n, k, shift, tol=tol)
        if normalization == "randomwalk":
            vecs = vecs / jnp.sqrt(deg)[:, None]
        return vals, vecs

    if normalization in ("randomwalk", "normalized"):
        s = 1.0 / jnp.sqrt(deg)

        def Anorm(X):  # D^-1/2 W D^-1/2
            return s[:, None] * spmm(s[:, None] * X)

        if method == "exact":
            if accel is not None:
                # banded-kernel LOBPCG (jitted entry in ops.accel)
                vals_p, U_p = accel.eig_normalized(
                    accel.to_perm(s.astype(dtype)), k,
                    power=_default_power(dtype))
                vals, U = vals_p, accel.from_perm(U_p)
            else:
                # top-k of (I + Anorm), spectrum in [0, 2] — PSD
                def A(X):
                    return X + Anorm(X)

                theta, U = _lobpcg_topk(A, n, k, tol, dtype=dtype,
                                        power=_default_power(dtype))
                vals = 2.0 - _rayleigh(A, U)  # = smallest of L_norm
            order = jnp.argsort(vals)
            vals, vecs = vals[order], U[:, order]
        elif method == "lowrank":
            from graphlearning_tpu.utils import randomized_svd

            if accel is not None and spmm is None:
                spmm = lambda X: accel.from_perm(
                    accel.spmm(accel.to_perm(jnp.asarray(X))))
            u, sv, _ = randomized_svd(Anorm_wrap(g, s, spmm=spmm), k=k,
                                      c=c, q=q)
            vals = 1.0 - sv
            order = np.argsort(vals)
            vals, vecs = jnp.asarray(vals[order]), jnp.asarray(u[:, order])
        else:
            raise ValueError("Invalid eigensolver method " + method)
        if normalization == "randomwalk":
            vecs = s[:, None] * vecs
        return vals, vecs

    elif normalization == "combinatorial":
        M = 2.0 * jnp.max(deg)

        def A(X):  # M I - L = (M - deg) X + W X — PSD
            return (M - deg)[:, None] * X + spmm(X)

        if method == "exact":
            theta, U = _lobpcg_topk(A, n, k, tol, dtype=dtype,
                                    power=_default_power(dtype))
            theta = _rayleigh(A, U)
        elif method == "lowrank":
            from graphlearning_tpu.utils import randomized_svd

            class _Op:
                shape = (n, n)

                def __call__(self, X):
                    return A(X)

            u, sv, _ = randomized_svd(_Op(), k=k, c=c, q=q)
            theta, U = jnp.asarray(sv), jnp.asarray(u)
        else:
            raise ValueError("Invalid eigensolver method " + method)
        vals = M - theta
        order = jnp.argsort(vals)
        return vals[order], U[:, order]

    elif normalization == "coifmanlafon":
        # density-normalized kernel K = D^-a W D^-a, then randomwalk
        # Laplacian of K (reference graph.py laplacian 'coifmanlafon')
        alpha = c if isinstance(c, float) else 0.5
        da = deg**-alpha

        def Kmv(X):
            return da[:, None] * spmm(da[:, None] * X)

        dK = Kmv(jnp.ones((n, 1), dtype=dtype))[:, 0]
        sK = 1.0 / jnp.sqrt(dK)

        def A(X):  # I + D_K^-1/2 K D_K^-1/2, PSD, top-k ↔ smallest L_rw(K)
            return X + sK[:, None] * Kmv(sK[:, None] * X)

        theta, U = _lobpcg_topk(A, n, k, tol, dtype=dtype,
                                power=_default_power(dtype))
        vals = 2.0 - _rayleigh(A, U)
        order = jnp.argsort(vals)
        vecs = sK[:, None] * U[:, order]
        return vals[order], vecs

    raise ValueError("Invalid choice of normalization " + normalization)


def Anorm_wrap(g: SparseGraph, s, spmm=None):
    """Shape-carrying symmetric normalized-adjacency operator for
    randomized_svd."""
    n = g.n
    if spmm is None:
        spmm = lambda X: _ops.spmm(g, X)

    class _Op:
        shape = (n, n)

        def __call__(self, X):
            return s[:, None] * spmm(s[:, None] * X)

    return _Op()


def fiedler_vector(g: SparseGraph, tol=0):
    """Second eigenvector of the normalized Laplacian (reference
    ``graph.py:153-206`` uses power iteration on ``λI − L``; LOBPCG here)."""
    vals, vecs = eigen_decomp(g, normalization="normalized", k=2, tol=tol)
    return vals[1], vecs[:, 1]
