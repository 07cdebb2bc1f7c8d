"""Jitted multi-RHS conjugate-gradient solvers (``lax.while_loop``).

TPU-native re-expression of reference ``utils.py:483-532`` (``conjgrad``)
and ``utils.py:321-384`` (``constrained_solve``).  Differences by design:

* The constrained (Dirichlet) solve never extracts a submatrix — dynamic
  shapes are hostile to XLA.  Instead it runs *masked* CG on the full
  system: the operator is ``x -> P L P x`` with ``P`` zeroing labeled rows,
  which is algebraically identical to CG on the unlabeled Schur block.
* Multi-RHS throughout: ``b`` is ``(n, m)``; one SpMM per iteration serves
  all m right-hand sides (MXU-batched), matching the reference's
  vectorised CG semantics.
* Stopping rule matches the reference: ``||r||_F < tol`` (utils.py:521).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def conjgrad(
    A: Callable,
    b,
    x0=None,
    max_iter: int = 1000,
    tol: float = 1e-10,
    M: Optional[Callable] = None,
):
    """Preconditioned conjugate gradient for SPD operator ``A``.

    ``A`` and optional preconditioner ``M`` (approximating ``A^{-1}``) are
    callables on ``(n, m)`` arrays.  Semantics mirror reference
    ``utils.py:483-532``.  Returns ``(x, iters, final_residual)``.
    """
    b = jnp.asarray(b)
    was_1d = b.ndim == 1
    if was_1d:
        b = b[:, None]
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0).reshape(b.shape)
    if M is None:
        M = lambda r: r

    r = b - A(x)
    z = M(r)
    p = z
    rz = jnp.sum(r * z, axis=0)

    def res_norm(r):
        # reference stopping rule: Frobenius norm of the residual block
        # (utils.py:521 `err = np.sqrt(np.sum(rsnew))`)
        return jnp.sqrt(jnp.sum(r * r))

    # Clamp the tolerance to what the dtype can actually reach: reference
    # tolerances (1e-10) are f64-sized; in f32 an unreachable tol would spin
    # the while_loop to max_iter (and trip TPU watchdogs).  The clamp uses
    # the SYSTEM scale ||b|| (== ||r0|| for the usual zero start), not the
    # warm-start residual — a good x0 must not TIGHTEN the effective
    # tolerance (measured: warm-started active-learning refits ran slower
    # than cold because the solver chased 50*eps*||r0_warm||).
    eps = jnp.finfo(b.dtype).eps
    tol = jnp.maximum(
        jnp.asarray(tol, dtype=b.dtype), 50.0 * eps * (res_norm(b) + 1.0)
    )

    def cond(state):
        x, r, z, p, rz, i = state
        return jnp.logical_and(i < max_iter, res_norm(r) > tol)

    def body(state):
        x, r, z, p, rz, i = state
        Ap = A(p)
        pAp = jnp.sum(p * Ap, axis=0)
        alpha = jnp.where(pAp > 0, rz / jnp.where(pAp == 0, 1.0, pAp), 0.0)
        x = x + alpha[None, :] * p
        r = r - alpha[None, :] * Ap
        z = M(r)
        rz_new = jnp.sum(r * z, axis=0)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
        p = z + beta[None, :] * p
        return (x, r, z, p, rz_new, i + 1)

    x, r, z, p, rz, iters = jax.lax.while_loop(
        cond, body, (x, r, z, p, rz, jnp.asarray(0))
    )
    res = res_norm(r)
    if was_1d:
        x = x[:, 0]
    return x, iters, res


def constrained_solve(
    L: Callable,
    Ldiag,
    bdy_mask,
    bdy_values,
    f=None,
    max_iter: int = 1000,
    tol: float = 1e-10,
    u0=None,
):
    """Solve ``L u = f`` subject to ``u = bdy_values`` on ``bdy_mask``
    (reference ``utils.py:321-384``), via masked Jacobi-preconditioned CG.

    Args:
      L: SPD operator on (n, m) arrays (graph Laplacian matvec).
      Ldiag: (n,) diagonal of L, for the Jacobi preconditioner.
      bdy_mask: (n,) bool — True at constrained (labeled) nodes.
      bdy_values: (n, m) — values on the boundary (rows off the mask ignored).
      f: optional (n, m) right-hand side on interior nodes.
      u0: optional (n, m) warm start (e.g. the previous active-learning
        round's solution, reference has none — active_learning.py:108-117
        refits cold); only its interior rows seed the CG iterate, so the
        solution is unchanged, just reached in fewer iterations.
    """
    bdy_values = jnp.asarray(bdy_values)
    was_1d = bdy_values.ndim == 1
    if was_1d:
        bdy_values = bdy_values[:, None]
    n, m = bdy_values.shape
    interior = ~bdy_mask

    g_ext = jnp.where(bdy_mask[:, None], bdy_values, 0.0)
    rhs = -L(g_ext)
    if f is not None:
        f = jnp.asarray(f)
        if f.ndim == 1:
            f = f[:, None]
        rhs = rhs + f
    rhs = jnp.where(interior[:, None], rhs, 0.0)

    def A(x):
        x = jnp.where(interior[:, None], x, 0.0)
        return jnp.where(interior[:, None], L(x), 0.0)

    inv_diag = jnp.where(
        interior & (Ldiag != 0), 1.0 / jnp.where(Ldiag == 0, 1.0, Ldiag), 0.0
    )

    def M(r):
        return inv_diag[:, None] * r

    x0 = None
    if u0 is not None:
        u0 = jnp.asarray(u0)
        if u0.ndim == 1:
            u0 = u0[:, None]
        x0 = jnp.where(interior[:, None], u0, 0.0)
    x, iters, res = conjgrad(A, rhs, x0=x0, max_iter=max_iter, tol=tol, M=M)
    u = g_ext + jnp.where(interior[:, None], x, 0.0)
    if was_1d:
        u = u[:, 0]
    return u, iters, res
