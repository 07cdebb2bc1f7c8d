"""Neighborhood-aggregation kernels over the padded-ELL graph.

These are the hot ops of the whole framework (SURVEY.md §7.1 item 2):
``W @ X`` SpMM, transposed SpMM, degrees, Laplacian matvecs, graph calculus
(gradient / divergence, reference ``graph.py:292-365``) and masked
neighbor min/max reductions (reference infinity Laplacian ``graph.py:515-533``).

All functions are pure, jittable, and operate on :class:`SparseGraph`
pytrees.  The ELL layout makes every op a dense gather + reduction over the
fixed ``k`` axis — static shapes, XLA-fusable, MXU/VPU friendly.  A Pallas
SpMM kernel (``ops/pallas_spmm.py``) accelerates the gather on real TPUs;
these XLA versions are the portable reference path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphlearning_tpu.core.sparse import SparseGraph


def _as_2d(X):
    X = jnp.asarray(X)
    if X.ndim == 1:
        return X[:, None], True
    return X, False


def spmm(g: SparseGraph, X):
    """``W @ X`` — gather neighbor features, weight, reduce over k.

    Padding entries have ``vals == 0`` and ``cols == row`` (a valid gather
    target), so no mask is needed.  Replaces scipy ``W @ X``
    (e.g. reference ``utils.py:523`` CG hot loop, ``ssl.py:649-663``).

    Operator override: a graph-like pytree exposing ``spmm_`` (e.g.
    ``parallel.band_shard.ShardedOp``) routes the product through its own
    kernel — this is how the SAME jitted solver programs run their hot
    SpMM on the partitioned tiled-band Pallas path when distributed.
    """
    X2, was_1d = _as_2d(X)
    custom = getattr(g, "spmm_", None)
    if custom is not None:
        out = custom(X2)
    else:
        gathered = jnp.take(X2, g.cols, axis=0)        # (n, k, d)
        out = jnp.einsum("nk,nkd->nd", g.vals, gathered)
    return out[:, 0] if was_1d else out


def neighbor_take(g: SparseGraph, x):
    """``x[g.cols]`` — per-slot neighbor values: x (n,) -> (n, k),
    x (n, C) -> (n, k, C).  Invalid (beyond-degree) slots return the
    padding column's value; callers mask with ``g.mask()`` as they always
    have.

    Operator override: a graph-like pytree exposing ``neighbor_take_``
    (``parallel.band_shard.ShardedOp``) computes the gather through its
    halo exchange — per-iteration comm drops from the GSPMD all-gather of
    all n rows to the 2H boundary rows (round-3 verdict item 2)."""
    custom = getattr(g, "neighbor_take_", None)
    if custom is not None:
        return custom(x)
    return x[g.cols]


def spmm_t(g: SparseGraph, X):
    """``W.T @ X`` via scatter-add (segment_sum over flattened cols)."""
    X2, was_1d = _as_2d(X)
    n, k = g.n, g.k
    contrib = g.vals[:, :, None] * X2[:, None, :]      # (n, k, d)
    out = jax.ops.segment_sum(
        contrib.reshape(n * k, -1), g.cols.reshape(-1), num_segments=n
    )
    return out[:, 0] if was_1d else out


def degree_vector(g: SparseGraph):
    """Weighted degree ``d_i = sum_j w_ij`` (reference ``graph.py:108-122``).
    Operator override: ``deg_`` (hybrid graphs whose spill edges live
    outside the main ELL, e.g. ``parallel.shard.ShardedBucketedGraph``)."""
    custom = getattr(g, "deg_", None)
    if custom is not None:
        return custom()
    return jnp.sum(g.vals, axis=1)


def degree_vector_p(g: SparseGraph, p: float):
    """``d_i = sum_j w_ij^p`` on valid entries (used by graph calculus)."""
    vp = jnp.where(g.mask(), jnp.abs(g.vals) ** p, 0.0)
    return jnp.sum(vp, axis=1)


def diagonal(g: SparseGraph):
    """diag(W).  Padding (cols==row, vals==0) contributes nothing.
    Operator override: ``diag_`` (hybrid graphs with spill edges)."""
    custom = getattr(g, "diag_", None)
    if custom is not None:
        return custom()
    rows = jax.lax.broadcasted_iota(jnp.int32, (g.n, g.k), 0)
    return jnp.sum(jnp.where(g.cols == rows, g.vals, 0.0), axis=1)


# -- Laplacian matvecs ----------------------------------------------------
# Matrix-free: L is never materialised (reference builds scipy CSR L,
# graph.py:469-513).  `deg` may be passed in precomputed so solvers hoist
# it out of their while_loops.

_NORMS = ("combinatorial", "randomwalk", "normalized")


def laplacian_matvec(g: SparseGraph, X, normalization="combinatorial", deg=None):
    """``L @ X`` for the three standard normalizations (graph.py:469-513):

    - combinatorial:  (D - W) X
    - randomwalk:     (I - D^-1 W) X
    - normalized:     (I - D^-1/2 W D^-1/2) X
    """
    if deg is None:
        deg = degree_vector(g)
    X2, was_1d = _as_2d(X)
    if normalization == "combinatorial":
        out = deg[:, None] * X2 - spmm(g, X2)
    elif normalization == "randomwalk":
        out = X2 - spmm(g, X2) / deg[:, None]
    elif normalization == "normalized":
        s = 1.0 / jnp.sqrt(deg)
        out = X2 - s[:, None] * spmm(g, s[:, None] * X2)
    else:
        raise ValueError(f"normalization must be one of {_NORMS}")
    return out[:, 0] if was_1d else out


def laplacian_diag(g: SparseGraph, normalization="combinatorial", deg=None):
    """diag(L) — for Jacobi preconditioning (reference ssl.py:1243-1246)."""
    if deg is None:
        deg = degree_vector(g)
    dW = diagonal(g)
    if normalization == "combinatorial":
        return deg - dW
    elif normalization in ("randomwalk", "normalized"):
        # isolated (degree-0) nodes: L row is the identity row, diag 1.0
        # (guard shared with aot._laplace_pack_args so pack and model
        # paths agree on such graphs)
        return jnp.where(deg > 0, 1.0 - dW / jnp.maximum(deg, 1e-30), 1.0)
    else:
        raise ValueError(f"normalization must be one of {_NORMS}")


# -- graph calculus -------------------------------------------------------


def gradient(g: SparseGraph, u, weighted=True, p: float = 1.0):
    """Edge field ``(∇u)_ij = w_ij^p (u_j - u_i)`` as an (n, k) array
    (reference ``graph.py:292-332``; there it is a sparse matrix).
    Padding entries are exactly 0."""
    u = jnp.asarray(u)
    diff = u[g.cols] - u[:, None]
    if weighted:
        w = jnp.where(g.mask(), jnp.abs(g.vals) ** p, 0.0) if p != 1.0 else g.vals
        diff = w * diff
    return jnp.where(g.mask(), diff, 0.0)


def build_mirror(g: SparseGraph):
    """Host-side: flat index of the mirrored entry (j,i) for each stored
    (i,j).  Requires a symmetric sparsity pattern (all graph constructions
    here symmetrize, matching reference ``weightmatrix.py:177-185``).
    Entries without a mirror map to themselves with a zero flag."""
    import numpy as np

    cols = np.asarray(g.cols).astype(np.int64)
    deg = np.asarray(g.deg)
    n, k = g.n, g.k
    rows = np.repeat(np.arange(n, dtype=np.int64)[:, None], k, axis=1)
    valid = np.arange(k)[None, :] < deg[:, None]
    # unique int64 key per stored (i, j); invalid slots get key -1 (never
    # matched: mirror keys are >= 0)
    key = np.where(valid, rows * n + cols, -1).reshape(-1)
    mkey = np.where(valid, cols * n + rows, -2).reshape(-1)
    order = np.argsort(key, kind="stable")
    sorted_key = key[order]
    pos = np.searchsorted(sorted_key, mkey)
    pos = np.clip(pos, 0, n * k - 1)
    found = sorted_key[pos] == mkey
    mirror = np.where(found, order[pos], np.arange(n * k)).reshape(n, k)
    has = found.reshape(n, k)
    return jnp.asarray(mirror.astype(np.int32)), jnp.asarray(has)


def divergence(g: SparseGraph, V, mirror=None, weighted=True, p: float = 1.0):
    """Graph divergence of an edge field V (n, k):
    ``div(V)_i = (1/2) sum_j w_ij^p (V_ij - V_ji)``
    (reference ``graph.py:334-365``).  ``mirror`` from :func:`build_mirror`."""
    if mirror is None:
        raise ValueError("divergence requires mirror indices (build_mirror(g))")
    mirror_idx, has = mirror
    Vt = jnp.where(has, V.reshape(-1)[mirror_idx], 0.0)
    A = V - Vt
    if weighted:
        w = jnp.where(g.mask(), jnp.abs(g.vals) ** p, 0.0) if p != 1.0 else g.vals
        A = w * A
    return 0.5 * jnp.sum(jnp.where(g.mask(), A, 0.0), axis=1)


# -- masked neighbor reductions ------------------------------------------


def neighbor_min(g: SparseGraph, e):
    """min over valid entries of an (n,k) edge array (+inf identity)."""
    big = jnp.asarray(jnp.finfo(e.dtype).max, e.dtype)
    return jnp.min(jnp.where(g.mask(), e, big), axis=1)


def neighbor_max(g: SparseGraph, e):
    big = jnp.asarray(jnp.finfo(e.dtype).min, e.dtype)
    return jnp.max(jnp.where(g.mask(), e, big), axis=1)


def infinity_laplacian(g: SparseGraph, u):
    """``(L_inf u)_i = min_j w_ij (u_j - u_i) + max_j w_ij (u_j - u_i)``
    over valid neighbors (reference ``graph.py:515-533``)."""
    e = g.vals * (u[g.cols] - u[:, None])
    return neighbor_min(g, e) + neighbor_max(g, e)
