"""Game-theoretic p-Laplace / infinity-Laplace (AMLE) solvers.

TPU-native re-expression of ``c_code/lp_iterate.cpp``:

* ``lp_iterate``  — two-sided (upper/lower) relaxation of the
  game-theoretic p-Laplacian ``(α/deg)Σw∇u + δ(min+max)`` until the
  sandwich closes (``lp_iterate.cpp:35-125``).  The reference's sweep is
  already Jacobi (it writes into a second buffer and swaps), so the
  device version is semantics-identical: one fused update over all nodes
  per round inside ``lax.while_loop``.
* ``lip_iterate`` — AMLE iteration ``u ← α·avg + β(min+max)/2``
  (``lp_iterate.cpp:129-187``; Gauss-Seidel there, Jacobi here — same
  fixed point of a monotone scheme).
* ``lip_iterate_weighted`` — per-node 30-step bisection on
  ``min_j w(t-u_j) + max_j w(t-u_j) = 0`` (``lp_iterate.cpp:190-259``),
  vectorized: all nodes bisect in lockstep (fixed trip count).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from graphlearning_tpu.core.sparse import SparseGraph
from graphlearning_tpu.ops import graphops as _gops
from graphlearning_tpu.solvers.eikonal import _boundary_handling


@functools.partial(jax.jit, static_argnames=("max_iter",))
def _lp_iterate(g: SparseGraph, uu0, ul0, bdy_mask, gvals, p, tol, max_iter: int):
    mask = g.mask()
    alpha = 1.0 / p
    delta = 1.0 - 2.0 / p
    dt = 0.9 / (alpha + 2.0 * jnp.abs(delta))
    dt = dt / jnp.max(g.vals)
    wsum = jnp.sum(jnp.where(mask, g.vals, 0.0), axis=1)
    invdeg = alpha / wsum

    def step_one(u):
        e = g.vals * (u[g.cols] - u[:, None])
        e = jnp.where(mask, e, 0.0)
        sumw = jnp.sum(e, axis=1)
        # reference initializes min/max accumulators at 0 (lp_iterate.cpp:81)
        minw = jnp.minimum(jnp.min(e, axis=1), 0.0)
        maxw = jnp.maximum(jnp.max(e, axis=1), 0.0)
        return u + dt * (invdeg * sumw + delta * (minw + maxw))

    def body(state):
        uu, ul, err, it = state
        vu = jnp.where(bdy_mask, gvals, step_one(uu))
        vl = jnp.where(bdy_mask, gvals, step_one(ul))
        err = jnp.max(vu - vl)
        return vu, vl, err, it + 1

    def cond(state):
        uu, ul, err, it = state
        return jnp.logical_and(
            jnp.logical_or(err > tol, it <= 10), it < max_iter
        )

    uu0 = jnp.where(bdy_mask, gvals, uu0)
    ul0 = jnp.where(bdy_mask, gvals, ul0)
    uu, ul, _, _ = jax.lax.while_loop(
        cond, body, (uu0, ul0, jnp.asarray(jnp.inf, uu0.dtype), 0)
    )
    return uu, ul


@functools.partial(jax.jit, static_argnames=("max_iter",))
def _lip_iterate(g: SparseGraph, u0, bdy_mask, gvals, alpha, beta, tol, max_iter: int):
    mask = g.mask()
    big = jnp.asarray(jnp.finfo(u0.dtype).max, u0.dtype)
    wsum = jnp.sum(jnp.where(mask, g.vals, 0.0), axis=1)

    def body(state):
        u, u_prev, err, it = state
        un = u[g.cols]
        sumu = jnp.sum(jnp.where(mask, g.vals * un, 0.0), axis=1)
        minu = jnp.min(jnp.where(mask, un, big), axis=1)
        maxu = jnp.max(jnp.where(mask, un, -big), axis=1)
        ne = alpha * sumu / wsum + beta * 0.5 * (minu + maxu)
        u_new = jnp.where(bdy_mask, gvals, ne)
        # period-2 stop: Jacobi on this (nonexpansive, non-contractive)
        # map can settle into a 2-cycle straddling the fixed point — the
        # reference's Gauss-Seidel sweep cannot, so match its termination
        # by accepting either consecutive or alternate-iterate stalls
        err = jnp.minimum(jnp.max(jnp.abs(u_new - u)),
                          jnp.max(jnp.abs(u_new - u_prev)))
        return u_new, u, err, it + 1

    def cond(state):
        u, u_prev, err, it = state
        return jnp.logical_and(
            jnp.logical_or(err > tol, it <= 20), it < max_iter
        )

    u0 = jnp.where(bdy_mask, gvals, u0)
    u, _, _, _ = jax.lax.while_loop(
        cond, body, (u0, u0, jnp.asarray(jnp.inf, u0.dtype), 0))
    return u


@functools.partial(jax.jit, static_argnames=("max_iter", "num_bisection_it"))
def _lip_iterate_weighted(g: SparseGraph, u0, bdy_mask, gvals, tol,
                          max_iter: int, num_bisection_it: int = 30):
    mask = g.mask()
    big = jnp.asarray(jnp.finfo(u0.dtype).max, u0.dtype)

    def body(state):
        u, u_prev, err, it = state
        un = u[g.cols]
        a = jnp.min(jnp.where(mask, un, big), axis=1)
        b = jnp.max(jnp.where(mask, un, -big), axis=1)

        def bis(i, ab):
            a, b = ab
            t = 0.5 * (a + b)
            e = g.vals * (t[:, None] - un)
            e = jnp.where(mask, e, 0.0)
            # reference init at 0 (lp_iterate.cpp:231-233)
            minw = jnp.minimum(jnp.min(e, axis=1), 0.0)
            maxw = jnp.maximum(jnp.max(e, axis=1), 0.0)
            pos = (minw + maxw) > 0
            return jnp.where(pos, a, t), jnp.where(pos, t, b)

        a, b = jax.lax.fori_loop(0, num_bisection_it, bis, (a, b))
        ne = 0.5 * (a + b)
        u_new = jnp.where(bdy_mask, gvals, ne)
        err = jnp.minimum(jnp.max(jnp.abs(u_new - u)),
                          jnp.max(jnp.abs(u_new - u_prev)))
        return u_new, u, err, it + 1

    def cond(state):
        u, u_prev, err, it = state
        return jnp.logical_and(
            jnp.logical_or(err > tol, it <= 20), it < max_iter
        )

    u0 = jnp.where(bdy_mask, gvals, u0)
    u, _, _, _ = jax.lax.while_loop(
        cond, body, (u0, u0, jnp.asarray(jnp.inf, u0.dtype), 0))
    return u


def _prep(g, bdy_set, bdy_val):
    n = g.n
    bdy_set, bdy_val_arr = _boundary_handling(bdy_set, bdy_val)
    bdy_mask = np.zeros(n, dtype=bool)
    bdy_mask[bdy_set] = True
    gvals = np.zeros(n)
    gvals[bdy_set] = bdy_val_arr
    return jnp.asarray(bdy_mask), gvals, bdy_val_arr


def plaplace(g: SparseGraph, bdy_set, bdy_val, p, max_num_it=10**6, tol=1e-1,
             fast=True):
    """Game-theoretic p-Laplace interpolation (reference
    ``graph.py:1177-1279``): ``fast`` uses the unweighted AMLE-style
    iteration with α=1/(p-1); otherwise the two-sided upper/lower
    ``lp_iterate`` sandwich."""
    dtype = g.vals.dtype
    n = g.n
    bdy_mask, gvals, bdy_val_arr = _prep(g, bdy_set, bdy_val)
    eps_floor = 100 * float(jnp.finfo(dtype).eps)
    if fast:
        alpha = 1.0 / (p - 1.0)
        beta = 1.0 - alpha
        tol_fast = max(1e-6, eps_floor)
        u = _lip_iterate(
            g, jnp.zeros((n,), dtype=dtype), bdy_mask,
            jnp.asarray(gvals, dtype=dtype),
            jnp.asarray(alpha, dtype=dtype), jnp.asarray(beta, dtype=dtype),
            jnp.asarray(tol_fast, dtype=dtype), int(max_num_it),
        )
        return np.asarray(u).astype(float)
    uu0 = np.full((n,), bdy_val_arr.max())
    ul0 = np.full((n,), bdy_val_arr.min())
    uu, ul = _lp_iterate(
        g, jnp.asarray(uu0, dtype=dtype), jnp.asarray(ul0, dtype=dtype),
        bdy_mask, jnp.asarray(gvals, dtype=dtype),
        jnp.asarray(p, dtype=dtype),
        jnp.asarray(max(tol, eps_floor), dtype=dtype), int(max_num_it),
    )
    return np.asarray((uu + ul) / 2).astype(float)


def amle(g: SparseGraph, bdy_set, bdy_val, tol=1e-5, max_num_it=1000,
         weighted=True):
    """Absolutely minimal Lipschitz extension — graph infinity-Laplace
    equation (reference ``graph.py:1281-1332``)."""
    dtype = g.vals.dtype
    n = g.n
    bdy_mask, gvals, _ = _prep(g, bdy_set, bdy_val)
    tol = max(tol, 100 * float(jnp.finfo(dtype).eps))
    if weighted:
        u = _lip_iterate_weighted(
            g, jnp.zeros((n,), dtype=dtype), bdy_mask,
            jnp.asarray(gvals, dtype=dtype), jnp.asarray(tol, dtype=dtype),
            int(max_num_it),
        )
    else:
        u = _lip_iterate(
            g, jnp.zeros((n,), dtype=dtype), bdy_mask,
            jnp.asarray(gvals, dtype=dtype),
            jnp.asarray(0.0, dtype=dtype), jnp.asarray(1.0, dtype=dtype),
            jnp.asarray(tol, dtype=dtype), int(max_num_it),
        )
    return np.asarray(u).astype(float)


# -- multi-class (one-vs-rest batched) variants ----------------------------
#
# The ssl one-vs-rest wrappers (plaplace/amle, reference ssl.py:1569-1727)
# solve C independent scalar problems on the SAME graph.  Solving them as
# one (n, C) fixed-point iteration shares every gather/reduce across
# classes — C× fewer while_loop iterations' worth of dispatch and far
# better VPU utilization than C sequential solves.


@functools.partial(jax.jit, static_argnames=("max_iter",))
def _lip_iterate_mc(g: SparseGraph, u0, bdy_mask, gvals, alpha, beta, tol,
                    max_iter: int):
    """(n, C) batched version of :func:`_lip_iterate`."""
    mask = g.mask()[:, :, None]
    big = jnp.asarray(jnp.finfo(u0.dtype).max, u0.dtype)
    wsum = jnp.sum(jnp.where(g.mask(), g.vals, 0.0), axis=1)[:, None]
    w3 = g.vals[:, :, None]
    bdy3 = bdy_mask[:, None]

    def body(state):
        u, u_prev, err, it = state
        un = _gops.neighbor_take(g, u)               # (n, k, C)
        sumu = jnp.sum(jnp.where(mask, w3 * un, 0.0), axis=1)
        minu = jnp.min(jnp.where(mask, un, big), axis=1)
        maxu = jnp.max(jnp.where(mask, un, -big), axis=1)
        ne = alpha * sumu / wsum + beta * 0.5 * (minu + maxu)
        u_new = jnp.where(bdy3, gvals, ne)
        err = jnp.minimum(jnp.max(jnp.abs(u_new - u)),
                          jnp.max(jnp.abs(u_new - u_prev)))
        return u_new, u, err, it + 1

    def cond(state):
        u, u_prev, err, it = state
        return jnp.logical_and(
            jnp.logical_or(err > tol, it <= 20), it < max_iter
        )

    u0 = jnp.where(bdy3, gvals, u0)
    u, _, _, _ = jax.lax.while_loop(
        cond, body, (u0, u0, jnp.asarray(jnp.inf, u0.dtype), 0))
    return u


@functools.partial(jax.jit, static_argnames=("max_iter", "num_bisection_it"))
def _lip_iterate_weighted_mc(g: SparseGraph, u0, bdy_mask, gvals, tol,
                             max_iter: int, num_bisection_it: int = 30):
    """(n, C) batched version of :func:`_lip_iterate_weighted`."""
    mask = g.mask()[:, :, None]
    big = jnp.asarray(jnp.finfo(u0.dtype).max, u0.dtype)
    w3 = g.vals[:, :, None]
    bdy3 = bdy_mask[:, None]

    def body(state):
        u, u_prev, err, it = state
        un = _gops.neighbor_take(g, u)               # (n, k, C)
        a = jnp.min(jnp.where(mask, un, big), axis=1)
        b = jnp.max(jnp.where(mask, un, -big), axis=1)

        def bis(i, ab):
            a, b = ab
            t = 0.5 * (a + b)
            e = jnp.where(mask, w3 * (t[:, None, :] - un), 0.0)
            minw = jnp.minimum(jnp.min(e, axis=1), 0.0)
            maxw = jnp.maximum(jnp.max(e, axis=1), 0.0)
            pos = (minw + maxw) > 0
            return jnp.where(pos, a, t), jnp.where(pos, t, b)

        a, b = jax.lax.fori_loop(0, num_bisection_it, bis, (a, b))
        u_new = jnp.where(bdy3, gvals, 0.5 * (a + b))
        err = jnp.minimum(jnp.max(jnp.abs(u_new - u)),
                          jnp.max(jnp.abs(u_new - u_prev)))
        return u_new, u, err, it + 1

    def cond(state):
        u, u_prev, err, it = state
        return jnp.logical_and(
            jnp.logical_or(err > tol, it <= 20), it < max_iter
        )

    u0 = jnp.where(bdy3, gvals, u0)
    u, _, _, _ = jax.lax.while_loop(
        cond, body, (u0, u0, jnp.asarray(jnp.inf, u0.dtype), 0))
    return u


@functools.partial(jax.jit, static_argnames=("max_iter",))
def _lip_iterate_mc_bucketed(b, u0, bdy_mask, gvals, alpha, beta, tol,
                             max_iter: int):
    """(n, C) lip iteration on the ELL+COO hybrid (``BucketedELL``): the
    single padded ELL gathers ``n * max_degree`` slots per round, so one
    degree-255 hub makes EVERY row pay 255 slots; here the main gather is
    ``n * kcap`` and the hub tail reduces via ``segment_*`` (SURVEY.md
    §7.3 load-balance fix — measured ~8x fewer gathered slots at n=50k)."""
    g = b.main
    mask = g.mask()[:, :, None]
    big = jnp.asarray(jnp.finfo(u0.dtype).max, u0.dtype)
    wsum = (jnp.sum(jnp.where(g.mask(), g.vals, 0.0), axis=1)
            + b.spill_reduce(b.sp_vals, "sum", 0.0))[:, None]
    w3 = g.vals[:, :, None]
    bdy3 = bdy_mask[:, None]

    def body(state):
        u, u_prev, err, it = state
        un = u[g.cols]                               # (n, kcap, C)
        sumu = jnp.sum(jnp.where(mask, w3 * un, 0.0), axis=1)
        minu = jnp.min(jnp.where(mask, un, big), axis=1)
        maxu = jnp.max(jnp.where(mask, un, -big), axis=1)
        usp = u[b.sp_cols]                           # (m_pad, C)
        sumu = sumu + b.spill_reduce(b.sp_vals[:, None] * usp, "sum", 0.0)
        minu = jnp.minimum(minu, b.spill_reduce(usp, "min", big))
        maxu = jnp.maximum(maxu, b.spill_reduce(usp, "max", -big))
        ne = alpha * sumu / wsum + beta * 0.5 * (minu + maxu)
        u_new = jnp.where(bdy3, gvals, ne)
        err = jnp.minimum(jnp.max(jnp.abs(u_new - u)),
                          jnp.max(jnp.abs(u_new - u_prev)))
        return u_new, u, err, it + 1

    def cond(state):
        u, u_prev, err, it = state
        return jnp.logical_and(
            jnp.logical_or(err > tol, it <= 20), it < max_iter
        )

    u0 = jnp.where(bdy3, gvals, u0)
    u, _, _, _ = jax.lax.while_loop(
        cond, body, (u0, u0, jnp.asarray(jnp.inf, u0.dtype), 0))
    return u


@functools.partial(jax.jit, static_argnames=("max_iter", "num_bisection_it"))
def _lip_iterate_weighted_mc_bucketed(b, u0, bdy_mask, gvals, tol,
                                      max_iter: int,
                                      num_bisection_it: int = 30):
    """(n, C) weighted AMLE bisection on the ELL+COO hybrid."""
    g = b.main
    mask = g.mask()[:, :, None]
    big = jnp.asarray(jnp.finfo(u0.dtype).max, u0.dtype)
    w3 = g.vals[:, :, None]
    bdy3 = bdy_mask[:, None]
    has_spill = b.m > 0

    def body(state):
        u, u_prev, err, it = state
        un = u[g.cols]                               # (n, kcap, C)
        usp = u[b.sp_cols]                           # (m_pad, C)
        a = jnp.min(jnp.where(mask, un, big), axis=1)
        bb = jnp.max(jnp.where(mask, un, -big), axis=1)
        if has_spill:
            a = jnp.minimum(a, b.spill_reduce(usp, "min", big))
            bb = jnp.maximum(bb, b.spill_reduce(usp, "max", -big))

        def bis(i, ab):
            a, bb = ab
            t = 0.5 * (a + bb)
            e = jnp.where(mask, w3 * (t[:, None, :] - un), 0.0)
            minw = jnp.minimum(jnp.min(e, axis=1), 0.0)
            maxw = jnp.maximum(jnp.max(e, axis=1), 0.0)
            if has_spill:
                # pad rows carry id n: the gather clamps (jax clip mode)
                # and the segment reduce drops them into segment n
                esp = b.sp_vals[:, None] * (t[b.sp_rows] - usp)
                minw = jnp.minimum(minw, b.spill_reduce(esp, "min", 0.0))
                maxw = jnp.maximum(maxw, b.spill_reduce(esp, "max", 0.0))
            pos = (minw + maxw) > 0
            return jnp.where(pos, a, t), jnp.where(pos, t, bb)

        a, bb = jax.lax.fori_loop(0, num_bisection_it, bis, (a, bb))
        u_new = jnp.where(bdy3, gvals, 0.5 * (a + bb))
        err = jnp.minimum(jnp.max(jnp.abs(u_new - u)),
                          jnp.max(jnp.abs(u_new - u_prev)))
        return u_new, u, err, it + 1

    def cond(state):
        u, u_prev, err, it = state
        return jnp.logical_and(
            jnp.logical_or(err > tol, it <= 20), it < max_iter
        )

    u0 = jnp.where(bdy3, gvals, u0)
    u, _, _, _ = jax.lax.while_loop(
        cond, body, (u0, u0, jnp.asarray(jnp.inf, u0.dtype), 0))
    return u


def _laplace_init(accel, g, bdy_mask, gvals, tol=1e-3):
    """Harmonic warm start for the lip iterations on the banded accel:
    Jacobi's slow modes are the smooth/global ones, which a cheap masked-CG
    Laplace solve (same band) nails — measured 19x fewer lip rounds than
    the Voronoi one-hot start at the CIFAR-surrogate config (33.2s -> 1.7s,
    identical fixed point)."""
    from graphlearning_tpu.ops import graphops as _ops

    deg_p = accel.to_perm(_ops.degree_vector(g))
    diag_p = accel.to_perm(_ops.laplacian_diag(g), fill=1.0)
    u = accel.laplace_constrained(
        deg_p, diag_p, accel.to_perm(jnp.zeros(g.n, dtype=jnp.float32)),
        accel.to_perm(jnp.asarray(bdy_mask, jnp.int32)) > 0,
        accel.to_perm(jnp.asarray(gvals, jnp.float32)), tol)
    return np.asarray(accel.from_perm(u))


def _voronoi_init(g, bdy_set, bdy_vals, accel=None):
    """Closest-labeled-point warm start for the lip iterations: the
    p-Laplace/AMLE one-vs-rest solutions are plateau-like away from class
    boundaries, so the geodesic-Voronoi one-hot is sup-norm-close to the
    fixed point and the remaining error is boundary-localized (far fewer
    Jacobi rounds than from zeros)."""
    from graphlearning_tpu.solvers.eikonal import dijkstra as _dijkstra

    _, cp = _dijkstra(g, bdy_set, bdy_val=np.zeros(len(bdy_set)),
                      return_cp=True, accel=accel)
    cp = np.asarray(cp)
    val_of = np.zeros((g.n,) + bdy_vals.shape[1:])
    # cp indexes into nodes; map each node to its closest boundary node's value
    pos_in_bdy = -np.ones(g.n, dtype=int)
    pos_in_bdy[np.asarray(bdy_set)] = np.arange(len(bdy_set))
    src = pos_in_bdy[np.maximum(cp, 0)]
    ok = (cp >= 0) & (src >= 0)
    val_of[ok] = bdy_vals[src[ok]]
    return val_of


def plaplace_mc(g: SparseGraph, bdy_set, bdy_vals, p, max_num_it=10**6,
                tol=1e-1, fast=True, accel=None, bucketed=None):
    """One-vs-rest batched p-Laplace: ``bdy_vals`` is (m, C) — one column
    per class — solved jointly.  ``fast`` path only (the lp_iterate
    sandwich stays per-class)."""
    dtype = g.vals.dtype
    n = g.n
    bdy_set = np.asarray(bdy_set)
    bdy_vals = np.asarray(bdy_vals, dtype=float)
    C = bdy_vals.shape[1]
    bdy_mask = np.zeros(n, dtype=bool)
    bdy_mask[bdy_set] = True
    gvals = np.zeros((n, C))
    gvals[bdy_set] = bdy_vals
    if not fast:
        cols = [
            plaplace(g, bdy_set, bdy_vals[:, c], p, max_num_it=max_num_it,
                     tol=tol, fast=False)
            for c in range(C)
        ]
        return np.stack(cols, axis=1)
    alpha = 1.0 / (p - 1.0)
    beta = 1.0 - alpha
    eps_floor = 100 * float(jnp.finfo(dtype).eps)
    # honor the caller's tolerance (the ssl fast path passes the
    # reference's 1e-5, ssl.py plaplace.__init__; the default 1e-1 belongs
    # to the lp_iterate sandwich — map it to 1e-5 here); clamp to f32 floor
    tol_fast = max(tol if tol < 1e-1 else 1e-5, eps_floor)
    if (accel is not None and accel.materialize and C <= 32
            and accel.rect_band_ok()):
        # banded fast path from a harmonic warm start: block-Gauss-Seidel
        # sweeps (AccelSpMM.lip_gs_mc — reference-like per-sweep
        # propagation, ~20x fewer rounds than the Jacobi tiled kernel);
        # rect_band_ok gates on the RECTANGULAR window's HBM cost, which
        # on band-hostile graphs can far exceed the tiles band
        u0 = _laplace_init(accel, g, bdy_mask, gvals)
        u = accel.lip_gs_mc(u0, bdy_mask, gvals, alpha, beta,
                            max(tol_fast, 1e-5), int(max_num_it))
        return np.asarray(u).astype(float)
    u0 = _voronoi_init(g, bdy_set, bdy_vals, accel=accel)
    args = (jnp.asarray(u0, dtype=dtype), jnp.asarray(bdy_mask),
            jnp.asarray(gvals, dtype=dtype),
            jnp.asarray(alpha, dtype=dtype), jnp.asarray(beta, dtype=dtype),
            jnp.asarray(tol_fast, dtype=dtype), int(max_num_it))
    if bucketed is not None and g.k > 1.5 * bucketed.kcap:
        # degree-skewed ELL: hub rows pad every gather — hybrid wins
        u = _lip_iterate_mc_bucketed(bucketed, *args)
    else:
        u = _lip_iterate_mc(g, *args)
    return np.asarray(u).astype(float)


def amle_mc(g: SparseGraph, bdy_set, bdy_vals, tol=1e-5, max_num_it=10**5,
            weighted=True, accel=None, bucketed=None):
    """One-vs-rest batched AMLE: ``bdy_vals`` is (m, C)."""
    dtype = g.vals.dtype
    n = g.n
    bdy_set = np.asarray(bdy_set)
    bdy_vals = np.asarray(bdy_vals, dtype=float)
    C = bdy_vals.shape[1]
    bdy_mask = np.zeros(n, dtype=bool)
    bdy_mask[bdy_set] = True
    gvals = np.zeros((n, C))
    gvals[bdy_set] = bdy_vals
    tol = max(tol, 100 * float(jnp.finfo(dtype).eps))
    if (not weighted and accel is not None and accel.materialize
            and C <= 32 and accel.rect_band_ok()):
        # block-Gauss-Seidel sweeps (AccelSpMM.lip_gs_mc) from a harmonic
        # warm start — same fixed point, reference-like round counts
        u0 = _laplace_init(accel, g, bdy_mask, gvals)
        u = accel.lip_gs_mc(u0, bdy_mask, gvals, 0.0, 1.0,
                            max(tol, 1e-5), int(max_num_it))
        return np.asarray(u).astype(float)
    u0 = _voronoi_init(g, bdy_set, bdy_vals, accel=accel)
    skewed = bucketed is not None and g.k > 1.5 * bucketed.kcap
    if weighted:
        args = (jnp.asarray(u0, dtype=dtype), jnp.asarray(bdy_mask),
                jnp.asarray(gvals, dtype=dtype), jnp.asarray(tol, dtype=dtype),
                int(max_num_it))
        u = (_lip_iterate_weighted_mc_bucketed(bucketed, *args) if skewed
             else _lip_iterate_weighted_mc(g, *args))
    else:
        args = (jnp.asarray(u0, dtype=dtype), jnp.asarray(bdy_mask),
                jnp.asarray(gvals, dtype=dtype),
                jnp.asarray(0.0, dtype=dtype), jnp.asarray(1.0, dtype=dtype),
                jnp.asarray(tol, dtype=dtype), int(max_num_it))
        u = (_lip_iterate_mc_bucketed(bucketed, *args) if skewed
             else _lip_iterate_mc(g, *args))
    return np.asarray(u).astype(float)
