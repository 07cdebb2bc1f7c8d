"""Degree-sorted segmented-ELL gather SpMM — the fast path for
band-hostile graphs.

High-dimensional kNN graphs (MNIST-style embeddings at 30+ dims) have no
usable band structure: measured on the 30-d Gaussian-mixture surrogate at
n=262k, the RCM band needs a 16k window to cover 44% of edges (occupancy
0.07%) and even cluster ordering caps at 64% coverage — every dense band
format is zero-stream-bound there (round-3 verdict, BASELINE_MEASURED
config-5a diagnosis).  The operative kernel is the row gather
(reference hot loop being replaced: ``utils.py:523`` scipy CSR SpMM).

Two measured facts on TPU v5e drive this design (scripts/gather_probe2.py
+ highdim_kernel_bench.py, 2026-08-21):

1. **The XLA row-gather rate cliffs on table BYTES**: ~4.5 ns/row while
   the gathered table is under ~100 MB, ~12.6 ns/row above (f32 X at
   n=262k d=128 is 134 MB -> slow; the bf16 copy is 67 MB -> fast).  A
   bf16 table with f32 accumulation ran 2.8x faster end-to-end at 4e-3
   relative error (fine for diffusion/threshold/GD solvers; exact CG
   keeps f32).  A hi/lo bf16x2 split-table was measured WORSE than f32
   (two tables re-enter the slow regime) — rejected.
2. **Slot padding is pure loss** at ~4.5 ns/slot: a single kcap=p95
   ELL pads the 30-d surrogate's 7.07M edges to 16.8M slots (2.4x).
   Sorting rows by degree and segmenting at power-of-2-ish boundaries
   bounds padding by the segment granularity instead.

``GatherSpMM`` = rows sorted by degree, split into static segments, each
segment a tight (rows_i, k_i) ELL gathered slot-by-slot; everything runs
in degree-sorted (permuted) space like ``AccelSpMM`` so chained solver
iterations pay the permutation twice total, not per step.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from graphlearning_tpu import config as _config

# segment kcap boundaries: padding within a segment is bounded by the
# gap to the next boundary (≤33%); degree-0 rows fold into the first.
# GLT_GATHER_BOUNDS=dense selects a finer table (≤14% gap in the kNN
# bulk) — more segments for less slot padding.  Measured on the 30-d
# band-hostile headline graph (real v5e): padding 1.184 -> 1.026 but
# throughput 225.7 -> 198.7 M e/s — the extra per-segment gather
# launches cost more than the 13% slot savings, so the coarse table
# stays the default (the knob remains for skewed-degree graphs).
_BOUNDS = (4, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512,
           768, 1024, 2048, 4096)
if os.environ.get("GLT_GATHER_BOUNDS") == "dense":
    _BOUNDS = tuple(range(4, 64, 2)) + (
        64, 72, 80, 88, 96, 112, 128, 160, 192, 224, 256, 320, 384,
        448, 512, 640, 768, 1024, 1536, 2048, 3072, 4096)

# measured v5e gather-table cliff (see module docstring): tables under
# this stay at the ~4.5ns/row rate
_FAST_TABLE_BYTES = 100e6


class GatherSpMM:
    """Degree-sorted segmented gather SpMM for one graph.

    ``prec``: "f32" (exact) or "bf16" (table cast to bf16, f32
    accumulate — ~4e-3 rel err, 2.8x measured at n=262k d=128).
    "auto" picks bf16 only when the f32 table would cross the measured
    slow-table cliff for ``d_hint`` columns."""

    def __init__(self, W, prec: str = "f32", d_hint: int = 128):
        import scipy.sparse as sp

        W = sp.csr_matrix(W)
        n = W.shape[0]
        self.n = n
        self.nnz = int(W.nnz)
        deg = np.diff(W.indptr)
        order = np.argsort(deg, kind="stable")
        self.order = order
        self.inv = np.argsort(order)
        # "auto" resolves per-call from the actual table bytes (static at
        # trace time): solver sweeps at d=#classes keep the fast f32
        # table; only genuinely large tables take the bf16 copy
        self.prec = prec

        deg_s = deg[order]
        bounds = _BOUNDS
        if len(deg_s) and int(deg_s[-1]) > bounds[-1]:
            # mega-hub beyond the table: one extra segment at the actual
            # max degree (rounded up to a sublane multiple)
            bounds = bounds + (-(-int(deg_s[-1]) // 8) * 8,)
        # segment ends at the last row whose degree fits each boundary
        self.segs = []          # (start, end, kcap) static metadata
        cols_list, vals_list = [], []
        start = 0
        for kcap in bounds:
            end = int(np.searchsorted(deg_s, kcap, side="right"))
            if end <= start:
                continue
            rows = order[start:end]
            a = W.indptr[rows].astype(np.int64)
            dseg = deg[rows].astype(np.int64)
            s_grid = np.arange(kcap, dtype=np.int64)[None, :]
            valid = s_grid < dseg[:, None]
            flat = np.minimum(a[:, None] + np.minimum(
                s_grid, np.maximum(dseg[:, None] - 1, 0)),
                max(self.nnz - 1, 0))
            # columns remapped to permuted space: the gather table is X
            # in degree-sorted order; invalid slots self-point with val 0
            cols = np.where(valid, self.inv[W.indices[flat]],
                            self.inv[rows][:, None]).astype(np.int32)
            vals = np.where(valid, W.data[flat], 0.0).astype(
                np.dtype(_config.float_dtype()))
            cols_list.append(jnp.asarray(cols))
            vals_list.append(jnp.asarray(vals))
            self.segs.append((start, end, kcap))
            start = end
            if end == n:
                break
        assert start == n, "degree exceeds the largest segment boundary"
        self.cols = tuple(cols_list)
        self.vals = tuple(vals_list)
        self._order_dev = jnp.asarray(order)
        self._inv_dev = jnp.asarray(self.inv)

    # -- index maps (once per solve, outside iteration loops) -------------

    def to_perm(self, X):
        return jnp.take(jnp.asarray(X), self._order_dev, axis=0)

    def from_perm(self, Xp):
        return jnp.take(jnp.asarray(Xp), self._inv_dev, axis=0)

    # -- the SpMM (use inside jitted loops; all arrays are traced args) ---

    def spmm(self, Xp):
        """``(W @ X)`` in permuted space: ``Xp`` (n, d) degree-sorted."""
        return _seg_spmm(self.cols, self.vals, Xp,
                         segs=tuple(self.segs), prec=self.prec)


def _spmm_of(cols, vals, segs, prec):
    """Build the traceable segmented-gather spmm closure (permuted
    space)."""
    def spmm(Xp):
        if Xp.ndim == 1:
            return spmm(Xp[:, None])[:, 0]
        use_bf16 = prec == "bf16" or (
            prec == "auto"
            and Xp.shape[0] * Xp.shape[1] * Xp.dtype.itemsize
            > _FAST_TABLE_BYTES)
        table = Xp.astype(jnp.bfloat16) if use_bf16 else Xp
        # accumulate in f32 (or f64 on the x64 CPU parity path)
        adt = jnp.float64 if Xp.dtype == jnp.float64 else jnp.float32
        outs = []
        for (start, end, kcap), c, v in zip(segs, cols, vals):
            m = end - start
            if kcap >= 128:
                # hub segments: few rows, many slots — one flat take +
                # einsum instead of kcap unrolled ops (trace size) and
                # the (m, kcap, d) intermediate stays small (m is tiny)
                g = jnp.take(table, c.reshape(-1), axis=0).astype(
                    adt).reshape(m, kcap, Xp.shape[1])
                outs.append(jnp.einsum("mk,mkd->md", v.astype(adt), g))
                continue
            acc = jnp.zeros((m, Xp.shape[1]), adt)
            for s in range(kcap):
                acc = acc + v[:, s:s + 1].astype(adt) * jnp.take(
                    table, c[:, s], axis=0).astype(adt)
            outs.append(acc)
        return jnp.concatenate(outs, axis=0).astype(Xp.dtype)

    return spmm


@functools.partial(jax.jit, static_argnames=("segs", "prec"))
def _seg_spmm(cols, vals, Xp, *, segs, prec):
    return _spmm_of(cols, vals, segs, prec)(Xp)


class GatherAccel(GatherSpMM):
    """Drop-in for :class:`ops.accel.AccelSpMM` on band-hostile graphs:
    the same solver-program surface (cg_scaled, laplace_constrained,
    poisson_gd, heat_steps, poisson_mbo, volume_mbo, dual_conv_labels,
    centered_kernel, incres, eig_normalized) with the segmented gather as
    the SpMM instead of a dense band.  Band-only entries are absent by
    design — callers gate them on ``materialize``/``rect_band_ok`` which
    report False here, so the lip/Bellman-Ford families take their
    existing fallbacks.

    Measured motivation (scripts/dispatch_calib.py, v5e, 30-d surrogate
    n=70k hub degree 333): full-ELL fallback 15.0 M e/s (66.6 ns/edge,
    OOM at d=128 from the (n, k_max, d) gather); this operator 181.9 M
    e/s at 1.17x slot padding — 12x — while the dense band was rejected
    (RCM p95 bandwidth ~n/2)."""

    materialize = False
    _tiles = None
    interpret = False
    n_resid = 0
    Wwin = 0

    def __init__(self, W, prec="f32", d_hint=128):
        super().__init__(W, prec=prec, d_hint=d_hint)
        self.n_pad = self.n
        self.mode = self.prec
        self.kcap = max(kc for _, _, kc in self.segs)
        self.perm = self.order
        self._segs = tuple(self.segs)

    def rect_band_ok(self):
        return False

    def rect_band_bytes(self):
        return 0

    # -- index maps (fill accepted for AccelSpMM signature parity; there
    # are no padding rows, so it is unused) -------------------------------

    def to_perm(self, X, fill=0.0):
        return jnp.take(jnp.asarray(X), self._order_dev, axis=0)

    def _args(self):
        return (self.cols, self.vals)

    def _statics(self, **kw):
        return dict(segs=self._segs, prec=self.prec, **kw)

    # -- solver entries (jit-cached module programs, arrays as args) ------

    def cg_scaled(self, s_p, b, c0=1.0, c1=1.0, tol=1e-10, max_iter=10**5,
                  x0=None):
        return _cg_scaled_g(*self._args(), s_p, b, c0, c1, tol, x0,
                            **self._statics(max_iter=int(max_iter)))

    def laplace_constrained(self, deg_p, diag_p, tau_p, mask_p, bdy_p, tol,
                            normalization="combinatorial", order=1,
                            max_iter=10**5, u0_p=None):
        return _laplace_constrained_g(
            *self._args(), deg_p, diag_p, tau_p, mask_p, bdy_p, tol, u0_p,
            **self._statics(normalization=normalization, order=int(order),
                            max_iter=int(max_iter)))

    def poisson_gd(self, deg_p, Db_p, v0_p, min_iter: int, max_iter: int,
                   n_true: int):
        return _poisson_gd_g(
            *self._args(), deg_p, Db_p, v0_p,
            **self._statics(min_iter=int(min_iter),
                            max_iter=int(max_iter), n_true=int(n_true)))

    def heat_steps(self, deg_p, u_p, Db_p, dt, Ns: int):
        return _heat_steps_g(*self._args(), deg_p, u_p, Db_p,
                             jnp.asarray(dt, u_p.dtype),
                             **self._statics(Ns=int(Ns)))

    def poisson_mbo(self, deg_p, Db_p, u0, w0, priors, dt, Ns: int, T: int):
        return _poisson_mbo_g(
            *self._args(), deg_p, Db_p, jnp.asarray(u0), jnp.asarray(w0),
            jnp.asarray(priors), jnp.asarray(dt, deg_p.dtype),
            self._order_dev, self._inv_dev,
            **self._statics(Ns=int(Ns), T=int(T)))

    def dual_conv_labels(self, dinv_p, labels, k: int):
        return _dual_conv_g(*self._args(), dinv_p, jnp.asarray(labels),
                            self._order_dev, self._inv_dev,
                            **self._statics(k=int(k)))

    def volume_mbo(self, dinv_p, labels0, fixed_mask, fixed_labels, lower,
                   upper, temp, key, k: int, max_iters: int):
        return _volume_mbo_g(
            *self._args(), dinv_p, jnp.asarray(labels0), self._order_dev,
            self._inv_dev, fixed_mask, fixed_labels, lower, upper,
            jnp.asarray(temp, dinv_p.dtype), key,
            **self._statics(k=int(k), max_iters=int(max_iters),
                            n_true=int(self.n)))

    def incres(self, dinv_p, u0, key, k: int, T: int, Dm: int,
               n_true: int):
        return _incres_g(*self._args(), dinv_p, jnp.asarray(u0, jnp.int32),
                         key, self._order_dev, self._inv_dev,
                         **self._statics(k=int(k), T=int(T), Dm=int(Dm),
                                         n_true=int(n_true)))

    def centered_kernel(self, K_p, mask_p, alpha_factor, tol, key,
                        power_it: int, n_true: int, max_iter: int = 10**5):
        return _centered_kernel_g(
            *self._args(), K_p, mask_p,
            jnp.asarray(alpha_factor, K_p.dtype),
            jnp.asarray(tol, K_p.dtype), key,
            **self._statics(power_it=int(power_it), n_true=int(n_true),
                            max_iter=int(max_iter)))

    def eig_normalized(self, s_p, k: int, m: int = 200, power: int = 8,
                       key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        X0 = jax.random.normal(key, (self.n, k), dtype=s_p.dtype)
        return _eig_norm_g(*self._args(), s_p, X0,
                           **self._statics(power=int(power), m=int(m)))

    # distance solvers gate on this (eikonal.dijkstra/_hl, peikonal warm
    # start): the segmented min-plus replaces the full-ELL gather BF,
    # whose kcap-sized rounds dominated volume_mbo's Voronoi init on
    # hub-degree graphs (measured 2.46 s vs 0.27 s warm at config 4b)
    supports_bellman_ford = True

    def bellman_ford(self, d0, f, hopf_lax: bool = False,
                     recip: bool = False, max_iter: int = 10**6):
        """Min-plus Bellman-Ford to the Dijkstra/Hopf-Lax fixed point on
        the segmented gather (AccelSpMM.bellman_ford contract: ORIGINAL-
        order ``d0``/``f`` in, ``(d, cp)`` out; cp carries original node
        ids, -1 where unreached)."""
        d0 = jnp.asarray(d0, jnp.float32)
        bdy = d0 < _BF_BIG * 0.5
        cp0 = jnp.where(bdy, jnp.arange(self.n), -1).astype(jnp.int32)
        d_p, cp_p = _bellman_ford_gather(
            *self._args(), self._order_dev, self._inv_dev,
            self.to_perm(d0), self.to_perm(cp0),
            self.to_perm(jnp.asarray(f, jnp.float32)),
            **self._statics(hopf_lax=bool(hopf_lax), recip=bool(recip),
                            max_iter=int(max_iter)))
        return self.from_perm(d_p), self.from_perm(cp_p)


_G_STATICS = ("segs", "prec", "max_iter")


@functools.partial(jax.jit, static_argnames=_G_STATICS)
def _cg_scaled_g(cols, vals, s_p, b, c0, c1, tol, x0=None, *, segs, prec,
                 max_iter):
    from graphlearning_tpu.solvers import cg as _cg

    spmm = _spmm_of(cols, vals, segs, prec)

    def A(X):
        return c0 * X - c1 * s_p[:, None] * spmm(s_p[:, None] * X)

    x, _, _ = _cg.conjgrad(A, b, x0=x0, tol=tol, max_iter=max_iter)
    return x


@functools.partial(jax.jit,
                   static_argnames=("normalization", "order") + _G_STATICS)
def _laplace_constrained_g(cols, vals, deg_p, diag_p, tau_p, mask_p, bdy_p,
                           tol, u0_p=None, *, normalization, order, segs,
                           prec, max_iter):
    from graphlearning_tpu.solvers import cg as _cg

    spmm = _spmm_of(cols, vals, segs, prec)
    if normalization == "combinatorial":
        matvec = lambda X: deg_p[:, None] * X - spmm(X)
    elif normalization == "randomwalk":
        dinv = jnp.where(deg_p > 0,
                         1.0 / jnp.where(deg_p == 0, 1.0, deg_p), 0.0)
        matvec = lambda X: X - dinv[:, None] * spmm(X)
    else:  # normalized
        s = jnp.where(deg_p > 0,
                      jnp.where(deg_p == 0, 1.0, deg_p) ** -0.5, 0.0)
        matvec = lambda X: X - s[:, None] * spmm(s[:, None] * X)

    def L(X):
        Y = X
        for _ in range(order):
            Y = tau_p[:, None] * Y + matvec(Y)
        return Y

    Ldiag = (tau_p + diag_p) ** order
    u, _, _ = _cg.constrained_solve(L, Ldiag, mask_p, bdy_p, tol=tol,
                                    max_iter=max_iter, u0=u0_p)
    return u


@functools.partial(jax.jit, static_argnames=("min_iter", "n_true")
                   + _G_STATICS)
def _poisson_gd_g(cols, vals, deg_p, Db_p, v0_p, *, min_iter, n_true, segs,
                  prec, max_iter):
    spmm = _spmm_of(cols, vals, segs, prec)
    dinv = jnp.where(deg_p > 0, 1.0 / jnp.where(deg_p == 0, 1.0, deg_p),
                     0.0)
    vinf = deg_p / jnp.sum(deg_p)

    def cond(state):
        u, v, T = state
        not_mixed = jnp.max(jnp.abs(v - vinf)) > 1.0 / n_true
        return jnp.logical_and(
            jnp.logical_or(T < min_iter, not_mixed), T < max_iter)

    def body(state):
        u, v, T = state
        u = Db_p + dinv[:, None] * spmm(u)
        v = spmm(dinv * v)
        return u, v, T + 1

    u0 = jnp.zeros_like(Db_p)
    u, _, _ = jax.lax.while_loop(cond, body, (u0, v0_p, 0))
    return u


@functools.partial(jax.jit, static_argnames=("Ns",) + tuple(
    s for s in _G_STATICS if s != "max_iter"))
def _heat_steps_g(cols, vals, deg_p, u_p, Db_p, dt, *, Ns, segs, prec):
    spmm = _spmm_of(cols, vals, segs, prec)

    def body(j, u):
        Lu = deg_p[:, None] * u - spmm(u)
        return u - dt * Lu + Db_p

    return jax.lax.fori_loop(0, Ns, body, u_p)


@functools.partial(jax.jit, static_argnames=("Ns", "T") + tuple(
    s for s in _G_STATICS if s != "max_iter"))
def _poisson_mbo_g(cols, vals, deg_p, Db_p, u0, w0, priors, dt, order_dev,
                   inv_dev, *, Ns, T, segs, prec):
    from graphlearning_tpu.solvers import volume as _volume

    spmm = _spmm_of(cols, vals, segs, prec)

    def heat_steps(u_p):
        def body(j, u):
            Lu = deg_p[:, None] * u - spmm(u)
            return u - dt * Lu + Db_p

        return jax.lax.fori_loop(0, Ns, body, u_p)

    u0_p = jnp.take(u0, order_dev, axis=0)
    uj_p, w, err = _volume.poisson_mbo_loop(heat_steps, u0_p, w0, priors,
                                            T)
    return jnp.take(uj_p, inv_dev, axis=0), w, err


@functools.partial(jax.jit, static_argnames=("k",) + tuple(
    s for s in _G_STATICS if s != "max_iter"))
def _dual_conv_g(cols, vals, dinv_p, labels, order_dev, inv_dev, *, k,
                 segs, prec):
    spmm = _spmm_of(cols, vals, segs, prec)
    u = jax.nn.one_hot(labels, k, dtype=dinv_p.dtype)
    u_p = jnp.take(u, order_dev, axis=0)
    a = dinv_p[:, None] * spmm(u_p)
    a = dinv_p[:, None] * spmm(a)
    return jnp.take(a, inv_dev, axis=0)


@functools.partial(jax.jit, static_argnames=("k", "max_iters", "n_true")
                   + tuple(s for s in _G_STATICS if s != "max_iter"))
def _volume_mbo_g(cols, vals, dinv_p, labels0, order_dev, inv_dev,
                  fixed_mask, fixed_labels, lower, upper, temp, key, *, k,
                  max_iters, n_true, segs, prec):
    from graphlearning_tpu.solvers import volume as _volume

    spmm = _spmm_of(cols, vals, segs, prec)

    def dual_conv(labels):
        u = jax.nn.one_hot(labels, k, dtype=dinv_p.dtype)
        u_p = jnp.take(u, order_dev, axis=0)
        a = dinv_p[:, None] * spmm(u_p)
        a = dinv_p[:, None] * spmm(a)
        return jnp.take(a, inv_dev, axis=0)

    return _volume.mbo_loop(dual_conv, labels0, fixed_mask, fixed_labels,
                            lower, upper, temp, key, n_true=n_true,
                            max_iters=max_iters)


@functools.partial(jax.jit, static_argnames=("k", "T", "Dm", "n_true")
                   + tuple(s for s in _G_STATICS if s != "max_iter"))
def _incres_g(cols, vals, dinv_p, u0, key, order_dev, inv_dev, *, k, T, Dm,
              n_true, segs, prec):
    """Fused INCRES loop (mirrors clustering._incres_loop_xla with the
    segmented-gather spmm; labels in ORIGINAL order, diffusion in
    permuted space)."""
    spmm = _spmm_of(cols, vals, segs, prec)
    n = u0.shape[0]
    max_m = 1 + (T - 1) * Dm
    neg_inf = -jnp.inf

    def grow(F_p):
        def cond(state):
            F, it = state
            return jnp.logical_and(jnp.min(F) == 0, it < n)

        def body(state):
            F, it = state
            return spmm(dinv_p[:, None] * F), it + 1

        return jax.lax.while_loop(cond, body, (F_p, 0))[0]

    def round_fn(carry, i):
        u, key = carry
        key, sub = jax.random.split(key)
        scores = jax.random.uniform(sub, (k, n))
        member = u[None, :] == jnp.arange(k)[:, None]
        member = member | (~jnp.any(member, axis=1))[:, None]
        s = jnp.where(member, scores, neg_inf)
        top_vals, top_idx = jax.lax.top_k(s, max_m)
        m_i = 1 + i * Dm
        take = ((jnp.arange(max_m)[None, :] < m_i)
                & (top_vals > neg_inf)).astype(dinv_p.dtype)
        F = jnp.zeros((n, k), dinv_p.dtype)
        F = F.at[top_idx, jnp.arange(k)[:, None]].add(take)
        F_p = grow(jnp.take(F, order_dev, axis=0))
        F = jnp.take(F_p, inv_dev, axis=0)
        return (jnp.argmax(F, axis=1).astype(jnp.int32), key), None

    (u, _), _ = jax.lax.scan(round_fn, (u0, key), jnp.arange(T))
    return u


@functools.partial(jax.jit, static_argnames=("power_it", "n_true")
                   + _G_STATICS)
def _centered_kernel_g(cols, vals, K_p, mask_p, alpha0, tol, key, *,
                       power_it, n_true, segs, prec, max_iter):
    spmm = _spmm_of(cols, vals, segs, prec)
    dtype = K_p.dtype
    n = K_p.shape[0]

    def center(X):
        return X - jnp.mean(X, axis=0, keepdims=True)

    def A(X):
        return center(spmm(center(X)))

    e = jax.random.normal(key, (n, 1), dtype=dtype)

    def pbody(i, e):
        w = A(e)
        return w / jnp.linalg.norm(w)

    e = jax.lax.fori_loop(0, power_it, pbody, e)
    lam = jnp.abs(jnp.vdot(e, A(e)) / jnp.vdot(e, e))
    alpha = alpha0 * lam

    def cond(state):
        u, err, it = state
        return jnp.logical_and(err > tol, it < max_iter)

    def body(state):
        u, err, it = state
        w = A(u) / alpha - u
        w = jnp.where(mask_p[:, None], 0.0, w)
        err = jnp.max(jnp.abs(w))
        return u + w, err, it + 1

    u, _, _ = jax.lax.while_loop(
        cond, body, (K_p, jnp.asarray(jnp.inf, dtype), 0))
    return u


_BF_BIG = 1e30


@functools.partial(jax.jit, static_argnames=("hopf_lax", "recip")
                   + _G_STATICS)
def _bellman_ford_gather(cols, vals, order, inv, d0_p, cp0_p, f_p, *,
                         hopf_lax, recip, segs, prec, max_iter):
    """Segmented min-plus relaxation (mirrors eikonal._bellman_ford on
    the degree-sorted layout; permuted space; cp values = original ids)."""
    big = jnp.float32(_BF_BIG)

    def relax(state):
        d, cp, err, it = state
        bests, args_ = [], []
        for (start, end, kcap), c, v in zip(segs, cols, vals):
            v = v.astype(jnp.float32)    # distances run f32 (x64 parity
            w = jnp.where(v > 0, 1.0 / jnp.where(v == 0, 1.0, v), 0.0) \
                if recip else v          # path stores vals f64)
            dn = jnp.take(d, c)                  # (m, kcap)
            fn = jnp.take(f_p, c)
            if hopf_lax:
                fw = w * fn
                cand = 0.5 * (fw + jnp.sqrt(fw * fw + 4.0 * dn * dn))
            else:
                cand = dn + w * fn
            cand = jnp.where(v > 0, cand, big)
            bests.append(jnp.min(cand, axis=1))
            s = jnp.argmin(cand, axis=1)
            args_.append(jnp.take_along_axis(c, s[:, None], axis=1)[:, 0])
        best = jnp.concatenate(bests)
        arg = jnp.concatenate(args_)
        upd = best < d
        cp_cand = jnp.take(cp, arg)
        d_new = jnp.where(upd, best, d)
        cp_new = jnp.where(upd, cp_cand, cp)
        err = jnp.max(jnp.where(upd, d - d_new, 0.0))
        return d_new, cp_new, err, it + 1

    def cond(state):
        d, cp, err, it = state
        return jnp.logical_and(err > 0, it < max_iter)

    d, cp, _, _ = jax.lax.while_loop(
        cond, relax, (d0_p, cp0_p, jnp.asarray(jnp.inf, jnp.float32), 0))
    return d, cp


@functools.partial(jax.jit, static_argnames=("power", "m") + tuple(
    s for s in _G_STATICS if s != "max_iter"))
def _eig_norm_g(cols, vals, s_p, X0, *, power, m, segs, prec):
    from jax.experimental.sparse.linalg import lobpcg_standard

    spmm = _spmm_of(cols, vals, segs, prec)

    def base(X):  # I + D^-1/2 W D^-1/2, spectrum in [0, 2]
        return X + s_p[:, None] * spmm(s_p[:, None] * X)

    def op(X):
        # fori_loop, NOT an unrolled Python loop: the segmented-gather
        # body is large (hundreds of per-slot takes), and unrolling it
        # `power` times multiplied the compiled executable ~8x (measured
        # 252 MB -> the AOT pack's 221 s first-load; HLO 5.0 -> 0.7 MB
        # after rolling)
        return jax.lax.fori_loop(0, power, lambda i, Y: base(Y), X)

    theta, U, _ = lobpcg_standard(op, X0, m=m)
    rq = jnp.sum(U * base(U), axis=0) / jnp.sum(U * U, axis=0)
    return 2.0 - rq, U
