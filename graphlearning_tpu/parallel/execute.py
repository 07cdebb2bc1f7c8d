"""Sharded model execution — the distribution layer the models run on.

This module turns a :class:`graphlearning_tpu.config.GLTConfig` (or a bare
``jax.sharding.Mesh``) into a :class:`Distributor` that

* row-partitions a graph's padded-ELL arrays over the config's node axis
  (node count padded to a multiple of the axis size; padding rows have
  degree 0 and self-pointing columns, so every solver treats them as
  zero-value boundary rows),
* places per-fit inputs (sources, masks, boundary values) with matching
  ``NamedSharding``s, and
* runs the SAME jitted solver programs the single-chip path uses — the
  solvers are pure functions of device arrays, so GSPMD partitions them
  from the argument shardings alone (XLA inserts the all_gather for the
  neighbor gather and psum for the CG dot products over ICI).

Models opt in via ``model.distribute(mesh)`` (see ``ssl.ssl.distribute``);
``fit``/``fit_predict``/``ssl_trials`` then execute sharded with identical
results (up to float reduction order) — SURVEY.md §7.1 item 4 / §7.2 step
6.  The reference has no distributed runtime at all (SURVEY.md §2.3); its
closest analogues are joblib trial forking (reference ssl.py:390-396) and
the optional single-GPU torch offload (reference ssl.py:649-663).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graphlearning_tpu import config as _config
from graphlearning_tpu.core.sparse import SparseGraph
from graphlearning_tpu.ops import graphops as _ops


class Distributor:
    """Runtime handle for one mesh: shardings + graph/input placement.

    Construct from a ``GLTConfig``, a ``Mesh``, or ``"auto"`` (1-D mesh
    over all local devices)."""

    def __init__(self, spec="auto"):
        if isinstance(spec, Distributor):
            cfg, mesh = spec.config, spec.mesh
        elif isinstance(spec, Mesh):
            cfg, mesh = None, spec
        elif isinstance(spec, _config.GLTConfig):
            cfg, mesh = spec, spec.make_mesh()
        elif spec == "auto" or spec is None:
            cfg = _config.GLTConfig()
            mesh = cfg.make_mesh()
        else:
            raise TypeError(f"cannot build a Distributor from {spec!r}")
        self.config = cfg or _config.GLTConfig(
            mesh_axes=mesh.axis_names, node_axis=mesh.axis_names[0])
        self.mesh = mesh
        self.axis = self.config.node_axis
        if self.axis not in mesh.axis_names:
            raise ValueError(
                f"node axis {self.axis!r} not in mesh axes {mesh.axis_names}")
        self.P = int(mesh.shape[self.axis])
        # cache key for per-W sharded graphs (device identity + axis)
        self._key = (tuple(str(d) for d in mesh.devices.flat),
                     mesh.axis_names, self.axis)

    # -- sharded SpMM operator selection -----------------------------------

    def _band_params(self):
        """Resolve (R, WT, mode, interpret) for the banded kernel from the
        config + backend (f64 interpret on the CPU parity mesh)."""
        cpu = jax.default_backend() == "cpu"
        R = self.config.band_R or (64 if cpu else 512)
        WT = self.config.band_WT or R
        if self.config.band_mode:
            mode = self.config.band_mode
        elif cpu and jax.config.jax_enable_x64:
            mode = "f64"
        else:
            # exact f32 (Mosaic HIGHEST): solver programs share one
            # operator per (graph, mesh) across tolerances, and the tight
            # CG tolerances (1e-8) diverge on a bf16x3 operator (measured
            # on the real chip: poisson agreement fell to 0.66).  Users
            # can opt into bf16x3/bf16 via band_mode for loose-tolerance
            # diffusion workloads.
            mode = "f32"
        return R, WT, mode, cpu

    def operator(self, W, transpose: bool = False,
                 need_slots: bool = False):
        """The sharded SpMM operator for ``W``: a
        :class:`band_shard.ShardedOp` (partitioned tiled-band Pallas
        kernel + ppermute halo exchange — the fast path, round-2 verdict
        item 1), a :class:`parallel.shard.ShardedBucketedGraph` (capped
        ELL + replicated spill — degree-skewed band-hostile graphs), or
        a row-sharded padded-ELL :class:`SparseGraph` (GSPMD gather).
        Returns ``(op, n_original)``; ``op.n`` is the padded node count
        all per-node arrays must match (``put_rows(..., op=op)``), and
        banded ops carry an RCM permutation that ``put_rows``/``gather``
        apply transparently.

        ``need_slots``: callers whose programs index per-slot neighbor
        structure beyond ``ops.neighbor_take`` (the distance/lip family
        fallbacks) get the full-ELL graph instead of the capped hybrid.

        Kernel choice (``config.sharded_kernel``): "banded"/"gspmd" force;
        "auto" uses the band on TPU backends when the graph is not
        band-hostile (accel's RCM-bandwidth pre-gate — measured: banding
        the 30-d hub surrogate OOM'd at 16.7 GB) and covers
        ``1 - band_max_residual`` of the edges.  Cached per (W, mesh,
        kernel)."""
        kernel = self.config.sharded_kernel
        R, WT, mode, cpu = self._band_params()
        key = (self._key, "op", kernel, bool(transpose),
               bool(need_slots), R, WT, mode)
        cache = getattr(W, "_glt_shard_cache", None)
        if isinstance(cache, dict) and key in cache:
            return cache[key]
        n = W.shape[0]
        use_band = kernel == "banded"
        if kernel == "auto":
            # CPU backends run Pallas in interpret mode — slower than the
            # XLA gather, so auto only takes the band on real TPU, and only
            # when the per-device block is at least a few tiles tall
            use_band = (not cpu) and n >= 4 * self.P * max(R, WT)
            if use_band:
                from graphlearning_tpu.ops.accel import _band_hostile

                try:
                    use_band = not _band_hostile(W)
                except Exception:    # pragma: no cover
                    use_band = False
        entry = None
        if use_band:
            try:
                entry = self._build_band_op(W, R, WT, mode, cpu, transpose,
                                            strict=(kernel == "banded"))
            except Exception:
                if kernel == "banded":
                    raise
                entry = None       # defensive: fall through to gather
        if entry is None:
            Wd = W.T.tocsr() if transpose else W
            if not need_slots and self._degree_skewed(Wd):
                from graphlearning_tpu.parallel.shard import (
                    build_sharded_bucketed)

                g, n = build_sharded_bucketed(Wd, self.mesh, self.axis,
                                              self.P,
                                              dtype=self.config.resolve_dtype())
                entry = (g, n)
            else:
                g, n = self.shard_graph(Wd)
                entry = (g, n)
        try:
            if not isinstance(cache, dict):
                W._glt_shard_cache = cache = {}
            cache[key] = entry
        except Exception:
            pass
        return entry

    @staticmethod
    def _degree_skewed(W) -> bool:
        """True when a full padded ELL would waste >2x the slots of a
        p95-capped hybrid (hub-degree graphs: the 30-d surrogate's hub
        degree is ~30x its median)."""
        import scipy.sparse as sp

        Wc = sp.csr_matrix(W)
        deg = np.diff(Wc.indptr)
        if len(deg) == 0 or deg.max() == 0:
            return False
        return float(deg.max()) > 2.0 * float(np.percentile(deg, 95))

    def _build_band_op(self, W, R, WT, mode, interpret, transpose,
                       strict=False):
        """RCM-reorder W and build the partitioned band operator; returns
        None (gspmd fallback) when the band can't cover the graph within
        ``band_max_residual`` unless ``strict``."""
        import scipy.sparse as sp
        from scipy.sparse.csgraph import reverse_cuthill_mckee
        from graphlearning_tpu.parallel.band_shard import make_sharded_op

        if isinstance(W, SparseGraph):
            W = W.to_scipy()
        W = sp.csr_matrix(W)
        if transpose:
            W = W.T.tocsr()
        perm = np.asarray(reverse_cuthill_mckee(W, symmetric_mode=True))
        Wp = W[perm, :][:, perm].tocsr()
        op = make_sharded_op(Wp, self.mesh, axis=self.axis, R=R, WT=WT,
                             mode=mode, interpret=interpret,
                             ell_dtype=self.config.resolve_dtype())
        if (not strict
                and op.residual_frac > self.config.band_max_residual):
            return None
        op._perm = perm
        return op, W.shape[0]

    # -- shardings ---------------------------------------------------------

    def rows(self, ndim: int = 2) -> NamedSharding:
        """Leading (node) axis sharded, rest replicated."""
        return NamedSharding(self.mesh, P(self.axis, *([None] * (ndim - 1))))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    # -- placement ---------------------------------------------------------

    def pad_rows(self, X, fill=0.0, n_pad=None):
        """Host-side pad of the leading axis to the padded node count."""
        X = np.asarray(X)
        extra = ((n_pad - X.shape[0]) if n_pad is not None
                 else (-X.shape[0]) % self.P)
        if extra:
            pad = np.full((extra,) + X.shape[1:], fill, dtype=X.dtype)
            X = np.concatenate([X, pad])
        return X

    def put_rows(self, X, fill=0.0, dtype=None, op=None):
        """Pad + device_put a per-node array with the row sharding.  With
        ``op`` (from :meth:`operator`): apply the operator's RCM
        permutation (banded ops solve in permuted space) and pad to the
        operator's node count."""
        X = np.asarray(X)
        perm = getattr(op, "_perm", None)
        if perm is not None:
            X = X[perm]
        X = self.pad_rows(X, fill=fill,
                          n_pad=(op.n if op is not None else None))
        if dtype is not None:
            X = X.astype(dtype)
        return jax.device_put(jnp.asarray(X), self.rows(X.ndim))

    def shard_graph(self, W) -> tuple[SparseGraph, int]:
        """Row-shard a graph over the node axis.

        ``W``: scipy sparse matrix (or ``SparseGraph``).  Returns
        ``(sharded_graph, n_original)``; padding rows have degree 0,
        ``vals == 0`` and self-pointing columns.  Cached on the W object so
        repeated fits (trials, model families sharing a graph) pay one
        transfer."""
        cache = getattr(W, "_glt_shard_cache", None)
        if isinstance(cache, dict) and self._key in cache:
            return cache[self._key]
        if isinstance(W, SparseGraph):
            cols, vals, deg = (np.asarray(W.cols), np.asarray(W.vals),
                               np.asarray(W.deg))
            n = W.n
        else:
            cols, vals, deg = SparseGraph.ell_from_scipy(W)
            n = W.shape[0]
        n_extra = (-n) % self.P
        if n_extra:
            k = cols.shape[1]
            pad_cols = np.repeat(
                np.arange(n, n + n_extra, dtype=cols.dtype)[:, None], k,
                axis=1)
            cols = np.concatenate([cols, pad_cols])
            vals = np.concatenate(
                [vals, np.zeros((n_extra, k), vals.dtype)])
            deg = np.concatenate([deg, np.zeros(n_extra, deg.dtype)])
        dtype = self.config.resolve_dtype()
        g = SparseGraph(
            cols=jax.device_put(
                jnp.asarray(cols, dtype=_config.index_dtype), self.rows(2)),
            vals=jax.device_put(jnp.asarray(vals, dtype=dtype), self.rows(2)),
            deg=jax.device_put(
                jnp.asarray(deg, dtype=_config.index_dtype), self.rows(1)),
            n=cols.shape[0],
            k=cols.shape[1],
        )
        entry = (g, n)
        try:
            if not isinstance(cache, dict):
                W._glt_shard_cache = cache = {}
            cache[self._key] = entry
        except Exception:
            pass
        return entry

    def valid_mask(self, n_orig: int, n_pad: int, op=None):
        """(n_pad,) bool — True on real rows, sharded over the node axis.
        (Permutation-independent: RCM permutes real rows among themselves;
        padding is always appended after them.)"""
        v = np.zeros(n_pad, dtype=bool)
        v[:n_orig] = True
        return jax.device_put(jnp.asarray(v), self.rows(1))

    def gather(self, X, n_orig: int, op=None):
        """Device -> host, truncating mesh-padding rows and undoing the
        operator's RCM permutation (if any)."""
        out = np.asarray(X)[:n_orig]
        perm = getattr(op, "_perm", None)
        if perm is not None:
            res = np.empty_like(out)
            res[perm] = out
            return res
        return out


# =========================================================================
# Sharded solver programs (guarded for degree-0 mesh-padding rows).
# Mirrors the math of the single-chip entries (ssl._laplace_constrained,
# ssl._cg_scaled_solve, ssl._poisson_mbo_loop_xla, ssl._volume_mbo_loop_xla,
# ops.accel._poisson_gd_accel) — padding rows behave as decoupled
# zero-boundary rows, so results equal the unsharded ones up to float
# reduction order.
# =========================================================================


def safe_inv_sqrt_deg(deg):
    """``deg^{-1/2}`` with 0 on zero-degree (padding) rows."""
    return jnp.where(deg > 0, jnp.where(deg == 0, 1.0, deg) ** -0.5, 0.0)


def safe_inv_deg(deg):
    return jnp.where(deg > 0, 1.0 / jnp.where(deg == 0, 1.0, deg), 0.0)


@functools.partial(jax.jit,
                   static_argnames=("min_iter", "max_iter", "n_true"))
def _poisson_gd_sharded(g, deg, Db, v0, *, min_iter, max_iter, n_true):
    """Poisson gradient descent ``u <- Db + D^{-1} W u`` with the
    random-walk mixing-time stop (reference ssl.py:631-677), padding-aware:
    ``vinf`` is 0 on padding rows (deg 0) and the 1/n threshold uses the
    true node count.  Asymmetric W is supported via the caller's
    transposed-operator contract: ``g``'s spmm must compute ``W^T u``
    and ``deg`` must be the ROW sums of W (poisson_gd_fit_sharded
    feeds exactly that for directed graphs)."""
    dinv = safe_inv_deg(deg)
    vinf = deg / jnp.sum(deg)

    def cond(state):
        u, v, T = state
        not_mixed = jnp.max(jnp.abs(v - vinf)) > 1.0 / n_true
        return jnp.logical_and(
            jnp.logical_or(T < min_iter, not_mixed), T < max_iter)

    def body(state):
        u, v, T = state
        u = Db + dinv[:, None] * _ops.spmm(g, u)
        v = _ops.spmm(g, dinv * v)
        return u, v, T + 1

    u0 = jnp.zeros_like(Db)
    u, _, _ = jax.lax.while_loop(cond, body, (u0, v0, 0))
    return u


@functools.partial(jax.jit, static_argnames=("Ns", "T"))
def _poisson_mbo_sharded(g, deg, Db, u0, w0, priors, dt, valid, *, Ns, T):
    """Fused PoissonMBO outer loop, padding-aware (class sizes and score
    normalization exclude padding rows)."""
    from graphlearning_tpu.solvers import volume as _volume

    def heat_steps(u):
        def body(j, u):
            Lu = deg[:, None] * u - _ops.spmm(g, u)
            return u - dt * Lu + Db

        return jax.lax.fori_loop(0, Ns, body, u)

    return _volume.poisson_mbo_loop(heat_steps, u0, w0, priors, T,
                                    valid=valid)


@functools.partial(jax.jit,
                   static_argnames=("k", "max_iters", "n_true"))
def _volume_mbo_sharded(g, deg, labels0, fixed_mask, fixed_labels, lower,
                        upper, temp, key, valid, *, k, max_iters, n_true):
    """Fused VolumeMBO loop, padding-aware (counts/repair/stopping exclude
    padding rows; padding labels are frozen)."""
    from graphlearning_tpu.solvers import volume as _volume

    dinv = safe_inv_deg(deg)

    def dual_conv(labels):
        u = jax.nn.one_hot(labels, k, dtype=deg.dtype)
        u = jnp.where(valid[:, None], u, 0.0)
        a = dinv[:, None] * _ops.spmm(g, u)
        return dinv[:, None] * _ops.spmm(g, a)

    return _volume.mbo_loop(dual_conv, labels0, fixed_mask, fixed_labels,
                            lower, upper, temp, key, n_true=n_true,
                            max_iters=max_iters, valid=valid)


# =========================================================================
# Model-level sharded fits (called from ssl.py when model._dist is set).
# Each pads + places the inputs, runs the solver SPMD, gathers + truncates.
# =========================================================================


def laplace_fit_sharded(dist: Distributor, W, train_mask, bdy_values, tau,
                        tol, normalization, order, max_iter=10**5,
                        u0=None):
    """Sharded Laplace learning solve (reference ssl.py:1106-1261):
    mesh-padding rows enter as zero-value boundary rows, which the masked
    CG treats as decoupled identity rows — the solve on real rows is
    unchanged.  ``u0``: warm start (sharded active-learning refits)."""
    from graphlearning_tpu import ssl as _ssl

    g, n = dist.operator(W)
    dtype = dist.config.resolve_dtype()
    mask = dist.put_rows(np.asarray(train_mask, dtype=bool), fill=True,
                         op=g)
    bdy = dist.put_rows(bdy_values, dtype=dtype, op=g)
    tau_j = dist.put_rows(np.broadcast_to(np.atleast_1d(tau), (n,)),
                          dtype=dtype, op=g)
    if u0 is not None:
        u0 = dist.put_rows(np.asarray(u0), dtype=dtype, op=g)
    u = _ssl._laplace_constrained(g, tau_j, mask, bdy, tol,
                                  normalization=normalization,
                                  order=int(order), max_iter=int(max_iter),
                                  u0=u0)
    return dist.gather(u, n, op=g)


def poisson_cg_fit_sharded(dist: Distributor, W, source, tol,
                           max_iter=10**5, u0=None):
    """Sharded Poisson learning (conjugate_gradient solver, reference
    ssl.py:624-629): normalized-Laplacian CG with guarded D^{+-1/2}
    conjugation (padding rows act as identity with zero rhs).
    ``u0``: warm start in original (un-conjugated) space."""
    from graphlearning_tpu import ssl as _ssl

    g, n = dist.operator(W)
    dtype = dist.config.resolve_dtype()
    b = dist.put_rows(source, dtype=dtype, op=g)
    deg = _ops.degree_vector(g)
    s = safe_inv_sqrt_deg(deg)
    x0 = None
    if u0 is not None:
        x0 = dist.put_rows(np.asarray(u0), dtype=dtype, op=g) \
            * jnp.sqrt(jnp.maximum(deg, 0.0)).astype(dtype)[:, None]
    v = _ssl._cg_scaled_solve(g, s, s[:, None] * b, 1.0, 1.0, tol, x0=x0)
    v = _ssl._project_out_nlap_kernel(v, deg.astype(v.dtype))
    return dist.gather(s[:, None] * v, n, op=g)


def poisson_gd_fit_sharded(dist: Distributor, W, source, train_ind,
                           min_iter, max_iter):
    """Sharded Poisson learning (gradient_descent solver).

    Directed graphs: the reference iterates with ``W^T`` (ssl.py:631-677,
    ``P = D^-1 W^T``), so for asymmetric W the operator is built on the
    TRANSPOSED graph — ``spmm(op, u) == W^T u`` — while the degree vector
    stays the ROW sums of W (round-2 verdict item 6)."""
    symmetric = (W != W.T).nnz == 0
    g, n = dist.operator(W, transpose=not symmetric)
    dtype = dist.config.resolve_dtype()
    b = dist.put_rows(source, dtype=dtype, op=g)
    if symmetric:
        deg = _ops.degree_vector(g)
    else:
        deg = dist.put_rows(np.asarray(W.sum(1)).ravel(), dtype=dtype, op=g)
    Db = safe_inv_deg(deg)[:, None] * b
    v0 = np.zeros(n)
    v0[np.asarray(train_ind)] = 1.0
    v0 /= v0.sum()
    v0 = dist.put_rows(v0, dtype=dtype, op=g)
    u = _poisson_gd_sharded(g, deg, Db, v0, min_iter=int(min_iter),
                            max_iter=int(max_iter), n_true=int(n))
    return dist.gather(u, n, op=g)


def poisson_mbo_fit_sharded(dist: Distributor, W, source_scaled, u0, w0,
                            priors, dt, Ns, T):
    """Sharded fused PoissonMBO loop (reference ssl.py:774-839)."""
    g, n = dist.operator(W)
    dtype = dist.config.resolve_dtype()
    deg = _ops.degree_vector(g)
    Db = dist.put_rows(source_scaled, dtype=dtype, op=g)
    u0 = dist.put_rows(u0, dtype=dtype, op=g)
    valid = dist.valid_mask(n, g.n, op=g)
    uj, w, err = _poisson_mbo_sharded(
        g, deg, Db, u0, jnp.asarray(w0, dtype=dtype),
        jnp.asarray(priors, dtype=dtype), jnp.asarray(dt, dtype=dtype),
        valid, Ns=int(Ns), T=int(T))
    return dist.gather(uj, n, op=g), np.asarray(w), float(err)


def volume_mbo_fit_sharded(dist: Distributor, W, labels0, fixed_mask,
                           fixed_labels, lower, upper, temp, key, k,
                           max_iters):
    """Sharded fused VolumeMBO loop (reference mbo_convolution.cpp run_mbo)."""
    g, n = dist.operator(W)
    dtype = dist.config.resolve_dtype()
    deg = _ops.degree_vector(g)
    labels0 = dist.put_rows(np.asarray(labels0, np.int32), op=g)
    fixed_mask = dist.put_rows(np.asarray(fixed_mask, dtype=bool), op=g)
    fixed_labels = dist.put_rows(np.asarray(fixed_labels, np.int32), op=g)
    valid = dist.valid_mask(n, g.n, op=g)
    out, iters = _volume_mbo_sharded(
        g, deg, labels0, fixed_mask, fixed_labels,
        jnp.asarray(lower, dtype=dtype), jnp.asarray(upper, dtype=dtype),
        jnp.asarray(temp, dtype=dtype), key, valid,
        k=int(k), max_iters=int(max_iters), n_true=int(n))
    return dist.gather(out, n, op=g)


@functools.partial(jax.jit, static_argnames=("max_iter",))
def _lip_iterate_banded(op, u0, bdy_mask, gvals, alpha, beta, tol,
                        *, max_iter):
    """Unweighted lip/AMLE Jacobi with the three per-round reductions
    (w-sum, neighbor min, neighbor max — reference lp_iterate.cpp:35-187)
    riding the partitioned band stream + single-hop halo
    (``ShardedOp.lip_reduce_``) instead of the (n, k, C) GSPMD gather.
    Same fixed point and period-2 stop as ``plaplace._lip_iterate_mc``."""
    wsum = jnp.sum(jnp.where(op.mask(), op.vals, 0.0),
                   axis=1).astype(u0.dtype)[:, None]
    bdy3 = bdy_mask[:, None]

    def body(state):
        u, u_prev, err, it = state
        s, mn, mx = op.lip_reduce_(u)
        ne = (alpha * s / jnp.where(wsum == 0, 1.0, wsum)
              + beta * 0.5 * (mn + mx))
        u_new = jnp.where(bdy3, gvals, ne)
        err = jnp.minimum(jnp.max(jnp.abs(u_new - u)),
                          jnp.max(jnp.abs(u_new - u_prev)))
        return u_new, u, err, it + 1

    def cond(state):
        u, u_prev, err, it = state
        return jnp.logical_and(
            jnp.logical_or(err > tol, it <= 20), it < max_iter)

    u0 = jnp.where(bdy3, gvals, u0)
    u, _, _, _ = jax.lax.while_loop(
        cond, body, (u0, u0, jnp.asarray(jnp.inf, u0.dtype), 0))
    return u


def lip_fit_sharded(dist: Distributor, W, bdy_set, bdy_vals, *, alpha=None,
                    beta=None, weighted=False, tol=1e-5, max_num_it=10**5,
                    u0=None):
    """Sharded one-vs-rest p-Laplace/AMLE lip iteration (reference
    lp_iterate.cpp): mesh-padding rows enter as boundary rows pinned to 0,
    so the Jacobi fixed point on real rows is unchanged.  Through a
    banded operator (round-3 verdict item 2) the unweighted iteration
    streams the partitioned band (``_lip_iterate_banded``) and the
    weighted bisection reuses ``_lip_iterate_weighted_mc`` whose gather
    now rides the halo exchange (``ops.neighbor_take``); the GSPMD
    fallback reuses the same single-chip programs unchanged."""
    from graphlearning_tpu.solvers.plaplace import (
        _lip_iterate_mc, _lip_iterate_weighted_mc)

    g, n = dist.operator(W, need_slots=True)
    dtype = dist.config.resolve_dtype()
    bdy_set = np.asarray(bdy_set)
    bdy_vals = np.asarray(bdy_vals, dtype=float)
    C = bdy_vals.shape[1]
    bdy_mask = np.zeros(n, dtype=bool)
    bdy_mask[bdy_set] = True
    gvals = np.zeros((n, C))
    gvals[bdy_set] = bdy_vals
    if u0 is None:
        u0 = np.zeros((n, C))
    mask = dist.put_rows(bdy_mask, fill=True, op=g)  # padding = boundary 0
    gv = dist.put_rows(gvals, dtype=dtype, op=g)
    u0 = dist.put_rows(np.asarray(u0), dtype=dtype, op=g)
    tol = max(float(tol), 100 * float(jnp.finfo(dtype).eps))
    if weighted:
        u = _lip_iterate_weighted_mc(g, u0, mask, gv,
                                     jnp.asarray(tol, dtype=dtype),
                                     int(max_num_it))
    elif hasattr(g, "lip_reduce_") and C <= 128:
        u = _lip_iterate_banded(g, u0, mask, gv,
                                jnp.asarray(alpha, dtype=dtype),
                                jnp.asarray(beta, dtype=dtype),
                                jnp.asarray(tol, dtype=dtype),
                                max_iter=int(max_num_it))
    else:
        u = _lip_iterate_mc(g, u0, mask, gv,
                            jnp.asarray(alpha, dtype=dtype),
                            jnp.asarray(beta, dtype=dtype),
                            jnp.asarray(tol, dtype=dtype), int(max_num_it))
    return dist.gather(u, n, op=g)


def randomwalk_fit_sharded(dist: Distributor, W, F, alpha, tau,
                           tol=1e-10):
    """Sharded lazy-random-walk learning (reference ssl.py:1765-1793):
    CG solve of ``((1+tau) I - alpha D^-1/2 W D^-1/2) u = F`` through the
    sharded operator (banded fast path when available)."""
    from graphlearning_tpu import ssl as _ssl

    g, n = dist.operator(W)
    dtype = dist.config.resolve_dtype()
    Fj = dist.put_rows(F, dtype=dtype, op=g)
    deg = _ops.degree_vector(g)
    s = safe_inv_sqrt_deg(deg)
    u = _ssl._cg_scaled_solve(g, s, Fj, 1.0 + float(tau), float(alpha), tol)
    return dist.gather(u, n, op=g)


@functools.partial(jax.jit,
                   static_argnames=("power_it", "n_true", "max_it"))
def _centered_kernel_sharded(g, Kj, maskj, valid, alpha0, tol, key, *,
                             power_it, n_true, max_it=10**5):
    """Padding-aware centered-kernel iteration (reference ssl.py:1397-1426):
    the centering mean runs over the TRUE node count and padding rows are
    pinned to 0 (they are masked as 'boundary' so the fixed point never
    moves them)."""
    dtype = Kj.dtype

    def center(X):
        Xv = jnp.where(valid[:, None], X, 0.0)
        m = jnp.sum(Xv, axis=0, keepdims=True) / n_true
        return jnp.where(valid[:, None], X - m, 0.0)

    def A(X):
        return center(_ops.spmm(g, center(X)))

    e = jnp.where(valid[:, None],
                  jax.random.normal(key, (g.n, 1), dtype=dtype), 0.0)

    def pbody(i, e):
        w = A(e)
        return w / jnp.linalg.norm(w)

    e = jax.lax.fori_loop(0, power_it, pbody, e)
    l = jnp.abs(jnp.vdot(e, A(e)) / jnp.vdot(e, e))
    alpha = alpha0 * l

    def cond(state):
        u, err, it = state
        return jnp.logical_and(err > tol, it < max_it)

    def body(state):
        u, err, it = state
        w = A(u) / alpha - u
        w = jnp.where(maskj[:, None] | ~valid[:, None], 0.0, w)
        err = jnp.max(jnp.abs(w))
        return u + w, err, it + 1

    u, _, _ = jax.lax.while_loop(
        cond, body, (Kj, jnp.asarray(jnp.inf, dtype), 0))
    return u


def centered_kernel_fit_sharded(dist: Distributor, W, K, train_mask,
                                alpha, tol, power_it, seed):
    """Sharded centered-kernel fit (reference ssl.py:1346-1426)."""
    g, n = dist.operator(W)
    dtype = dist.config.resolve_dtype()
    Kj = dist.put_rows(K, dtype=dtype, op=g)
    maskj = dist.put_rows(np.asarray(train_mask, bool), fill=True, op=g)
    valid = dist.valid_mask(n, g.n, op=g)
    u = _centered_kernel_sharded(
        g, Kj, maskj, valid, jnp.asarray(alpha, dtype=dtype),
        jnp.asarray(tol, dtype=dtype), jax.random.PRNGKey(seed),
        power_it=int(power_it), n_true=int(n))
    return dist.gather(u, n, op=g)


def peikonal_fit_sharded(dist: Distributor, W, bdy_mask, f, p, tol,
                         max_num_it, num_bisection_it):
    """Sharded class-batched p-eikonal Jacobi (reference ssl.py:1616-1678):
    mesh-padding rows enter as zero-valued boundary rows with speed 0, so
    the fixed point on real rows is unchanged.  Reuses the SAME jitted
    ``_peikonal_jacobi_mc`` program; through a banded operator its
    per-round neighbor gather rides the single-hop halo exchange
    (``ops.neighbor_take`` -> ``ShardedOp.neighbor_take_``) instead of a
    GSPMD all-gather of all n rows (round-3 verdict item 2)."""
    from graphlearning_tpu.solvers.eikonal import _peikonal_jacobi_mc

    g, n = dist.operator(W, need_slots=True)
    dtype = dist.config.resolve_dtype()
    C = bdy_mask.shape[1]
    bdy = dist.put_rows(np.asarray(bdy_mask, bool), fill=True, op=g)
    fj = dist.put_rows(np.asarray(f, float), fill=0.0, dtype=dtype, op=g)
    u0 = dist.put_rows(np.zeros((n, C)), dtype=dtype, op=g)
    tol = max(float(tol), 100 * float(jnp.finfo(dtype).eps))
    u = _peikonal_jacobi_mc(
        g, u0, bdy, fj, jnp.asarray(tol, dtype=dtype), p=float(p),
        max_iter=int(max_num_it), num_bisection_it=int(num_bisection_it))
    return dist.gather(u, n, op=g)


@functools.partial(jax.jit,
                   static_argnames=("hopf_lax", "recip", "max_iter"))
def _bellman_ford_banded(op, d0, cp0, f, *, hopf_lax, recip, max_iter):
    """Bellman-Ford relaxation riding the partitioned band's tropical
    kernel + halo exchange (``ShardedOp.minplus_``): per round, one band
    stream + one 2H-row ppermute pair + a small int gather for the
    closest-point labels — no O(n) feature all-gather.  Same fixed point
    as ``solvers.eikonal._bellman_ford``."""

    def relax(state):
        d, cp, err, it = state
        m, a = op.minplus_(d, f, hopf_lax=hopf_lax, recip=recip)
        upd = m < d
        cp_cand = jnp.take(cp, jnp.clip(a, 0, None))
        d_new = jnp.where(upd, m, d)
        cp_new = jnp.where(upd & (a >= 0), cp_cand, cp)
        err = jnp.max(jnp.where(upd, d - d_new, 0.0))
        return d_new, cp_new, err, it + 1

    def cond(state):
        d, cp, err, it = state
        return jnp.logical_and(err > 0, it < max_iter)

    state = (d0, cp0, jnp.asarray(jnp.inf, d0.dtype), 0)
    d, cp, _, _ = jax.lax.while_loop(cond, relax, state)
    return d, cp


def dijkstra_fit_sharded(dist: Distributor, W, bdy_set, bdy_val, f,
                         return_cp=False, max_iter=10**6,
                         hopf_lax=False, reciprocal_weights=False):
    """Sharded Bellman-Ford graph distance (reference graph.py:1077-1175;
    ``hopf_lax=True`` gives the Hopf-Lax HJ variant, graph.py:916-997):
    padding rows start at +big with no valid neighbors, so they never
    relax and never influence real rows.  Through a banded operator the
    relaxation streams the partitioned band (``_bellman_ford_banded``,
    round-3 verdict item 2); the GSPMD fallback reuses the single-chip
    ``_bellman_ford`` program."""
    from graphlearning_tpu.solvers.eikonal import (_bellman_ford,
                                                   _boundary_handling)

    g, n = dist.operator(W, need_slots=True)
    dtype = dist.config.resolve_dtype()
    bdy_set, bdy_val_arr = _boundary_handling(bdy_set, bdy_val)
    if np.isscalar(f) or np.ndim(f) == 0:
        f = np.full((n,), float(f))
    banded = hasattr(g, "minplus_")
    # banded kernels use the 1e30 'no-edge' sentinel (f32-safe); the
    # gather path keeps the dtype max it always used
    big = 1e30 if banded else float(jnp.finfo(dtype).max)
    d0 = np.full((n,), big)
    d0[bdy_set] = bdy_val_arr
    cp0 = np.full((n,), -1, np.int32)
    cp0[bdy_set] = bdy_set
    d0 = dist.put_rows(d0, fill=big, dtype=dtype, op=g)
    cp0 = dist.put_rows(cp0, fill=-1, op=g)
    fj = dist.put_rows(np.asarray(f, float), fill=0.0, dtype=dtype, op=g)
    if banded:
        d, cp = _bellman_ford_banded(g, d0, cp0, fj,
                                     hopf_lax=bool(hopf_lax),
                                     recip=bool(reciprocal_weights),
                                     max_iter=int(max_iter))
    else:
        if reciprocal_weights:
            vals = jnp.where(g.mask(),
                             1.0 / jnp.where(g.vals == 0, 1.0, g.vals), 0.0)
            g_run = g.with_vals(vals)
        else:
            g_run = g
        d, cp = _bellman_ford(g_run, d0, cp0, fj, bool(hopf_lax),
                              int(max_iter))
    d = dist.gather(d, n, op=g).astype(float)
    d[d >= big * 0.5] = np.inf
    if return_cp:
        return d, dist.gather(cp, n, op=g)
    return d


def sparse_lp_fit_sharded(dist: Distributor, model, train_ind,
                          train_labels):
    """Sharded sparse label propagation (reference ssl.py:1429-1508): the
    flat edge arrays shard over the node axis (edge-parallel) and the SAME
    jitted primal-dual program runs under GSPMD (no padding needed — the
    program's node arrays keep the true n)."""
    from graphlearning_tpu import ssl as _ssl
    from graphlearning_tpu import utils as _utils
    from jax.sharding import NamedSharding, PartitionSpec as _P

    n = model.graph.num_nodes
    kc = len(np.unique(train_labels))
    dtype = dist.config.resolve_dtype()
    erow, ecol, ew, emir = model._edge_list()
    flat = NamedSharding(dist.mesh, _P(dist.axis))
    erow = jax.device_put(erow, flat)
    ecol = jax.device_put(ecol, flat)
    ew = jax.device_put(ew, flat)
    emir = jax.device_put(emir, flat)
    onehot = _utils.labels_to_onehot(train_labels, kc)
    deg = _ops.degree_vector(model.graph.sparse)
    gamma = jnp.asarray(1.0 / deg, dtype=dtype)
    return np.asarray(_ssl._sparse_lp_run(
        erow, ecol, ew, emir, gamma, jnp.asarray(train_ind),
        jnp.asarray(onehot, dtype=dtype), n=n, kc=kc, T=model.T))


@functools.partial(jax.jit, static_argnames=("k", "T", "Dm"))
def _incres_loop_sharded(g, deg, valid, u0, key, *, k, T, Dm):
    """Padding-aware fused INCRES loop (mirrors clustering._incres_loop_xla,
    reference clustering.py:282-371): padding rows are never planted
    (score -inf), never counted as members, and excluded from the
    everyone-reached growth stop."""
    n = u0.shape[0]
    max_m = 1 + (T - 1) * Dm
    neg_inf = -jnp.inf
    dinv = safe_inv_deg(deg)

    def grow(F):
        def cond(state):
            F, it = state
            return jnp.logical_and(
                jnp.min(jnp.where(valid[:, None], F, 1.0)) == 0, it < n)

        def body(state):
            F, it = state
            return _ops.spmm(g, dinv[:, None] * F), it + 1

        return jax.lax.while_loop(cond, body, (F, 0))[0]

    def round_fn(carry, i):
        u, key = carry
        key, sub = jax.random.split(key)
        scores = jax.random.uniform(sub, (k, n))
        member = (u[None, :] == jnp.arange(k)[:, None]) & valid[None, :]
        member = member | ((~jnp.any(member, axis=1))[:, None]
                           & valid[None, :])
        s = jnp.where(member, scores, neg_inf)
        top_vals, top_idx = jax.lax.top_k(s, max_m)
        m_i = 1 + i * Dm
        take = ((jnp.arange(max_m)[None, :] < m_i)
                & (top_vals > neg_inf)).astype(deg.dtype)
        F = jnp.zeros((n, k), deg.dtype)
        F = F.at[top_idx, jnp.arange(k)[:, None]].add(take)
        F = grow(F)
        return (jnp.argmax(F, axis=1).astype(jnp.int32), key), None

    (u, _), _ = jax.lax.scan(round_fn, (u0, key), jnp.arange(T))
    return u


def incres_fit_sharded(dist: Distributor, W, u0, seed, *, k, T, Dm):
    """Sharded INCRES clustering fit (reference clustering.py:282-371)."""
    g, n = dist.operator(W)
    dtype = dist.config.resolve_dtype()
    deg = _ops.degree_vector(g).astype(dtype)
    valid = dist.valid_mask(n, g.n, op=g)
    u0 = dist.put_rows(np.asarray(u0, np.int32), op=g)
    key = jax.random.PRNGKey(0 if seed is None else seed)
    u = _incres_loop_sharded(g, deg, valid, u0, key, k=int(k), T=int(T),
                             Dm=int(Dm))
    return dist.gather(u, n, op=g)


# =========================================================================
# Sharded eigensolver (spectral clustering / spectral embeddings).
# =========================================================================


@functools.partial(jax.jit, static_argnames=("k", "power", "normalization",
                                             "m"))
def _eig_sharded(g, deg, valid, key, *, k, power, normalization, m=200):
    """Low-lying Laplacian spectrum on a row-sharded graph via LOBPCG on
    the shifted PSD operator (same math as ``solvers.eig.eigen_decomp``,
    reference ``graph.py:623-806``).  The operator is masked to the real
    rows: mesh-padding rows (degree 0) map to 0, so they contribute
    eigenvalue 0 to a TOP-k problem — out of the way by construction, and
    the computed pairs are exactly those of the unpadded operator.  All
    dense (k x k) algebra inside LOBPCG is replicated; the SpMM is the
    only sharded contraction (XLA inserts its all_gather)."""
    from jax.experimental.sparse.linalg import lobpcg_standard

    dtype = g.vals.dtype
    n = g.n

    if normalization in ("normalized", "randomwalk"):
        s = safe_inv_sqrt_deg(deg)

        def base(X):  # I + D^-1/2 W D^-1/2, spectrum in [0, 2]
            Y = X + s[:, None] * _ops.spmm(g, s[:, None] * X)
            return jnp.where(valid[:, None], Y, 0.0)
    elif normalization == "combinatorial":
        M = 2.0 * jnp.max(deg)

        def base(X):  # M I - L = (M - deg) X + W X
            Y = (M - deg)[:, None] * X + _ops.spmm(g, X)
            return jnp.where(valid[:, None], Y, 0.0)
    else:
        raise ValueError("Invalid normalization " + normalization)

    def op(X):
        # rolled: one sharded-spmm body regardless of `power` (keeps the
        # GSPMD program small; see ops/gather.py eig note)
        return jax.lax.fori_loop(0, power, lambda i, Y: base(Y), X)

    X0 = jax.random.normal(key, (n, k), dtype=dtype)
    X0 = jnp.where(valid[:, None], X0, 0.0)
    theta, U, _ = lobpcg_standard(op, X0, m=m)
    rq = jnp.sum(U * base(U), axis=0) / jnp.sum(U * U, axis=0)
    if normalization in ("normalized", "randomwalk"):
        vals = 2.0 - rq
    else:
        vals = M - rq
    order = jnp.argsort(vals)
    vecs = U[:, order]
    if normalization == "randomwalk":
        vecs = safe_inv_sqrt_deg(deg)[:, None] * vecs
    return vals[order], vecs


def eigen_decomp_sharded(dist: Distributor, W, normalization="normalized",
                         k=10, seed=0):
    """Sharded ``eigen_decomp`` (exact/LOBPCG method): returns host
    ``(vals, vecs)`` with vecs truncated to the real rows."""
    from graphlearning_tpu.solvers.eig import _default_power

    g, n = dist.operator(W)
    deg = _ops.degree_vector(g)
    valid = dist.valid_mask(n, g.n, op=g)
    key = jax.random.PRNGKey(seed)
    vals, vecs = _eig_sharded(g, deg, valid, key, k=int(k),
                              power=_default_power(dist.config.resolve_dtype()),
                              normalization=normalization)
    return np.asarray(vals), dist.gather(vecs, n, op=g)


@functools.partial(jax.jit, static_argnames=("k", "m"))
def _eig_mod_sharded(g, deg, valid, key, gamma, *, k, m=200):
    """Low-lying spectrum of the combinatorial modularity operator
    ``M X = L X + (gamma/mm) deg (deg^T X)`` on a row-sharded graph
    (reference graph.py:771-799; mirrors ``solvers.eig.eigen_decomp``'s
    gamma branch).  Padding rows (deg 0) are masked to 0 — they contribute
    eigenvalue 0 to the TOP-k problem on the shifted operator, out of the
    way by construction."""
    from jax.experimental.sparse.linalg import lobpcg_standard

    dtype = g.vals.dtype
    n = g.n
    mm = jnp.sum(deg) / 2

    def Mop(X):
        LX = deg[:, None] * X - _ops.spmm(g, X)
        Y = LX + (gamma / mm) * deg[:, None] * (deg[None, :] @ X)
        return jnp.where(valid[:, None], Y, 0.0)

    # power iteration for the spectral radius -> shift
    e = jnp.where(valid[:, None],
                  jax.random.normal(key, (n, 1), dtype=dtype), 0.0)

    def pbody(i, e):
        w = Mop(e)
        return w / jnp.linalg.norm(w)

    e = jax.lax.fori_loop(0, 100, pbody, e)
    lmax = jnp.abs(jnp.vdot(e, Mop(e)) / jnp.vdot(e, e))
    shift = 1.01 * lmax + 1.0

    def base(X):  # shift I - M on real rows, 0 on padding
        return jnp.where(valid[:, None], shift * X - Mop(X), 0.0)

    X0 = jnp.where(valid[:, None],
                   jax.random.normal(jax.random.fold_in(key, 1), (n, k),
                                     dtype=dtype), 0.0)
    theta, U, _ = lobpcg_standard(base, X0, m=m)
    rq = jnp.sum(U * base(U), axis=0) / jnp.sum(U * U, axis=0)
    vals = shift - rq
    order = jnp.argsort(vals)
    return vals[order], U[:, order]


def eigen_decomp_mod_sharded(dist: Distributor, W, k=10, gamma=0.5,
                             seed=0):
    """Sharded modularity ``eigen_decomp`` (combinatorial normalization +
    gamma, used by modularity MBO — reference ssl.py:1007-1103)."""
    g, n = dist.operator(W)
    deg = _ops.degree_vector(g)
    valid = dist.valid_mask(n, g.n, op=g)
    dtype = dist.config.resolve_dtype()
    vals, vecs = _eig_mod_sharded(g, deg, valid, jax.random.PRNGKey(seed),
                                  jnp.asarray(gamma, dtype=dtype), k=int(k))
    return np.asarray(vals), dist.gather(vecs, n, op=g)
