"""RCM-accelerated SpMM context for iterative solvers.

The banded Pallas kernel (``ops/pallas_spmm.py``) needs the graph in
RCM-banded order and padded shapes.  ``AccelSpMM`` owns that transformation:
it permutes the weight matrix once (host-side Cuthill-McKee), builds the
banded plan, and exposes ``spmm`` in *permuted space* plus the one-time
``to_perm`` / ``from_perm`` index maps.  Iterative solvers (CG in
Laplace/Poisson/randomwalk learning — the reference's ``utils.py:523`` hot
loop) run entirely in permuted space: two index gathers total instead of
one per iteration.

Measured on TPU v5e (n=131k k=10 kNN graph, d=128): banded hybrid ≈
1.0e8 edges/s vs 4.5e7 for XLA's dynamic gather; the advantage grows for
small class counts (A-build cost ∝ slots, not d).

Enabled automatically when the default backend is a TPU and the graph is
large enough to amortize planning; ``GLT_NO_ACCEL=1`` disables.
"""

from __future__ import annotations

import functools
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

_MIN_N = 4096
_TUNED = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "scripts",
    "spmm_tuned.json")


def _tuned_defaults(exact: bool):
    R, WT, mode, max_res = 256, 512, "f32", 0.05
    try:
        tuned = json.load(open(_TUNED))
        best = tuned.get("best_exact" if exact else "best") or tuned["best"]
        R, WT = int(best["R"]), int(best["WT"])
        if not exact:
            mode = best.get("mode", "f32")
        max_res = float(best.get("max_residual", max_res))
    except Exception:
        pass
    return R, WT, mode, max_res


def enabled() -> bool:
    if os.environ.get("GLT_NO_ACCEL"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


class AccelSpMM:
    """Banded-kernel SpMM in RCM-permuted space for one symmetric graph."""

    def __init__(self, W, exact: bool = True, R=None, WT=None, mode=None,
                 max_residual=None, interpret: bool | None = None):
        import scipy.sparse as sp
        from scipy.sparse.csgraph import reverse_cuthill_mckee
        from graphlearning_tpu.core.sparse import SparseGraph
        from graphlearning_tpu.ops.pallas_spmm import plan_banded

        dR, dWT, dmode, dres = _tuned_defaults(exact)
        self.R = R or dR
        self.WT = WT or dWT
        self.mode = mode or dmode
        max_residual = max_residual if max_residual is not None else dres
        if interpret is None:
            interpret = bool(os.environ.get("GLT_ACCEL_INTERPRET"))
        self.interpret = interpret

        W = sp.csr_matrix(W)
        n = W.shape[0]
        self.nnz = int(W.nnz)
        perm = np.asarray(reverse_cuthill_mckee(W, symmetric_mode=True))
        Wp = W[perm, :][:, perm].tocsr()
        self.n = n
        block = max(self.R, self.WT)
        n_pad = ((n + block - 1) // block) * block
        if n_pad != n:
            Wp = sp.bmat(
                [[Wp, None],
                 [None, sp.csr_matrix((n_pad - n, n_pad - n))]],
                format="csr")
        self.n_pad = n_pad
        self.perm = perm                      # row j of Wp = row perm[j] of W
        self.inv = np.argsort(perm)           # from_perm gather indices
        self.g = SparseGraph.from_scipy(Wp, dtype=jnp.float32)
        winstart, rrows, rslots, Wwin, kcap = plan_banded(
            np.asarray(self.g.cols), R=self.R, WT=self.WT,
            max_residual=max_residual, deg=np.asarray(self.g.deg))
        self.Wwin, self.kcap = Wwin, kcap
        self._plan_dev = (jnp.asarray(winstart), jnp.asarray(rrows),
                          jnp.asarray(rslots))
        self._perm_dev = jnp.asarray(perm)
        self._inv_dev = jnp.asarray(self.inv)

    # -- index maps (one gather each, outside the solver loop) ------------

    def to_perm(self, X, fill=0.0):
        """Original -> permuted padded space (padding filled with ``fill``)."""
        X = jnp.asarray(X)
        Xp = jnp.take(X, self._perm_dev, axis=0)
        pad = self.n_pad - self.n
        if pad:
            width = ((0, pad),) + ((0, 0),) * (X.ndim - 1)
            Xp = jnp.pad(Xp, width, constant_values=fill)
        return Xp

    def from_perm(self, Xp):
        """Permuted padded -> original space."""
        return jnp.take(jnp.asarray(Xp), self._inv_dev, axis=0)

    # -- the accelerated matvec (use inside jitted loops) ------------------

    def spmm(self, Xp):
        """``Wp @ Xp`` in permuted padded space via the banded hybrid."""
        from graphlearning_tpu.ops.pallas_spmm import spmm_banded_hybrid

        return spmm_banded_hybrid(
            self.g, Xp, (*self._plan_dev, self.Wwin, self.kcap),
            W=self.Wwin, R=self.R, WT=self.WT, mode=self.mode,
            interpret=self.interpret)

    def _statics(self, **extra):
        return dict(Wwin=self.Wwin, R=self.R, WT=self.WT, kcap=self.kcap,
                    mode=self.mode, interpret=self.interpret, **extra)

    def cg_scaled(self, s_p, b, c0=1.0, c1=1.0, tol=1e-10, max_iter=10**5):
        """CG solve of ``(c0 I - c1 diag(s) Wp diag(s)) x = b`` in permuted
        space (jit-cached across fits)."""
        return _cg_scaled_accel(
            self.g, *self._plan_dev, s_p, b, c0, c1, tol,
            **self._statics(max_iter=int(max_iter)))

    def laplace_constrained(self, deg_p, diag_p, tau_p, mask_p, bdy_p, tol,
                            normalization="combinatorial", order=1,
                            max_iter=10**5):
        """Masked CG Laplace solve in permuted space (jit-cached)."""
        return _laplace_constrained_accel(
            self.g, *self._plan_dev, deg_p, diag_p, tau_p, mask_p, bdy_p,
            tol, normalization=normalization, order=int(order),
            **self._statics(max_iter=int(max_iter)))

    def laplacian_matvec(self, normalization: str, deg_p):
        """``L @ X`` in permuted space (mirrors ops.laplacian_matvec for the
        three standard normalizations; padding rows act as identity/zero)."""
        if normalization == "combinatorial":
            return lambda X: deg_p[:, None] * X - self.spmm(X)
        if normalization == "randomwalk":
            dinv = jnp.where(deg_p > 0, 1.0 / jnp.where(deg_p == 0, 1.0,
                                                        deg_p), 0.0)
            return lambda X: X - dinv[:, None] * self.spmm(X)
        if normalization == "normalized":
            s = jnp.where(deg_p > 0,
                          jnp.where(deg_p == 0, 1.0, deg_p) ** -0.5, 0.0)
            return lambda X: X - s[:, None] * self.spmm(s[:, None] * X)
        raise ValueError(f"unsupported normalization {normalization!r}")


# Module-level jitted solver entry points in permuted space (stable jit
# cache keys across repeated fits — mirrors ssl._cg_scaled_solve etc.).

_STATICS = ("Wwin", "R", "WT", "kcap", "mode", "interpret", "max_iter")


@functools.partial(jax.jit, static_argnames=_STATICS)
def _cg_scaled_accel(gp, winstart, rrows, rslots, s_p, b, c0, c1, tol, *,
                     Wwin, R, WT, kcap, mode, interpret, max_iter):
    from graphlearning_tpu.ops.pallas_spmm import spmm_banded_hybrid
    from graphlearning_tpu.solvers import cg as _cg

    def A(X):
        y = spmm_banded_hybrid(
            gp, s_p[:, None] * X, (winstart, rrows, rslots, Wwin, kcap),
            W=Wwin, R=R, WT=WT, mode=mode, interpret=interpret)
        return c0 * X - c1 * s_p[:, None] * y

    x, _, _ = _cg.conjgrad(A, b, tol=tol, max_iter=max_iter)
    return x


@functools.partial(jax.jit,
                   static_argnames=("normalization", "order") + _STATICS)
def _laplace_constrained_accel(gp, winstart, rrows, rslots, deg_p, diag_p,
                               tau_p, mask_p, bdy_p, tol, *, normalization,
                               order, Wwin, R, WT, kcap, mode, interpret,
                               max_iter):
    from graphlearning_tpu.ops.pallas_spmm import spmm_banded_hybrid
    from graphlearning_tpu.solvers import cg as _cg

    def spmm(X):
        return spmm_banded_hybrid(
            gp, X, (winstart, rrows, rslots, Wwin, kcap),
            W=Wwin, R=R, WT=WT, mode=mode, interpret=interpret)

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
                                    max_iter=max_iter)
    return u


# Cost-model constants calibrated on TPU v5e (see scripts/tune_spmm.py and
# the module docstring measurements): the banded kernel costs
# n_pad·W·(A_BUILD_PS·kcap + MXU_PS·d_pad·passes) seconds plus the
# residual-gather tail; XLA's dynamic gather costs GATHER_NS per edge.
_A_BUILD_PS = 0.95e-12
_MXU_PS = 0.028e-12
_GATHER_NS = 30e-9
_PASSES = {"f32": 6, "bf16x3": 3, "bf16": 1}


def _hybrid_estimate(acc: AccelSpMM, d_pad: int = 128) -> float:
    per_cell = (_A_BUILD_PS * acc.kcap
                + _MXU_PS * d_pad * _PASSES.get(acc.mode, 6))
    resid = len(np.asarray(acc._plan_dev[1])) * _GATHER_NS
    return acc.n_pad * acc.Wwin * per_cell + resid


class _Disabled:
    """Negative-decision cache sentinel (graph found accel-unfriendly)."""

    def __init__(self, n, nnz):
        self.n, self.nnz = n, nnz


def maybe_build(W, cache_obj=None, attr="_accel_cache", d_pad=128, **kw):
    """Build (and memoize on ``cache_obj``) an AccelSpMM when the TPU fast
    path applies AND the cost model predicts it beats the gather path;
    return None otherwise.

    RCM banding only pays off for spatially-coherent graphs (meshes,
    low-dimensional kNN).  Cluster graphs (e.g. MNIST embeddings) band
    poorly — huge windows, fat residuals — and the dense-expansion kernel
    loses to XLA's gather there (measured 27.7 vs 15.9 ms/SpMM at n=30k),
    so the decision is made per graph from the banding plan."""
    n = W.shape[0]
    if not enabled() or n < _MIN_N:
        return None
    if cache_obj is not None:
        cached = getattr(cache_obj, attr, None)
        if cached is not None and cached.n == n and cached.nnz == W.nnz:
            return None if isinstance(cached, _Disabled) else cached
    try:
        acc = AccelSpMM(W, **kw)
    except Exception:  # pragma: no cover — fall back to the XLA path
        return None
    gather_est = W.nnz * _GATHER_NS
    if _hybrid_estimate(acc, d_pad) > 0.7 * gather_est:
        if cache_obj is not None:
            setattr(cache_obj, attr, _Disabled(n, int(W.nnz)))
        return None
    if cache_obj is not None:
        setattr(cache_obj, attr, acc)
    return acc
