"""Active learning — TPU-native re-expression of reference
``graphlearning/active_learning.py``.

``active_learner`` drives the query loop (select → oracle → refit); the five
acquisition functions (``unc_sampling``, ``var_opt``, ``sigma_opt``,
``model_change``, ``model_change_var_opt``; reference
``active_learning.py:168-575``) share one covariance engine: dense
covariance algebra (column norms/sums, rank-1 downdates) runs as batched
device matmuls rather than the reference's per-query numpy loops."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from scipy.special import softmax


class active_learner:
    """Query-selection loop (reference ``active_learning.py:56-117``).

    ``warm_start=False`` matches the reference exactly: every ``update``
    refits the SSL model from scratch.  ``warm_start=True`` seeds each
    refit's iterative solver with the previous round's solution (the
    models that support it — laplace, poisson CG, incl. their sharded
    paths — converge to the same solution in far fewer iterations; the
    reference has no warm start, active_learning.py:108-117).

    Distributed models work transparently: a ``model.distribute(mesh)``
    model refits sharded on every query round, and
    :func:`spectral_covariance` builds the acquisition covariance from
    the sharded eigensolver."""

    def __init__(self, model, acq_function, labeled_ind, labels,
                 policy="max", warm_start=False, **kwargs):
        self.model = model
        self.warm_start = bool(warm_start)
        self.labeled_ind = np.asarray(labeled_ind).copy()
        self.labels = np.asarray(labels).copy()
        self.acq_function = acq_function(**kwargs) if isinstance(acq_function, type) else acq_function
        self.acq_function.update(self.labeled_ind, self.labels)
        self.policy = policy
        # warm_start also keeps the solution ON DEVICE across rounds:
        # the (n, k) device->host fetch was the dominant fixed per-update
        # cost (0.30 s of a 0.52 s laplace update at n=70k, measured in
        # scripts/al_profile.py) — acquisitions then compute on device
        # and only the (n,) acq values cross the tunnel
        self._fit = (self.model.fit_device
                     if self.warm_start and hasattr(self.model, "fit_device")
                     and getattr(self.model, "_dist", None) is None
                     else self.model.fit)
        self.u = self._fit(self.labeled_ind, self.labels)
        self.n = self.model.graph.num_nodes
        self.all_inds = np.arange(self.n)
        self.unlabeled_ind = np.setdiff1d(self.all_inds, self.labeled_ind)
        self.printed_warning = False

    def select_queries(self, batch_size=1, policy=None, candidate_ind="full",
                       rand_frac=0.1, return_acq_vals=False, prop_gamma=1.0,
                       allow_repeat=False):
        if policy is None:
            policy = self.policy
        if isinstance(candidate_ind, np.ndarray):
            if candidate_ind.min() < 0 or candidate_ind.max() > self.n:
                raise ValueError(f"candidate_ind must be in [0, {self.n}]")
        elif candidate_ind == "full":
            candidate_ind = (
                self.all_inds if allow_repeat
                else np.setdiff1d(self.all_inds, self.labeled_ind)
            )
        elif candidate_ind == "rand" and 0 < rand_frac < 1:
            pool = self.all_inds if allow_repeat else self.unlabeled_ind
            candidate_ind = np.random.choice(
                pool, size=int(rand_frac * len(pool)), replace=False
            )
        else:
            raise ValueError("Invalid input for candidate_ind")

        acq_vals = self.acq_function.compute(self.u, candidate_ind)
        if policy == "max":
            query_ind = candidate_ind[(-acq_vals).argsort()[:batch_size]]
        elif policy == "prop":
            probs = np.exp(prop_gamma * (acq_vals - acq_vals.max()))
            probs /= probs.sum()
            query_ind = np.random.choice(candidate_ind, batch_size, p=probs)
        else:
            query_ind = policy(candidate_ind, acq_vals, batch_size)
        if return_acq_vals:
            return query_ind, acq_vals
        return query_ind

    def update(self, query_ind, query_labels):
        query_ind = np.atleast_1d(query_ind)
        query_labels = np.atleast_1d(query_labels)
        if np.intersect1d(query_ind, self.labeled_ind).size > 0 and not self.printed_warning:
            print("WARNING: Having multiple observations at a single node detected")
            self.printed_warning = True
        self.labeled_ind = np.append(self.labeled_ind, query_ind)
        self.labels = np.append(self.labels, query_labels)
        if self.warm_start:
            self.model._warm_u = self.u   # device array stays on device
        try:
            self.u = self._fit(self.labeled_ind, self.labels)
        finally:
            self.model._warm_u = None
        self.unlabeled_ind = np.setdiff1d(self.all_inds, self.labeled_ind)
        self.acq_function.update(query_ind, query_labels)


def spectral_covariance(model_or_graph, k=20, tau=0.11,
                        normalization="normalized"):
    """Build the spectral-truncated covariance ``(C0, V)`` the
    covariance acquisitions consume (reference pattern,
    active_learning.py:237-317: ``C0 = diag(1/(lambda + tau))`` over the
    low-lying eigenpairs): ``var_opt(*spectral_covariance(model))``.

    Accepts an SSL model, a ``graph``, or a weight matrix.  A
    DISTRIBUTED model (``model.distribute(mesh)``) routes through the
    sharded eigensolver (``parallel.execute.eigen_decomp_sharded``), so
    the whole active-learning loop — acquisitions and refits — runs on
    the mesh."""
    from graphlearning_tpu import graph as _graph

    dist = getattr(model_or_graph, "_dist", None)
    if dist is not None:
        from graphlearning_tpu.parallel import execute as _exec

        W = model_or_graph.graph.weight_matrix
        vals, vecs = _exec.eigen_decomp_sharded(
            _exec.Distributor(dist), W, normalization=normalization, k=k)
    else:
        G = model_or_graph
        if hasattr(G, "graph"):           # SSL model
            G = G.graph
        if not isinstance(G, _graph):     # weight matrix
            G = _graph(G)
        vals, vecs = G.eigen_decomp(normalization=normalization, k=k)
    C0 = np.diag(1.0 / (np.asarray(vals) + tau))
    return C0, np.asarray(vecs)


class acquisition_function:
    def compute(self, u, candidate_ind):
        raise NotImplementedError("Must override compute")

    def update(self, query_ind, query_labels):
        return


import functools as _ft
import jax as _jax


@_ft.partial(_jax.jit, static_argnames=("method",))
def _unc_full_device(u, *, method):
    """Uncertainty values for ALL nodes on device — the device-resident
    AL loop fetches only this (n,) vector instead of the (n, k) score
    block (10x less tunnel traffic per query round)."""
    if method == "norm":
        p = jnp.exp(u - jnp.max(u, axis=1, keepdims=True))
        p = p / jnp.sum(p, axis=1, keepdims=True)
        onehot = jnp.eye(u.shape[1], dtype=u.dtype)[jnp.argmax(u, axis=1)]
        return jnp.linalg.norm(p - onehot, axis=1)
    if method == "entropy":
        p = jnp.exp(u - jnp.max(u, axis=1, keepdims=True))
        p = p / jnp.sum(p, axis=1, keepdims=True)
        return jnp.max(p, axis=1) - jnp.sum(p * jnp.log(p + 1e-5), axis=1)
    if method == "least_confidence":
        return 1.0 - jnp.max(u, axis=1)
    if method == "smallest_margin":
        top2, _ = _jax.lax.top_k(u, 2)
        return 1.0 - (top2[:, 0] - top2[:, 1])
    if method == "largest_margin":
        return 1.0 - (jnp.max(u, axis=1) - jnp.min(u, axis=1))
    if method == "unc_2norm":
        return 1.0 - jnp.linalg.norm(u, axis=1)
    raise ValueError("invalid unc_method " + method)


class unc_sampling(acquisition_function):
    """Uncertainty sampling, six flavors (reference
    ``active_learning.py:168-233``)."""

    def __init__(self, unc_method="smallest_margin"):
        self.unc_method = unc_method

    def compute(self, u, candidate_ind):
        if isinstance(u, jnp.ndarray):
            vals = np.asarray(_unc_full_device(u, method=self.unc_method))
            return vals[candidate_ind]
        uc = np.asarray(u)[candidate_ind]
        m = self.unc_method
        if m == "norm":
            p = softmax(uc, axis=1)
            onehot = np.eye(uc.shape[1])[np.argmax(uc, axis=1)]
            return np.linalg.norm(p - onehot, axis=1)
        if m == "entropy":
            p = softmax(uc, axis=1)
            return np.max(p, axis=1) - np.sum(p * np.log(p + 1e-5), axis=1)
        if m == "least_confidence":
            return 1.0 - np.max(uc, axis=1)
        if m == "smallest_margin":
            s = np.sort(uc)
            return 1.0 - (s[:, -1] - s[:, -2])
        if m == "largest_margin":
            s = np.sort(uc)
            return 1.0 - (s[:, -1] - s[:, 0])
        if m == "unc_2norm":
            return 1.0 - np.linalg.norm(uc, axis=1)
        raise ValueError("invalid unc_method " + m)


class _covariance_acq(acquisition_function):
    """Shared engine for covariance-based acquisitions: 'full' (n,n) storage
    or spectral truncation C (k,k) + eigenvectors V (n,k), with rank-1
    downdates on query (reference ``active_learning.py:237-575``).  The
    dense algebra runs on device (jnp)."""

    def __init__(self, C, V=None, gamma2=0.1**2):
        C = np.asarray(C)
        assert C.shape[0] == C.shape[1] or V is not None
        self.C = jnp.asarray(C)
        self.V = None if V is None else jnp.asarray(np.asarray(V))
        self.gamma2 = gamma2
        self.storage = "full" if V is None else "trunc"

    def _col_stats(self, candidate_ind):
        """Returns (Cavk or C columns, column L2^2, column sum^2, diag)."""
        if self.storage == "full":
            cols = self.C[:, candidate_ind]
            diag = self.gamma2 + jnp.diag(self.C)[candidate_ind]
        else:
            cols = self.C @ self.V[candidate_ind, :].T  # (k, m)
            diag = self.gamma2 + jnp.sum(self.V[candidate_ind, :].T * cols, axis=0)
        norms2 = jnp.sum(cols * cols, axis=0)
        sums2 = jnp.sum(cols, axis=0) ** 2
        return norms2, sums2, diag

    def update(self, query_ind, query_labels):
        for k in np.atleast_1d(query_ind):
            if self.storage == "full":
                ck = self.C[:, k]
                self.C = self.C - jnp.outer(ck, ck) / (self.gamma2 + self.C[k, k])
            else:
                vk = self.V[k]
                Cavk = self.C @ vk
                ip = jnp.vdot(vk, Cavk)
                self.C = self.C - jnp.outer(Cavk, Cavk) / (self.gamma2 + ip)


class var_opt(_covariance_acq):
    """V-optimality (Ji-Han): col_norms^2 / diag."""

    def compute(self, u, candidate_ind):
        norms2, _, diag = self._col_stats(candidate_ind)
        return np.asarray(norms2 / diag)


class sigma_opt(_covariance_acq):
    """Σ-optimality (Ma-Garnett-Schneider): col_sums^2 / diag."""

    def compute(self, u, candidate_ind):
        _, sums2, diag = self._col_stats(candidate_ind)
        return np.asarray(sums2 / diag)


class model_change(_covariance_acq):
    """Model-change (Miller-Bertozzi): uncertainty × col_norm / diag."""

    def __init__(self, C, V=None, gamma2=0.1**2, unc_method="smallest_margin"):
        super().__init__(C, V=V, gamma2=gamma2)
        self.unc_sampling = unc_sampling(unc_method=unc_method)

    def compute(self, u, candidate_ind):
        unc = self.unc_sampling.compute(u, candidate_ind)
        norms2, _, diag = self._col_stats(candidate_ind)
        return unc * np.asarray(jnp.sqrt(norms2) / diag)


class model_change_var_opt(_covariance_acq):
    """Combined model-change + V-optimality."""

    def __init__(self, C, V=None, gamma2=0.1**2, unc_method="smallest_margin"):
        super().__init__(C, V=V, gamma2=gamma2)
        self.unc_sampling = unc_sampling(unc_method=unc_method)

    def compute(self, u, candidate_ind):
        unc = self.unc_sampling.compute(u, candidate_ind)
        norms2, _, diag = self._col_stats(candidate_ind)
        return unc * np.asarray(norms2 / diag)
