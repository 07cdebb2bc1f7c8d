"""Clustering module — TPU-native re-expression of reference
``graphlearning/clustering.py`` (spectral, Fokker-Planck, INCRES, withinss/
RP1D, Hungarian accuracy, purity).

Spectral embeddings come from the device LOBPCG eigensolver
(:mod:`graphlearning_tpu.solvers.eig`); diffusion iterations (INCRES grow
steps) are device SpMMs inside ``lax.while_loop``; Fokker-Planck's dense
matrix exponential runs as ``jax.scipy.linalg.expm`` on device.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from graphlearning_tpu import config
from graphlearning_tpu.core import graphclass as _graphmod
from graphlearning_tpu.ops import graphops as _ops


class clustering:
    """Abstract base (reference ``clustering.py:19-110``)."""

    def __init__(self, W, num_clusters):
        if isinstance(W, _graphmod.graph):
            self.graph = W
        else:
            self.graph = _graphmod.graph(W)
        self.cluster_labels = None
        self.num_clusters = num_clusters
        self.fitted = False

    _sharded_supported = False     # overridden by spectral/incres

    def distribute(self, mesh="auto", strict=False):
        """Enable sharded (multi-device) execution for this model's fit —
        same contract as :meth:`ssl.ssl.distribute`.  Consumed by
        :class:`spectral` (sharded LOBPCG eigensolver) and :class:`incres`
        (sharded plant/grow/harvest loop); other clusterers warn loudly
        (``strict=True`` raises) and run single-device."""
        if mesh is None:
            self._dist = None
        else:
            if not type(self)._sharded_supported:
                msg = (f"{type(self).__name__} has no sharded execution "
                       "path; fits will run single-device despite "
                       "distribute()")
                if strict:
                    raise NotImplementedError(msg)
                import warnings

                warnings.warn(msg, stacklevel=2)
            from graphlearning_tpu.parallel import execute as _exec

            self._dist = _exec.Distributor(mesh)
        return self

    def predict(self):
        if not self.fitted:
            sys.exit("Model has not been fitted yet.")
        return self.cluster_labels

    def fit(self, all_labels=None):
        pred = self._fit(all_labels=all_labels)
        self.fitted = True
        self.cluster_labels = np.asarray(pred)
        return self.cluster_labels

    def fit_predict(self, all_labels=None):
        self.fit(all_labels=all_labels)
        return self.predict()

    def _fit(self, all_labels=None):
        raise NotImplementedError("Must override _fit")


class spectral(clustering):
    """Spectral clustering: 'combinatorial', 'ShiMalik' (randomwalk), or
    'NgJordanWeiss' (normalized + row normalization) embeddings + KMeans
    (reference ``clustering.py:113-198``)."""

    _sharded_supported = True

    def __init__(self, W, num_clusters, method="NgJordanWeiss", extra_dim=0,
                 seed=0):
        super().__init__(W, num_clusters)
        self.method = method
        self.extra_dim = extra_dim
        # seed=0 (not None): the embedding is deterministic, so a seeded
        # k-means makes the whole fit reproducible by default; pass
        # seed=None for reference-style global-RNG restarts
        # (clustering.py:197 sklearn KMeans(random_state=None))
        self.seed = seed

    def _fit(self, all_labels=None):
        from graphlearning_tpu.solvers.kmeans import kmeans

        k = self.num_clusters + self.extra_dim
        dist = getattr(self, "_dist", None)
        norm_of = {"combinatorial": "combinatorial",
                   "ShiMalik": "randomwalk",
                   "NgJordanWeiss": "normalized"}
        if self.method not in norm_of:
            sys.exit("Invalid spectral clustering method " + self.method)
        if dist is not None:
            # sharded LOBPCG over the mesh's node axis; k-means then runs
            # on the gathered (n, k) embedding (cheap relative to the solve)
            from graphlearning_tpu.parallel import execute as _exec

            vals, vec = _exec.eigen_decomp_sharded(
                dist, self.graph.weight_matrix,
                normalization=norm_of[self.method], k=k)
            vec = jnp.asarray(vec)
        # keep the (n, k) embedding on device: row normalization + the
        # multi-restart k-means run there, only int32 labels come back
        elif self.method == "combinatorial":
            vals, vec = self.graph.eigen_decomp_device(k=k)
        elif self.method == "ShiMalik":
            vals, vec = self.graph.eigen_decomp_device(
                normalization="randomwalk", k=k)
        else:
            vals, vec = self.graph.eigen_decomp_device(
                normalization="normalized", k=k)
        if self.method == "NgJordanWeiss":
            norms = jnp.sqrt(jnp.sum(vec * vec, axis=1))
            vec = vec / jnp.maximum(norms[:, None], 1e-30)
        seed = (int(np.random.randint(2**31)) if self.seed is None
                else int(self.seed))
        return kmeans(vec, self.num_clusters, n_init=10, seed=seed)


class fokker_planck(clustering):
    """Fokker-Planck clustering (Craig-Trillos-Slepčev; reference
    ``clustering.py:200-280``): interpolate between Coifman-Lafon diffusion
    and the mean-shift generator, run ``expm(Qt)`` (device dense expm),
    KMeans the rows."""

    def __init__(self, W, num_clusters, beta=0.5, t=1, rho=None, seed=None):
        super().__init__(W, num_clusters)
        self.beta = beta
        self.t = t
        self.rho = np.ones(self.graph.num_nodes) if rho is None else np.asarray(rho)
        self.seed = seed

    def _fit(self, all_labels=None):
        import scipy.sparse as sp

        G = self.graph
        rhoinv = 1.0 / self.rho

        Q1 = -G.laplacian(normalization="coifmanlafon")
        Qms = G.gradient(rhoinv, weighted=True).T.tocsr()
        Qms.data[Qms.data < 0] = 0
        Qms.eliminate_zeros()
        Qms = Qms - sp.spdiags(np.asarray(Qms @ np.ones(G.num_nodes)), 0,
                               G.num_nodes, G.num_nodes)
        Q = self.beta * Qms + (1 - self.beta) * Q1
        Qd = jnp.asarray(Q.toarray(), dtype=config.float_dtype())
        expQt = jax.scipy.linalg.expm(Qd * self.t)
        # device k-means: sklearn on an (n, n) embedding costs tens of
        # seconds host-side (and a large device->host transfer)
        from graphlearning_tpu.solvers.kmeans import kmeans

        # seed=None: global-RNG-driven restarts (the reference's sklearn
        # KMeans with random_state=None, clustering.py:278)
        seed = (int(np.random.randint(2**31)) if self.seed is None
                else int(self.seed))
        return kmeans(expQt, self.num_clusters, n_init=10, seed=seed)


class incres(clustering):
    """INCRES incremental reseeding (Bresson et al.; reference
    ``clustering.py:282-371``): plant random seeds per cluster, grow by
    random-walk diffusion (device SpMM in a ``lax.while_loop``), harvest
    by argmax, increment seed count."""

    _sharded_supported = True

    def __init__(self, W, num_clusters, speed=5, T=200, seed=None):
        super().__init__(W, num_clusters)
        self.speed = speed
        self.T = T
        self.seed = seed

    def _fit(self, all_labels=None):
        G = self.graph
        n, k = G.num_nodes, self.num_clusters
        g = G.sparse
        deg = _ops.degree_vector(g)
        # seed=None consumes the GLOBAL numpy RNG (reference
        # clustering.py:337,355 semantics); explicit seed reproduces
        rs = np.random if self.seed is None else np.random.RandomState(self.seed)
        dev_seed = (int(np.random.randint(2**31)) if self.seed is None
                    else int(self.seed))

        Dm = max(int(self.speed * 1e-4 * n / k), 1)
        u = rs.randint(0, k, size=n)
        m = 1

        if all_labels is None:
            # fused fixed point: all T plant/grow/harvest rounds run as ONE
            # device program (seed planting = Gumbel-top-k on device; the
            # reference's per-round host np.random planting is replaced by
            # the jax RNG — the algorithm is stochastic either way)
            from graphlearning_tpu.ops import accel as _accel

            dist = getattr(self, "_dist", None)
            if dist is not None:
                from graphlearning_tpu.parallel import execute as _exec

                return _exec.incres_fit_sharded(
                    dist, G.weight_matrix, u, dev_seed, k=k, T=self.T,
                    Dm=Dm)

            key = jax.random.PRNGKey(dev_seed)
            acc = _accel.maybe_build(G.weight_matrix, cache_obj=self,
                                     attr="_accel_incres", exact=False,
                                     fast=True)
            u0 = jnp.asarray(u, dtype=jnp.int32)
            if acc is not None:
                deg_p = acc.to_perm(jnp.asarray(deg))
                dinv_p = jnp.where(deg_p > 0,
                                   1.0 / jnp.where(deg_p == 0, 1.0, deg_p),
                                   0.0)
                return np.array(acc.incres(dinv_p, u0, key, k=k, T=self.T,
                                           Dm=Dm, n_true=n))
            return np.array(_incres_loop_xla(
                g, jnp.asarray(deg, dtype=config.float_dtype()), u0, key,
                k=k, T=self.T, Dm=Dm))

        @jax.jit
        def grow(F):
            # F ← P F = W D^-1 F until every node is reached; capped at n
            # steps (graph diameter bound) so a disconnected graph cannot
            # spin the while_loop forever (TPU watchdog)
            def cond(state):
                F, it = state
                return jnp.logical_and(jnp.min(F) == 0, it < n)

            def body(state):
                F, it = state
                return _ops.spmm(g, F / deg[:, None]), it + 1

            return jax.lax.while_loop(cond, body, (F, 0))[0]

        for i in range(self.T):
            F = np.zeros((n, k))
            for r in range(k):
                ind = np.where(u == r)[0]
                if len(ind) == 0:
                    ind = np.arange(n)
                F[rs.choice(ind, m), r] = 1
            F = grow(jnp.asarray(F, dtype=config.float_dtype()))
            u = np.asarray(jnp.argmax(F, axis=1))
            m = m + Dm
            if all_labels is not None:
                acc = clustering_accuracy(u, all_labels)
                print("Iteration %d: Accuracy = %.2f%%, #seeds = %d" % (i, acc, m))
        return u


import functools as _functools


@_functools.partial(jax.jit, static_argnames=("k", "T", "Dm"))
def _incres_loop_xla(g, deg, u0, key, *, k, T, Dm):
    """Fused INCRES loop on the gather-path SpMM (accel counterpart:
    ``ops.accel._incres_accel``)."""
    n = u0.shape[0]
    max_m = 1 + (T - 1) * Dm
    neg_inf = -jnp.inf
    dinv = jnp.where(deg > 0, 1.0 / jnp.where(deg == 0, 1.0, deg), 0.0)

    def grow(F):
        def cond(state):
            F, it = state
            return jnp.logical_and(jnp.min(F) == 0, it < n)

        def body(state):
            F, it = state
            return _ops.spmm(g, dinv[:, None] * F), it + 1

        return jax.lax.while_loop(cond, body, (F, 0))[0]

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
                & (top_vals > neg_inf)).astype(deg.dtype)
        F = jnp.zeros((n, k), deg.dtype)
        F = F.at[top_idx, jnp.arange(k)[:, None]].add(take)
        F = grow(F)
        return (jnp.argmax(F, axis=1).astype(jnp.int32), key), None

    (u, _), _ = jax.lax.scan(round_fn, (u0, key), jnp.arange(T))
    return u


def withinss(x):
    """Exact 1-D 2-means via sorted prefix scan (reference
    ``clustering.py:373-430``).  Returns (withinss value, threshold)."""
    x = np.sort(np.asarray(x, dtype=float))
    n = x.shape[0]
    sigma = np.std(x)
    # prefix means: v[i] = (i+1) m1^2 + (n-i-1) m2^2 with split after x[i]
    csum = np.cumsum(x)
    total = csum[-1]
    i = np.arange(1, n)
    m1 = csum[:-1] / i
    m2 = (total - csum[:-1]) / (n - i)
    v = i * m1**2 + (n - i) * m2**2
    ind = np.argmax(v)
    m = x[ind]
    w = (np.sum(x**2) - v[ind]) / (n * sigma**2)
    return w, m


def RP1D(X, T=100, seed=None):
    """Random-projection 1-D clustering (Han-Boutin; reference
    ``clustering.py:432-468``)."""
    X = np.asarray(X)
    n, d = X.shape
    rs = np.random.RandomState(seed)
    v = rs.rand(T, d)
    # all projections at once on device (MXU matmul), then host scan
    P = np.asarray(jnp.asarray(X, dtype=config.float_dtype()) @ jnp.asarray(v.T, dtype=config.float_dtype()))
    wmin, imin, mbest = np.inf, 0, 0.0
    for i in range(T):
        w, m = withinss(P[:, i])
        if w < wmin:
            wmin, imin, mbest = w, i, m
    labels = np.zeros(n)
    labels[P[:, imin] > mbest] = 1
    return labels


def clustering_accuracy(pred_labels, true_labels):
    """Hungarian-assignment clustering accuracy (reference
    ``clustering.py:470-510``)."""
    from scipy.optimize import linear_sum_assignment

    pred = np.asarray(pred_labels).astype(int)
    tl = np.asarray(true_labels).copy()
    unique_classes, tl = np.unique(tl, return_inverse=True)
    num_classes = len(unique_classes)
    num_pred = int(pred.max()) + 1
    C = np.zeros((num_pred, num_classes))
    for i in range(num_pred):
        for j in range(num_classes):
            C[i, j] = np.sum((pred == i) & (tl == j))
    row, col = linear_sum_assignment(-C)
    return 100.0 * C[row, col].sum() / len(tl)


def purity(cluster_labels, true_labels):
    """Cluster purity (reference ``clustering.py:513-547``)."""
    pred = np.asarray(cluster_labels).astype(int)
    tl = np.asarray(true_labels)
    n = len(tl)
    total = 0
    for c in np.unique(pred):
        members = tl[pred == c]
        if len(members):
            _, counts = np.unique(members, return_counts=True)
            total += counts.max()
    return 100.0 * total / n
