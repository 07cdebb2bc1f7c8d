"""Semi-supervised learning on graphs — TPU-native re-expression of
reference ``graphlearning/ssl.py`` (2,059 LoC, 14 models).

Architecture: each model's ``_fit`` marshals once to device and runs a
single jitted solver program (``lax.while_loop`` fixed-point iterations over
matrix-free SpMM ops) — no per-iteration host round-trips, unlike the
reference's scipy loops.  The sklearn-style object façade (``fit`` /
``predict`` / ``fit_predict`` / ``ssl_trials``) matches the reference API
(``ssl.py:131-510``) for drop-in compatibility.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from graphlearning_tpu import config, utils
from graphlearning_tpu.core import graphclass as _graphmod
from graphlearning_tpu.core.sparse import SparseGraph
from graphlearning_tpu.ops import graphops as _ops
from graphlearning_tpu.solvers import cg as _cg

results_dir = os.path.abspath(os.path.join(os.getcwd(), "results"))


class ssl:
    """Abstract base (reference ``ssl.py:131-510``): one-vs-rest loop,
    class-prior volume projection, trial harness, accuracy reporting."""

    def __init__(self, W=None, class_priors=None):
        if W is None:
            self.graph = None
        else:
            self.set_graph(W)
        self.prob = None
        self.fitted = False
        self.name = ""
        self.accuracy_filename = ""
        self.requires_eig = False
        self.onevsrest = False
        self.similarity = True
        self.class_priors = class_priors
        if self.class_priors is not None:
            self.class_priors = np.asarray(self.class_priors, dtype=float)
            self.class_priors = self.class_priors / np.sum(self.class_priors)
        self.weights = 1
        self.class_priors_error = 1

    def set_graph(self, W):
        if isinstance(W, _graphmod.graph):
            self.graph = W
        else:
            self.graph = _graphmod.graph(W)

    # -- prediction (reference ssl.py:230-266) ----------------------------

    def predict(self, ignore_class_priors=False):
        if not self.fitted:
            sys.exit("Model has not been fitted yet.")
        w = 1 if ignore_class_priors else self.weights
        scores = self.prob - np.min(self.prob)
        m = np.max(scores)
        if m > 0:
            scores = scores / m
        if self.similarity:
            return np.argmax(scores * w, axis=1)
        return np.argmin(scores * w, axis=1)

    def fit_predict(self, train_ind, train_labels, all_labels=None):
        self.fit(train_ind, train_labels, all_labels=all_labels)
        return self.predict()

    # -- volume projection (reference ssl.py:172-209) ---------------------

    def volume_label_projection(self):
        """Gradient loop on per-class decision weights until predicted class
        sizes match ``class_priors``."""
        k = self.prob.shape[1]
        if isinstance(self.weights, int):
            self.weights = np.ones((k,))
        dt = 0.1 * (-1 if self.similarity else 1)
        # NOTE reference flips sign for similarity scores (ssl.py:190-192):
        # dt *= -1 when similarity
        dt = -0.1 if self.similarity else 0.1
        i, err = 0, 1.0
        while i < 1e4 and err > 1e-3:
            i += 1
            class_size = np.mean(
                utils.labels_to_onehot(self.predict(), k), axis=0
            )
            grad = class_size - self.class_priors
            err = np.max(np.abs(grad))
            self.weights = self.weights + dt * grad
            self.weights = self.weights / self.weights[0]
        self.class_priors_error = err
        return self.predict()

    # -- fitting (reference ssl.py:439-481) -------------------------------

    def fit(self, train_ind, train_labels, all_labels=None):
        if self.graph is None:
            sys.exit("SSL object has no graph. Use set_graph().")
        train_ind = np.asarray(train_ind)
        train_labels = np.asarray(train_labels)
        self.fitted = True
        if self.onevsrest:
            unique_labels = np.unique(train_labels)
            self.prob = np.zeros((self.graph.num_nodes, len(unique_labels)))
            for i, l in enumerate(unique_labels):
                self.prob[:, i] = np.asarray(
                    self._fit(train_ind, train_labels == l)
                )
        else:
            self.prob = np.asarray(
                self._fit(train_ind, train_labels, all_labels=all_labels)
            )
        if self.class_priors is not None:
            self.volume_label_projection()
        return self.prob

    def _fit(self, train_ind, train_labels, all_labels=None):
        raise NotImplementedError("Must override _fit")

    # -- trial harness (reference ssl.py:292-436) -------------------------

    def get_accuracy_filename(self):
        fname = self.accuracy_filename
        if self.class_priors is not None:
            fname += "_classpriors"
        return fname + "_accuracy.csv"

    def ssl_trials(self, trainsets, labels, num_cores=1, tag="",
                   save_results=True, overwrite=False, num_trials=-1):
        """Multi-trial benchmark runner (reference ``ssl.py:292-396``).
        The reference forks joblib processes; here trials run sequentially
        on the device (each trial is already device-parallel; trial-level
        vmap batching is a planned optimisation)."""
        labels = np.asarray(labels)
        if save_results:
            os.makedirs(results_dir, exist_ok=True)
            outfile = os.path.join(results_dir, tag + self.get_accuracy_filename())
            if os.path.exists(outfile) and not overwrite:
                print(f"Results file {outfile} exists; aborting (overwrite=False)")
                return None
            with open(outfile, "w") as fh:
                fh.write("Number of labels,Accuracy\n")
        else:
            outfile = None

        if num_trials > 0:
            trainsets = trainsets[:num_trials]
        results = []
        for train_ind in trainsets:
            train_ind = np.asarray(train_ind)
            train_labels = labels[train_ind]
            pred = self.fit_predict(train_ind, train_labels)
            acc = ssl_accuracy(pred, labels, train_ind)
            results.append((len(train_ind), acc))
            if outfile is not None:
                with open(outfile, "a") as fh:
                    fh.write(f"{len(train_ind)},{acc:.2f}\n")
        return np.array(results)

    def trials_statistics(self, tag=""):
        """Aggregate saved trial CSVs (reference ``ssl.py:398-436``)."""
        outfile = os.path.join(results_dir, tag + self.get_accuracy_filename())
        X = utils.csvread(outfile)
        num_train = np.unique(X[:, 0])
        acc_mean, acc_std, counts = [], [], []
        for m in num_train:
            accs = X[X[:, 0] == m, 1]
            acc_mean.append(np.mean(accs))
            acc_std.append(np.std(accs))
            counts.append(len(accs))
        return num_train, np.array(acc_mean), np.array(acc_std), np.array(counts)


# -- accuracy (reference ssl.py:1795-1834) --------------------------------


def ssl_accuracy(pred_labels, true_labels, train_ind=None):
    """Accuracy excluding training points and negatively-labeled nodes."""
    pred_labels = np.asarray(pred_labels)
    true_labels = np.asarray(true_labels)
    mask = true_labels >= 0
    if train_ind is not None:
        train_ind = np.asarray(train_ind)
        if train_ind.dtype == bool:
            mask &= ~train_ind
        else:
            tm = np.zeros(len(true_labels), dtype=bool)
            tm[train_ind] = True
            mask &= ~tm
    if mask.sum() == 0:
        return 100.0
    return 100.0 * np.mean(pred_labels[mask] == true_labels[mask])


# =========================================================================
# Models
# =========================================================================


class laplace(ssl):
    """Laplace/harmonic learning (Zhu-Ghahramani-Lafferty; reference
    ``ssl.py:1106-1261``): solve ``tau u + L^m u = 0`` on unlabeled nodes
    with ``u = y`` at labels, via masked Jacobi-preconditioned CG on device."""

    def __init__(self, W=None, class_priors=None, X=None, reweighting="none",
                 normalization="combinatorial", tau=0, order=1,
                 mean_shift=False, tol=1e-5, alpha=2, zeta=1e7, r=0.1):
        super().__init__(W, class_priors)
        self.reweighting = reweighting
        self.normalization = normalization
        self.mean_shift = mean_shift
        self.tol = tol
        self.order = int(order)
        self.X = X
        self.alpha, self.zeta, self.r = alpha, zeta, r
        if np.isscalar(tau):
            self.tau = np.ones(self.graph.num_nodes) * tau if self.graph else tau
        else:
            self.tau = np.asarray(tau)

        fname = "_laplace"
        self.name = "Laplace Learning"
        if reweighting != "none":
            fname += "_" + reweighting
            self.name += ": " + reweighting + " reweighted"
        if normalization != "combinatorial":
            fname += "_" + normalization
            self.name += " " + normalization
        if mean_shift:
            fname += "_meanshift"
        if self.order > 1:
            fname += "_order%d" % self.order
        if np.max(np.atleast_1d(self.tau)) > 0:
            fname += "_tau_%.3f" % np.max(np.atleast_1d(self.tau))
        self.accuracy_filename = fname

    def _fit(self, train_ind, train_labels, all_labels=None):
        if self.reweighting == "none":
            G = self.graph
        else:
            W = self.graph.reweight(
                train_ind, method=self.reweighting,
                normalization=self.normalization if self.reweighting == "poisson" else "combinatorial",
                X=self.X, alpha=self.alpha, zeta=self.zeta, r=self.r,
            )
            G = _graphmod.graph(W)

        n = G.num_nodes
        k = len(np.unique(train_labels))
        F = utils.labels_to_onehot(train_labels, k)

        mask = np.zeros(n, dtype=bool)
        mask[train_ind] = True
        bdy_values = np.zeros((n, k))
        bdy_values[train_ind] = F

        tau = np.broadcast_to(np.atleast_1d(self.tau), (n,)).astype(float)
        matvec, diag = G.laplacian_op(self.normalization)
        tau_j = jnp.asarray(tau, dtype=config.float_dtype())
        order = self.order

        def L(X):
            Y = X
            for _ in range(order):
                Y = tau_j[:, None] * Y + matvec(Y)
            return Y

        # diag of (tau + L)^order approximated by (tau + diag L)^order for
        # the Jacobi preconditioner (preconditioner quality only)
        Ldiag = (tau_j + diag) ** order

        u, iters, res = _cg.constrained_solve(
            L, Ldiag, jnp.asarray(mask),
            jnp.asarray(bdy_values, dtype=config.float_dtype()),
            tol=self.tol, max_iter=10**5,
        )
        u = np.asarray(u)
        if self.mean_shift:
            u = u - np.mean(u, axis=0)
        return u


class randomwalk(ssl):
    """Lazy-random-walk learning (Zhou-Schölkopf; reference
    ``ssl.py:1731-1793``): CG solve of ``((1+tau)I - alpha D^-1/2 W D^-1/2)u = F``."""

    def __init__(self, W=None, class_priors=None, alpha=0.95, tau=0):
        super().__init__(W, class_priors)
        self.alpha = alpha
        self.tau = tau
        self.name = "Random Walk"
        self.accuracy_filename = "_randomwalk"

    def _fit(self, train_ind, train_labels, all_labels=None):
        G = self.graph
        n = G.num_nodes
        k = len(np.unique(train_labels))
        F = np.zeros((n, k))
        F[train_ind] = utils.labels_to_onehot(train_labels, k)

        g = G.sparse
        deg = _ops.degree_vector(g)
        alpha = self.alpha
        tau = self.tau

        s = 1.0 / jnp.sqrt(deg)

        def A(X):
            return (1 + tau) * X - alpha * s[:, None] * _ops.spmm(g, s[:, None] * X)

        u, _, _ = _cg.conjgrad(
            A, jnp.asarray(F, dtype=config.float_dtype()), tol=1e-10, max_iter=10**5
        )
        return np.asarray(u)


class poisson(ssl):
    """Poisson learning (Calder-Cook-Thorpe-Slepčev ICML'20; reference
    ``ssl.py:513-693``).  Solvers: 'conjugate_gradient' (normalized-Laplacian
    CG with D^{±1/2} conjugation), 'gradient_descent' (u ← Db + Pu with
    random-walk mixing-time stopping — one fused jitted while_loop replacing
    the reference's torch-CUDA branch), 'spectral' (truncated eigenbasis)."""

    def __init__(self, W=None, class_priors=None, solver="conjugate_gradient",
                 p=1, use_cuda=False, min_iter=50, max_iter=1000, tol=1e-3,
                 spectral_cutoff=10):
        super().__init__(W, class_priors)
        self.solver = solver
        self.p = p
        self.min_iter = min_iter
        self.max_iter = max_iter
        self.tol = tol
        self.spectral_cutoff = spectral_cutoff
        self.name = "Poisson Learning"
        fname = "_poisson"
        if solver == "spectral":
            fname += "_N%d" % spectral_cutoff
            self.requires_eig = True
        self.accuracy_filename = fname

    def _fit(self, train_ind, train_labels, all_labels=None):
        G = self.graph
        n = G.num_nodes
        k = len(np.unique(train_labels))

        # zero diagonal for faster convergence (ssl.py:614-617)
        W = G.weight_matrix.copy()
        W.setdiag(0)
        W.eliminate_zeros()
        G0 = _graphmod.graph(W)
        g = G0.sparse

        onehot = utils.labels_to_onehot(train_labels, k)
        source = np.zeros((n, k))
        source[train_ind] = onehot - np.mean(onehot, axis=0)
        b = jnp.asarray(source, dtype=config.float_dtype())

        deg = _ops.degree_vector(g)

        if self.solver == "conjugate_gradient":
            s = 1.0 / jnp.sqrt(deg)

            def Lnorm(X):
                return X - s[:, None] * _ops.spmm(g, s[:, None] * X)

            v, _, _ = _cg.conjgrad(Lnorm, s[:, None] * b, tol=self.tol, max_iter=10**5)
            u = s[:, None] * v
        elif self.solver == "gradient_descent":
            u = np.asarray(
                _poisson_gradient_descent(
                    g, b, jnp.asarray(train_ind), self.min_iter, self.max_iter
                )
            )
        elif self.solver == "spectral":
            vals, vecs = G0.eigen_decomp(
                normalization="randomwalk", k=self.spectral_cutoff + 1
            )
            V = vecs[:, 1:]
            lam = vals[1:]
            if self.p != 1:
                lam = lam**self.p
            u = V @ ((V.T @ np.asarray(b)) / lam[:, None])
        else:
            sys.exit("Invalid Poisson solver " + self.solver)
        return np.asarray(u)


def _poisson_gradient_descent(g: SparseGraph, b, train_ind, min_iter, max_iter):
    """Fused device loop for Poisson GD (reference ssl.py:631-677):
    ``u ← D^-1 b + D^-1 W^T u`` until the random walk from the labeled set
    mixes (``max|v - v_inf| <= 1/n``)."""
    n = g.n
    deg = _ops.degree_vector(g)
    dinv = 1.0 / deg
    Db = dinv[:, None] * b
    v0 = jnp.zeros((n,), dtype=b.dtype).at[train_ind].set(1.0)
    v0 = v0 / jnp.sum(v0)
    vinf = deg / jnp.sum(deg)
    u0 = jnp.zeros_like(b)

    def cond(state):
        u, v, T = state
        not_mixed = jnp.max(jnp.abs(v - vinf)) > 1.0 / n
        return jnp.logical_and(
            jnp.logical_or(T < min_iter, not_mixed), T < max_iter
        )

    def body(state):
        u, v, T = state
        u = Db + dinv[:, None] * _ops.spmm_t(g, u)
        v = _ops.spmm_t(g, dinv * v)
        return u, v, T + 1

    u, v, T = jax.lax.while_loop(cond, body, (u0, v0, 0))
    return u
