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
from graphlearning_tpu.ops import accel as _accel
from graphlearning_tpu.ops import graphops as _ops
from graphlearning_tpu.solvers import cg as _cg

import functools


# Module-level jitted solver entry points: stable function identities mean
# repeated fits (ssl_trials, active-learning refits) hit the jit cache
# instead of retracing a fresh closure every call.

@functools.partial(jax.jit, static_argnames=("max_iter",))
def _cg_scaled_solve(g, s, b, c0, c1, tol, max_iter=10**5, x0=None):
    """CG solve of ``(c0 I - c1 diag(s) W diag(s)) x = b``.  ``x0``: warm
    start (active-learning refits; same solution, fewer iterations)."""

    def A(X):
        return c0 * X - c1 * s[:, None] * _ops.spmm(g, s[:, None] * X)

    x, _, _ = _cg.conjgrad(A, b, x0=x0, tol=tol, max_iter=max_iter)
    return x


@jax.jit
def _project_out_nlap_kernel(v, deg):
    """Remove the ``D^{1/2} 1`` kernel component per class column.

    The normalized Laplacian ``I - D^{-1/2} W D^{-1/2}`` is singular with
    kernel ``D^{1/2} 1``; the Poisson rhs is kernel-orthogonal (sources
    sum to zero, reference ssl.py:620-622), so the exact CG-from-zero
    solution is too — but float32 rounding drifts a DIFFERENT kernel
    multiple into each class column, which shifts the argmax globally
    (measured: 35% prediction flips vs the f64 scipy solution on a
    uniform 2-D kNN graph at n=32768, large margins).  Projecting the
    known kernel back out restores the f64-gauge solution.  Padding rows
    (deg 0) contribute nothing."""
    q = jnp.sqrt(jnp.maximum(deg, 0.0)).astype(v.dtype)
    coef = (q @ v) / jnp.sum(q * q)
    return v - q[:, None] * coef[None, :]


@functools.partial(jax.jit,
                   static_argnames=("normalization", "order", "max_iter"))
def _laplace_constrained(g, tau, mask, bdy, tol, normalization="combinatorial",
                         order=1, max_iter=10**5, u0=None):
    """Masked CG solve of ``(tau + L)^order u = 0`` with ``u=bdy`` on mask.
    ``u0``: warm start (active-learning refits)."""
    deg = _ops.degree_vector(g)

    def L(X):
        Y = X
        for _ in range(order):
            Y = tau[:, None] * Y + _ops.laplacian_matvec(
                g, Y, normalization=normalization, deg=deg)
        return Y

    diag = _ops.laplacian_diag(g, normalization=normalization, deg=deg)
    Ldiag = (tau + diag) ** order
    u, _, _ = _cg.constrained_solve(L, Ldiag, mask, bdy, tol=tol,
                                    max_iter=max_iter, u0=u0)
    return u

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
        # invalidate per-graph solver caches (accel plan, zero-diag graph)
        self._accel_cache = None
        self._nodiag_cache = None

    # Families whose _fit consumes _dist (sharded execution path exists).
    # dynamic_label_propagation is dense and size-gated at n<=5000
    # (reference ssl.py:1318-1341) — nothing to shard.
    _sharded_supported = True

    def distribute(self, mesh="auto", strict=False):
        """Enable sharded (multi-device) execution for this model's fits.

        ``mesh``: a ``jax.sharding.Mesh``, a :class:`config.GLTConfig`,
        ``"auto"`` (1-D mesh over all local devices), or ``None`` to
        disable.  Fits then run SPMD over the mesh's node axis via
        ``parallel.execute`` — same results as single-device execution up
        to float reduction order (SURVEY.md §7.1 item 4).  Returns self
        for chaining: ``gl.ssl.poisson(W).distribute(mesh).fit_predict(...)``.

        Models without a sharded path warn loudly (``strict=True``
        raises) instead of silently running single-device.
        """
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
        pm = getattr(self, "poisson_model", None)
        if pm is not None:             # poisson_mbo's initializer model
            pm._dist = self._dist
        return self

    def _nodiag_graph(self):
        """Zero-diagonal copy of the model's graph (reference
        ``ssl.py:614-617``), cached so repeated fits skip the scipy
        rebuild + host->device transfer."""
        cached = getattr(self, "_nodiag_cache", None)
        if cached is None:
            W0 = self.graph.weight_matrix
            # shared across model instances via the W object, so repeated
            # fits on the same graph reuse device arrays + accel caches
            cached = getattr(W0, "_glt_nodiag_cache", None)
            if cached is None:
                if W0.diagonal().any():
                    W = W0.copy()
                    W.setdiag(0)
                    W.eliminate_zeros()
                    cached = (W, _graphmod.graph(W))
                else:
                    cached = (W0, _graphmod.graph(W0))
                try:
                    W0._glt_nodiag_cache = cached
                except Exception:
                    pass
            self._nodiag_cache = cached
        return cached

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

    def fit_predict(self, train_ind, train_labels, all_labels=None,
                    checkpoint_path=None, checkpoint_every=1):
        self.fit(train_ind, train_labels, all_labels=all_labels,
                 checkpoint_path=checkpoint_path,
                 checkpoint_every=checkpoint_every)
        return self.predict()

    def warmup(self, num_classes=2, num_labels=None, seed=0):
        """Ahead-of-time compile/plan: run one throwaway fit on a random
        balanced trainset so the one-time costs (RCM reordering, band
        materialization, XLA compiles — minutes cold through a remote-TPU
        tunnel) are paid NOW instead of inside the first real fit.
        ``num_classes`` must match the label count of the real workload
        (program shapes depend on it).  Returns self."""
        n = self.graph.num_nodes
        rs = np.random.RandomState(seed)
        m = num_labels if num_labels is not None else 5 * num_classes
        ti = rs.choice(n, min(m, n), replace=False)
        fake = np.arange(len(ti)) % num_classes
        self.fit(ti, fake)
        self.fitted = False           # throwaway state
        self.prob = None
        self.weights = 1
        return self

    def fit_predict_batched(self, trainsets, labels):
        """Fit many trials at once, returning a list of prediction arrays.

        TPU-native replacement for the reference's joblib process pool
        (``ssl.py:390-396``): when the model implements ``_fit_batched``
        (mask-based solvers are directly vmappable) and all trials share a
        size, every trial solves in ONE device program (trial axis batched
        through vmap onto the MXU).  Falls back to a sequential loop."""
        labels = np.asarray(labels)
        trainsets = [np.asarray(t) for t in trainsets]
        sizes = {len(t) for t in trainsets}
        if (len(sizes) == 1 and self.class_priors is None
                and not self.onevsrest and hasattr(self, "_fit_batched")):
            preds = self._fit_batched(np.stack(trainsets), labels)
            self.fitted = True
            return [np.asarray(p) for p in preds]
        return [self.fit_predict(t, labels[t]) for t in trainsets]

    # -- volume projection (reference ssl.py:172-209) ---------------------

    def volume_label_projection(self):
        """Gradient loop on per-class decision weights until predicted class
        sizes match ``class_priors`` (reference ssl.py:172-209).  Runs as
        ONE jitted ``lax.while_loop`` on device — the reference's host loop
        recomputes an (n, k) argmin per step, up to 1e4 times per call."""
        k = self.prob.shape[1]
        if isinstance(self.weights, int):
            self.weights = np.ones((k,))
        # NOTE reference flips sign for similarity scores (ssl.py:190-192)
        dt = -0.1 if self.similarity else 0.1
        scores = self.prob - np.min(self.prob)
        m = np.max(scores)
        if m > 0:
            scores = scores / m
        w, err = _volume_projection_loop(
            jnp.asarray(scores, dtype=config.float_dtype()),
            jnp.asarray(self.weights, dtype=config.float_dtype()),
            jnp.asarray(self.class_priors, dtype=config.float_dtype()),
            dt, similarity=bool(self.similarity))
        self.weights = np.asarray(w, dtype=float)
        self.class_priors_error = float(err)
        return self.predict()

    # -- fitting (reference ssl.py:439-481) -------------------------------

    def fit(self, train_ind, train_labels, all_labels=None,
            checkpoint_path=None, checkpoint_every=1):
        """Fit the model (reference ssl.py:439-481 semantics).

        ``checkpoint_path``: opt-in solver-state checkpointing for models
        with long outer loops (poisson_mbo, volume_mbo — the
        mbo_convolution.cpp:1029-1161 analogues): the outer iteration
        state is saved every ``checkpoint_every`` rounds via
        :mod:`graphlearning_tpu.checkpoint`, and a killed fit re-run with
        the same path RESUMES from the last checkpoint, producing the
        identical prediction (the PRNG key and projection weights thread
        through the checkpointed state).  Models without a segmented loop
        ignore it.  The reference has no solver-state persistence
        (SURVEY.md §5 checkpoint row)."""
        if self.graph is None:
            sys.exit("SSL object has no graph. Use set_graph().")
        self._ckpt = ((os.path.abspath(checkpoint_path),
                       int(checkpoint_every))
                      if checkpoint_path else None)
        train_ind = np.asarray(train_ind)
        train_labels = np.asarray(train_labels)
        self.fitted = True
        if self.onevsrest:
            unique_labels = np.unique(train_labels)
            if hasattr(self, "_fit_onevsrest"):
                # class-batched path: all C one-vs-rest problems solve in
                # ONE device program (shared gathers; C× fewer iterations
                # of dispatch than the per-class loop)
                self.prob = np.asarray(self._fit_onevsrest(
                    train_ind, train_labels, unique_labels))
            else:
                self.prob = np.zeros(
                    (self.graph.num_nodes, len(unique_labels)))
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

    def fit_device(self, train_ind, train_labels):
        """Device-resident fit: like :meth:`fit` but returns the (n, C)
        score block WITHOUT the device->host fetch — np.asarray of the
        solution is ~0.3 s at n=70k through the remote-TPU tunnel, the
        dominant fixed cost of an active-learning ``update`` (measured,
        scripts/al_profile.py).  ``self.prob`` is then a device array;
        ``predict()`` still works (it fetches once, lazily).  Models
        whose ``_fit`` honors ``_device_u`` (laplace, poisson) stay on
        device; anything else falls back to the host path."""
        if self.graph is None:
            sys.exit("SSL object has no graph. Use set_graph().")
        if (self.onevsrest or self.class_priors is not None):
            return jnp.asarray(self.fit(train_ind, train_labels))
        self._ckpt = None
        self.fitted = True
        u = self._fit_on_device(np.asarray(train_ind),
                                np.asarray(train_labels))
        self.prob = u
        return u

    def _fit_on_device(self, train_ind, train_labels):
        self._device_u = True
        try:
            u = self._fit(train_ind, train_labels)
        finally:
            self._device_u = False
        return jnp.asarray(u)

    # -- trial harness (reference ssl.py:292-436) -------------------------

    def get_accuracy_filename(self):
        fname = self.accuracy_filename
        if self.class_priors is not None:
            fname += "_classpriors"
        return fname + "_accuracy.csv"

    def ssl_trials(self, trainsets, labels, num_cores=1, tag="",
                   save_results=True, overwrite=False, num_trials=-1,
                   resume=False):
        """Multi-trial benchmark runner (reference ``ssl.py:292-396``).
        The reference forks joblib processes; here same-size trials are
        grouped and solved in ONE device program via the model's
        vmap-batched fit (``fit_predict_batched``), with a sequential
        fallback for models without a batched path.

        ``resume=True``: a killed sweep continues — completed trials are
        counted from the existing results CSV and skipped, new rows
        append.  (The reference can only abort-or-overwrite whole files,
        ssl.py:333-335.)  Returns the rows computed THIS call."""
        labels = np.asarray(labels)
        has_priors = self.class_priors is not None
        done_rows = 0
        if save_results:
            os.makedirs(results_dir, exist_ok=True)
            outfile = os.path.join(results_dir, tag + self.get_accuracy_filename())
            exists = os.path.exists(outfile)
            if exists and resume:
                with open(outfile) as fh:
                    done_rows = max(0, sum(1 for _ in fh) - 1)  # - header
            elif exists and not overwrite:
                print(f"Results file {outfile} exists; aborting (overwrite=False)")
                return None
            if done_rows == 0:
                with open(outfile, "w") as fh:
                    # reference header (ssl.py:339-342): priors models
                    # record the dual accuracy (without/with priors) + the
                    # priors error
                    if has_priors:
                        fh.write("Number of labels,Accuracy,"
                                 "Accuracy with class priors,Class priors error\n")
                    else:
                        fh.write("Number of labels,Accuracy\n")
        else:
            outfile = None

        if num_trials > 0:
            trainsets = trainsets[:num_trials]
        trainsets = [np.asarray(t) for t in trainsets[done_rows:]]
        if not trainsets:
            return np.zeros((0, 4 if has_priors else 2))

        if has_priors:
            # priors path (reference ssl.py:366-389): per-trial fit, then
            # both predictions (the volume projection is a cheap device
            # loop; the fit itself dominates)
            results = []
            for train_ind in trainsets:
                pred = self.fit_predict(train_ind, labels[train_ind])
                acc_with = ssl_accuracy(pred, labels, train_ind)
                pred_np = self.predict(ignore_class_priors=True)
                acc_without = ssl_accuracy(pred_np, labels, train_ind)
                row = (len(train_ind), acc_without, acc_with,
                       self.class_priors_error)
                results.append(row)
                if outfile is not None:
                    with open(outfile, "a") as fh:
                        fh.write("%d,%.2f,%.2f,%.5f\n" % row)
            return np.array(results)

        # group same-size trials so vmap-batched models solve each group in
        # one device program (joblib replacement, see fit_predict_batched)
        preds = [None] * len(trainsets)
        by_size = {}
        for i, t in enumerate(trainsets):
            by_size.setdefault(len(t), []).append(i)
        for idxs in by_size.values():
            group_preds = self.fit_predict_batched(
                [trainsets[i] for i in idxs], labels)
            for i, p in zip(idxs, group_preds):
                preds[i] = p

        results = []
        for train_ind, pred in zip(trainsets, preds):
            acc = ssl_accuracy(pred, labels, train_ind)
            results.append((len(train_ind), acc))
            if outfile is not None:
                with open(outfile, "a") as fh:
                    fh.write(f"{len(train_ind)},{acc:.2f}\n")
        return np.array(results)

    def trials_statistics(self, tag=""):
        """Aggregate saved trial CSVs (reference ``ssl.py:398-436``).

        Returns ``(num_train, acc_mean, acc_stddev, num_trials)`` with
        ``acc_mean``/``acc_stddev`` of shape ``(m, c)`` — ``c = 1`` for plain
        runs, ``c = 3`` (acc without priors, acc with priors, priors error)
        for class-priors runs — matching the reference's column blocks so
        ``accuracy_table``/``accuracy_plot`` can consume either CSV format
        (including the reference's own ``ResultsFromPaper`` files)."""
        outfile = os.path.join(results_dir, tag + self.get_accuracy_filename())
        X = utils.csvread(outfile)
        X = np.atleast_2d(X)
        num_train = np.unique(X[:, 0])
        acc_mean, acc_std = [], []
        for m in num_train:
            Y = X[X[:, 0] == m, 1:]
            acc_mean.append(np.mean(Y, axis=0))
            acc_std.append(np.std(Y, axis=0))
        num_trials = int(len(X) / max(1, len(num_train)))
        return num_train, np.array(acc_mean), np.array(acc_std), num_trials


# -- accuracy (reference ssl.py:1795-1834) --------------------------------


@functools.partial(jax.jit, static_argnames=("similarity",))
def _volume_projection_loop(scores, weights, priors, dt, *, similarity):
    """Device version of the reference's class-size gradient loop
    (ssl.py:172-209) — traceable core in
    :func:`graphlearning_tpu.solvers.volume.projection_weights`."""
    from graphlearning_tpu.solvers import volume as _volume

    return _volume.projection_weights(scores, weights, priors, dt,
                                      similarity=similarity)


def warmup(model, num_classes=2, num_train=None, seed=0):
    """AOT warm-up: pre-compile a model's solver programs (and populate its
    per-graph caches — RCM/band plans, zero-diagonal copy, shardings) by
    running one fit with synthetic labels on the model's OWN graph, then
    resetting the fitted state.

    XLA traces/compiles per shape, so a warm-up at the real (n, k,
    num_classes) makes the first real ``fit_predict`` hit the jit cache —
    the cold-compile cost (minutes through a remote-TPU tunnel) moves to
    this call, which can run before labels exist.  Pair with the
    persistent compilation cache (``config.py``) for cross-process reuse.
    The reference has no equivalent (scipy needs no compilation).

    ``num_classes`` must match the later fit's class count (the one-hot
    width is a compiled shape).  Returns the model for chaining:
    ``gl.warmup(gl.ssl.poisson(W), 10).fit_predict(ti, tl)``.

    For FRESH processes (where even a cache-warm compile pays tunnel
    round trips), ``gl.aot`` packs skip tracing/compilation entirely:
    ``save_poisson_pack`` / ``save_laplace_pack`` / ``save_spectral_pack``
    serialize the whole compiled fit once per graph geometry, and the
    ``load_*`` twins return ready-to-call ``fit_predict`` callables.
    """
    rs = np.random.RandomState(seed)
    n = model.graph.num_nodes
    m = num_train if num_train is not None else min(
        max(10, 2 * num_classes), n)
    ti = np.sort(rs.choice(n, m, replace=False))
    tl = np.arange(m) % num_classes
    model.fit_predict(ti, tl)
    model.prob = None
    model.fitted = False
    return model


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
            # cache the reweighted graph per train set: repeated fits on
            # the same split (trials, predict-after-fit) reuse the scipy
            # build, the device transfer AND the accel caches attached to
            # the reweighted W object
            rkey = (self.reweighting, np.asarray(train_ind).tobytes())
            if getattr(self, "_reweight_key", None) == rkey:
                G = self._reweight_G
            else:
                W = self.graph.reweight(
                    train_ind, method=self.reweighting,
                    normalization=self.normalization if self.reweighting == "poisson" else "combinatorial",
                    X=self.X, alpha=self.alpha, zeta=self.zeta, r=self.r,
                )
                G = _graphmod.graph(W)
                self._reweight_key = rkey
                self._reweight_G = G

        n = G.num_nodes
        k = len(np.unique(train_labels))
        F = utils.labels_to_onehot(train_labels, k)

        mask = np.zeros(n, dtype=bool)
        mask[train_ind] = True
        bdy_values = np.zeros((n, k))
        bdy_values[train_ind] = F

        tau = np.broadcast_to(np.atleast_1d(self.tau), (n,)).astype(float)
        tau_j = jnp.asarray(tau, dtype=config.float_dtype())
        order = self.order

        # active-learning warm start (active_learner(warm_start=True)):
        # the previous round's solution seeds the CG iterate — same
        # solution, far fewer iterations (the reference refits cold,
        # active_learning.py:108-117)
        warm = getattr(self, "_warm_u", None)
        u0 = None
        if warm is not None and np.shape(warm) == (n, k):
            u0 = jnp.asarray(warm, dtype=config.float_dtype())

        dist = getattr(self, "_dist", None)
        if dist is not None:
            from graphlearning_tpu.parallel import execute as _exec

            u = _exec.laplace_fit_sharded(
                dist, G.weight_matrix, mask, bdy_values, tau, self.tol,
                self.normalization, order,
                u0=None if u0 is None else np.asarray(u0))
            if self.mean_shift:
                u = u - np.mean(u, axis=0)
            return u

        from graphlearning_tpu.native import hostpath as _hp

        if (_hp.use_host(n)
                and self.normalization in ("combinatorial", "randomwalk",
                                           "normalized")):
            # tiny graph through the remote-TPU tunnel: one host sparse LU
            # beats the device dispatch floor (round-1 config 1 was 0.8x)
            u = _hp.laplace_host(G.weight_matrix, mask, bdy_values, tau,
                                 self.normalization, order)
            if self.mean_shift:
                u = u - np.mean(u, axis=0)
            return u

        acc = None
        if self.normalization in ("combinatorial", "randomwalk",
                                  "normalized"):
            acc = _accel.maybe_build(
                G.weight_matrix,
                cache_obj=self if self.reweighting == "none" else None)
        bdy_j = jnp.asarray(bdy_values, dtype=config.float_dtype())
        if acc is not None:
            # banded-Pallas fast path in RCM-permuted space; padding rows
            # are identity (diag 1, tau 0, unlabeled, rhs 0).  The Jacobi
            # diag of (tau + L)^order uses (tau + diag L)^order — same
            # approximation as the plain path (preconditioner quality only).
            deg_p = acc.to_perm(_ops.degree_vector(G.sparse))
            diag_p = acc.to_perm(
                _ops.laplacian_diag(G.sparse,
                                    normalization=self.normalization),
                fill=1.0)
            u = acc.laplace_constrained(
                deg_p, diag_p, acc.to_perm(tau_j),
                acc.to_perm(jnp.asarray(mask, dtype=jnp.int32)) > 0,
                acc.to_perm(bdy_j), self.tol,
                normalization=self.normalization, order=order,
                u0_p=None if u0 is None else acc.to_perm(u0))
            u = acc.from_perm(u)
        else:
            u = _laplace_constrained(
                G.sparse, tau_j, jnp.asarray(mask), bdy_j, self.tol,
                normalization=self.normalization, order=order, u0=u0)
        if getattr(self, "_device_u", False):
            # device-resident caller (fit_device): skip the (n, k)
            # device->host fetch (~0.3 s at n=70k through the tunnel)
            return u - jnp.mean(u, axis=0) if self.mean_shift else u
        u = np.asarray(u)
        if self.mean_shift:
            u = u - np.mean(u, axis=0)
        return u

    def _fit_batched(self, trainsets, labels):
        """vmap-batched multi-trial Laplace solve: stacked boundary masks
        (T, n) and values (T, n, k) through one vmapped masked CG.  Returns
        (T, n) predicted labels.  Reweighting falls back (it rebuilds the
        graph per trial)."""
        if self.reweighting != "none":
            return [self.fit_predict(t, np.asarray(labels)[t])
                    for t in trainsets]
        G = self.graph
        n = G.num_nodes
        labels = np.asarray(labels)
        classes = np.unique(labels[labels >= 0])
        k = len(classes)
        remap = np.zeros(int(classes.max()) + 1, dtype=int)
        remap[classes] = np.arange(k)

        T = len(trainsets)
        masks = np.zeros((T, n), dtype=bool)
        bdy = np.zeros((T, n, k))
        for t, train_ind in enumerate(trainsets):
            masks[t, train_ind] = True
            bdy[t, train_ind, remap[labels[train_ind]]] = 1.0

        tau = np.broadcast_to(np.atleast_1d(self.tau), (n,)).astype(float)
        matvec, diag = G.laplacian_op(self.normalization)
        tau_j = jnp.asarray(tau, dtype=config.float_dtype())
        order = self.order

        def L(X):
            Y = X
            for _ in range(order):
                Y = tau_j[:, None] * Y + matvec(Y)
            return Y

        Ldiag = (tau_j + diag) ** order
        mean_shift = self.mean_shift

        def solve_one(mask, b):
            u = _cg.constrained_solve(L, Ldiag, mask, b, tol=self.tol,
                                      max_iter=10**5)[0]
            if mean_shift:
                u = u - jnp.mean(u, axis=0)
            return jnp.argmax(u, axis=1)

        preds = jax.jit(jax.vmap(solve_one))(
            jnp.asarray(masks), jnp.asarray(bdy, dtype=config.float_dtype()))
        return classes[np.asarray(preds)]


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

        dist = getattr(self, "_dist", None)
        if dist is not None:
            from graphlearning_tpu.parallel import execute as _exec

            return _exec.randomwalk_fit_sharded(dist, G.weight_matrix, F,
                                                alpha, tau)

        s = 1.0 / jnp.sqrt(deg)
        F_j = jnp.asarray(F, dtype=config.float_dtype())
        acc = _accel.maybe_build(G.weight_matrix, cache_obj=self)
        if acc is not None:
            u = acc.cg_scaled(acc.to_perm(s), acc.to_perm(F_j),
                              c0=1.0 + tau, c1=alpha, tol=1e-10)
            return np.asarray(acc.from_perm(u))
        u = _cg_scaled_solve(g, s, F_j, 1.0 + tau, alpha, 1e-10)
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

        # zero diagonal for faster convergence (ssl.py:614-617); cached
        W, G0 = self._nodiag_graph()
        g = G0.sparse

        onehot = utils.labels_to_onehot(train_labels, k)
        source = np.zeros((n, k))
        source[train_ind] = onehot - np.mean(onehot, axis=0)
        b = jnp.asarray(source, dtype=config.float_dtype())

        dist = getattr(self, "_dist", None)
        if dist is not None and self.solver in ("conjugate_gradient",
                                                "gradient_descent"):
            from graphlearning_tpu.parallel import execute as _exec

            if self.solver == "conjugate_gradient":
                warm = getattr(self, "_warm_u", None)
                if warm is not None and np.shape(warm) != (n, k):
                    warm = None
                return _exec.poisson_cg_fit_sharded(dist, W, source,
                                                    self.tol, u0=warm)
            return _exec.poisson_gd_fit_sharded(dist, W, source, train_ind,
                                                self.min_iter, self.max_iter)

        deg = _ops.degree_vector(g)

        if self.solver == "conjugate_gradient":
            s = 1.0 / jnp.sqrt(deg)
            # active-learning warm start: previous solution u = s*v seeds
            # the conjugated iterate v0 = u/s (reference refits cold,
            # active_learning.py:108-117)
            warm = getattr(self, "_warm_u", None)
            x0 = None
            if warm is not None and np.shape(warm) == (n, b.shape[1]):
                x0 = jnp.asarray(warm, dtype=config.float_dtype()) \
                    * jnp.sqrt(deg)[:, None]
            # bf16x3 SpMM (~1e-5 operator error) is safe whenever the CG
            # tolerance is loose enough; exact f32 otherwise
            acc = _accel.maybe_build(W, cache_obj=self,
                                     exact=self.tol < 1e-4)
            if acc is not None:
                # banded-Pallas fast path: solve in RCM-permuted space
                # (padding rows have s=0 → identity rows with zero rhs)
                s_p = acc.to_perm(s)
                v = acc.cg_scaled(s_p, s_p[:, None] * acc.to_perm(b),
                                  tol=self.tol,
                                  x0=None if x0 is None else acc.to_perm(x0))
                deg_p = jnp.where(s_p > 0, 1.0 / jnp.where(
                    s_p == 0, 1.0, s_p) ** 2, 0.0)
                v = _project_out_nlap_kernel(v, deg_p)
                u = acc.from_perm(s_p[:, None] * v)
            else:
                v = _cg_scaled_solve(g, s, s[:, None] * b, 1.0, 1.0,
                                     self.tol, x0=x0)
                v = _project_out_nlap_kernel(v, deg)
                u = s[:, None] * v
        elif self.solver == "gradient_descent":
            # banded fast path (symmetric graphs only: spmm == spmm_t there)
            acc = None
            if (W != W.T).nnz == 0:
                acc = _accel.maybe_build(W, cache_obj=self, attr="_accel_gd",
                                         exact=False)
            if acc is not None:
                v0 = np.zeros(n)
                v0[train_ind] = 1.0
                v0 /= v0.sum()
                u = acc.poisson_gd(
                    acc.to_perm(deg),
                    acc.to_perm(jnp.asarray(
                        np.asarray(b) / np.asarray(deg)[:, None],
                        dtype=config.float_dtype())),
                    acc.to_perm(jnp.asarray(v0, dtype=config.float_dtype())),
                    self.min_iter, self.max_iter, n)
                u = np.asarray(acc.from_perm(u))
            else:
                u = np.asarray(
                    _poisson_gradient_descent(
                        g, b, jnp.asarray(train_ind), self.min_iter,
                        self.max_iter
                    )
                )
        elif self.solver == "spectral":
            if dist is not None:
                from graphlearning_tpu.parallel import execute as _exec

                vals, vecs = _exec.eigen_decomp_sharded(
                    dist, W, normalization="randomwalk",
                    k=self.spectral_cutoff + 1)
            else:
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
        if getattr(self, "_device_u", False) and isinstance(u, jnp.ndarray):
            return u          # device-resident caller: skip the fetch
        return np.asarray(u)

    def _fit_batched(self, trainsets, labels):
        """vmap-batched multi-trial Poisson solve (conjugate_gradient
        solver): stacked sources through one vmapped CG on the normalized
        Laplacian.  Returns (T, n) predicted labels."""
        labels = np.asarray(labels)
        if self.solver != "conjugate_gradient":
            return [self.fit_predict(t, labels[t]) for t in trainsets]
        G = self.graph
        n = G.num_nodes
        W, G0 = self._nodiag_graph()
        g = G0.sparse

        classes = np.unique(labels[labels >= 0])
        k = len(classes)
        remap = np.zeros(int(classes.max()) + 1, dtype=int)
        remap[classes] = np.arange(k)

        T = len(trainsets)
        sources = np.zeros((T, n, k))
        for t, train_ind in enumerate(trainsets):
            onehot = np.zeros((len(train_ind), k))
            onehot[np.arange(len(train_ind)), remap[labels[train_ind]]] = 1.0
            sources[t, train_ind] = onehot - onehot.mean(0)

        deg = _ops.degree_vector(g)
        s = 1.0 / jnp.sqrt(deg)

        def Lnorm(X):
            return X - s[:, None] * _ops.spmm(g, s[:, None] * X)

        tol = self.tol

        def solve_one(b):
            v, _, _ = _cg.conjgrad(Lnorm, s[:, None] * b, tol=tol,
                                   max_iter=10**5)
            v = _project_out_nlap_kernel(v, deg)
            return jnp.argmax(s[:, None] * v, axis=1)

        preds = jax.jit(jax.vmap(solve_one))(
            jnp.asarray(sources, dtype=config.float_dtype()))
        return classes[np.asarray(preds)]


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


class poisson_mbo(ssl):
    """PoissonMBO (Calder-Cook-Thorpe-Slepčev ICML'20; reference
    ``ssl.py:695-839``): initialize with Poisson learning, then T outer MBO
    iterations of Ns heat-equation steps ``u ← (I - dt L) u + mu dt source``
    followed by volume-constrained label projection.  The Ns-step heat
    stepping runs as one fused jitted ``lax.fori_loop`` on device
    (replacing the reference's torch-CUDA branch, ssl.py:807-823)."""

    def __init__(self, W=None, class_priors=None, solver="conjugate_gradient",
                 use_cuda=False, min_iter=50, max_iter=1000, tol=1e-3,
                 spectral_cutoff=10, Ns=40, mu=1, T=20):
        super().__init__(W, class_priors)
        self.poisson_model = poisson(W, solver=solver, min_iter=min_iter,
                                     max_iter=max_iter, tol=tol,
                                     spectral_cutoff=spectral_cutoff)
        self.Ns = Ns
        self.mu = mu
        self.T = T
        fname = "_poisson_mbo"
        if solver == "spectral":
            fname += "_N%d" % spectral_cutoff
            self.requires_eig = True
        fname += "_Ns_%d_mu_%.2f_T_%d" % (Ns, mu, T)
        self.accuracy_filename = fname
        self.name = "Poisson MBO"

    def _fit(self, train_ind, train_labels, all_labels=None):
        n = self.graph.num_nodes
        k = len(np.unique(train_labels))
        W, G = self._nodiag_graph()
        g = G.sparse
        dtype = config.float_dtype()

        onehot = utils.labels_to_onehot(train_labels, k)
        source = np.zeros((n, k))
        source[train_ind] = onehot - np.mean(onehot, axis=0)

        labels = self.poisson_model.fit_predict(train_ind, train_labels)
        u = utils.labels_to_onehot(labels, k)

        deg = _ops.degree_vector(g)
        dt = 1.0 / float(np.asarray(jnp.max(deg)))
        Db = jnp.asarray(self.mu * dt * source, dtype=dtype)
        Ns = self.Ns
        if isinstance(self.weights, int):
            self.weights = np.ones((k,))
        w0 = jnp.asarray(self.weights, dtype=dtype)
        priors = jnp.asarray(self.class_priors, dtype=dtype)

        dist = getattr(self, "_dist", None)
        if dist is not None and all_labels is None:
            from graphlearning_tpu.parallel import execute as _exec

            uj, w, err = _exec.poisson_mbo_fit_sharded(
                dist, W, self.mu * dt * source, u, self.weights,
                self.class_priors, dt, Ns, self.T)
            self.weights = w
            self.class_priors_error = err
            return uj

        # bf16-band fast path: heat stepping feeds a threshold projection,
        # so ~0.3% SpMM error is immaterial — stream the band at half bytes
        acc = _accel.maybe_build(W, cache_obj=self, attr="_accel_mbo",
                                 exact=False, fast=True)
        if acc is not None:
            deg_p = acc.to_perm(deg)
            Db_p = acc.to_perm(Db)

        ck = getattr(self, "_ckpt", None)
        if ck is not None and all_labels is None:
            # checkpointed outer loop (SURVEY.md §5 checkpoint row; the
            # reference's closest analogue pickles whole graphs,
            # graph.py:1335-1368): one jitted round per outer iteration,
            # state (u, w, err) saved every `checkpoint_every` rounds —
            # a killed fit re-run with the same path resumes and yields
            # the identical prediction (deterministic round program)
            from graphlearning_tpu import checkpoint as _checkpoint
            from graphlearning_tpu.solvers import volume as _volume

            path, every = ck
            if acc is not None:
                def heat_steps_t(uu):
                    return acc.from_perm(
                        acc.heat_steps(deg_p, acc.to_perm(uu), Db_p, dt,
                                       Ns))
            else:
                deg_c = jnp.asarray(deg, dtype=dtype)
                dt_c = jnp.asarray(dt, dtype=dtype)

                def heat_steps_t(uu):
                    def bodyh(j, uu):
                        Lu = deg_c[:, None] * uu - _ops.spmm(g, uu)
                        return uu - dt_c * Lu + Db

                    return jax.lax.fori_loop(0, Ns, bodyh, uu)

            round_jit = jax.jit(lambda st: _volume.poisson_mbo_round(
                heat_steps_t, st, priors))
            state0 = (jnp.asarray(u, dtype=dtype), w0,
                      jnp.asarray(1.0, dtype))
            (uj, w, err), _ = _checkpoint.run_checkpointed(
                round_jit, state0, self.T, path, every=every)
            self.weights = np.asarray(w, dtype=float)
            self.class_priors_error = float(err)
            return np.asarray(uj)

        if all_labels is None:
            # fused outer loop: T x (Ns heat steps + volume projection +
            # threshold) as ONE device program (the per-outer eager loop
            # pays an (n, k) round-trip + dispatches per round)
            u0 = jnp.asarray(u, dtype=dtype)
            if acc is not None:
                uj, w, err = acc.poisson_mbo(deg_p, Db_p, u0, w0, priors,
                                             dt, Ns, self.T)
            else:
                uj, w, err = _poisson_mbo_loop_xla(
                    g, jnp.asarray(deg, dtype=dtype), Db, u0, w0, priors,
                    jnp.asarray(dt, dtype=dtype), Ns=Ns, T=self.T)
            self.weights = np.asarray(w, dtype=float)
            self.class_priors_error = float(err)
            return np.asarray(uj)

        # verbose path: per-outer accuracy tracing (reference semantics)
        if acc is not None:
            def heat_steps(u):
                u_p = acc.to_perm(u)
                return acc.from_perm(
                    acc.heat_steps(deg_p, u_p, Db_p, dt, Ns))
        else:

            @jax.jit
            def heat_steps(u):
                # u ← (I - dt L) u + mu dt src, Ns times (fused on device)
                def body(j, u):
                    Lu = deg[:, None] * u - _ops.spmm(g, u)
                    return u - dt * Lu + Db

                return jax.lax.fori_loop(0, Ns, body, u)

        for i in range(self.T):
            u = np.asarray(heat_steps(jnp.asarray(u, dtype=dtype)))
            self.prob = u
            labels = self.volume_label_projection()
            u = utils.labels_to_onehot(labels, k)
            acc_pct = ssl_accuracy(labels, all_labels, train_ind)
            print("%d, Accuracy = %.2f" % (i, acc_pct))
        return u


@functools.partial(jax.jit, static_argnames=("Ns", "T"))
def _poisson_mbo_loop_xla(g, deg, Db, u0, w0, priors, dt, *, Ns, T):
    """Fused PoissonMBO on the gather-path SpMM (accel counterpart is
    ``ops.accel._poisson_mbo_accel``)."""
    from graphlearning_tpu.solvers import volume as _volume

    def heat_steps(u):
        def body(j, u):
            Lu = deg[:, None] * u - _ops.spmm(g, u)
            return u - dt * Lu + Db

        return jax.lax.fori_loop(0, Ns, body, u)

    return _volume.poisson_mbo_loop(heat_steps, u0, w0, priors, T)


def _volume_assignment(a, fixed_mask, fixed_labels, lower, upper, target,
                       max_price_it=500):
    """Volume-constrained label assignment by dual price ascent
    (traceable core in :mod:`graphlearning_tpu.solvers.volume`; the
    reference's serial auction is ``mbo_convolution.cpp:16-316``)."""
    from graphlearning_tpu.solvers import volume as _volume

    run = jax.jit(functools.partial(_volume.assign_labels,
                                    max_price_it=max_price_it))
    return run(a, fixed_mask, fixed_labels, lower, upper)


@functools.partial(jax.jit, static_argnames=("k", "max_iters", "n_true"))
def _volume_mbo_loop_xla(g, deg, labels0, fixed_mask, fixed_labels, lower,
                         upper, temp, key, *, k, max_iters, n_true):
    """Fused VolumeMBO loop on the gather-path SpMM (graphs where the
    banded accel kernel doesn't apply); accel counterpart is
    ``ops.accel._volume_mbo_accel``."""
    from graphlearning_tpu.solvers import volume as _volume

    dinv = jnp.where(deg > 0, 1.0 / jnp.where(deg == 0, 1.0, deg), 0.0)

    def dual_conv(labels):
        u = jax.nn.one_hot(labels, k, dtype=deg.dtype)
        a = dinv[:, None] * _ops.spmm(g, u)
        return dinv[:, None] * _ops.spmm(g, a)

    return _volume.mbo_loop(dual_conv, labels0, fixed_mask, fixed_labels,
                            lower, upper, temp, key, n_true=n_true,
                            max_iters=max_iters)


class volume_mbo(ssl):
    """VolumeMBO — auction-dynamics volume-constrained MBO
    (Jacobs-Merkurjev-Esedoḡlu; reference ``ssl.py:841-910`` +
    ``c_code/mbo_convolution.cpp``).  TPU-native redesign:

    * Voronoi label initialization = multi-source Bellman-Ford closest
      point (replacing ``bellman_ford_voronoi_initialization``,
      mbo_convolution.cpp:528-582),
    * graph convolution of one-hot labels = row-normalized dual SpMM
      ``P(P u)`` (replacing ``calc_dual_convolution``),
    * volume-constrained thresholding = batched dual price ascent
      (replacing sequential forward/reverse auctions),
    * temperature = Gumbel noise on the affinities (Monte-Carlo
      thresholding, mbo_convolution.cpp:770-802 analogue)."""

    def __init__(self, W=None, class_priors=None, temperature=0.1,
                 volume_constraint=0.5, max_iters=300, seed=None):
        super().__init__(W, None)
        if class_priors is None:
            sys.exit("Class priors must be provided for Volume MBO.")
        self.class_counts = (self.graph.num_nodes * np.asarray(class_priors)
                             / np.sum(class_priors)).astype(int)
        self.temperature = temperature
        self.volume_constraint = volume_constraint
        self.max_iters = max_iters
        self.seed = seed
        self.accuracy_filename = "_volume_mbo_temp_%.2f_vol_%.2f" % (
            temperature, volume_constraint)
        self.name = "Volume MBO (T=%.2f, V=%.2f)" % (temperature, volume_constraint)

    def _fit(self, train_ind, train_labels, all_labels=None):
        from graphlearning_tpu.solvers import eikonal as _eik

        n = self.graph.num_nodes
        k = len(np.unique(train_labels))
        W, G = self._nodiag_graph()
        g = G.sparse
        dtype = config.float_dtype()

        # bf16-band fast path for the dual convolution and the Voronoi
        # init (both feed thresholds — 0.3% band error immaterial);
        # gather-path fallback otherwise
        acc = _accel.maybe_build(W, cache_obj=self, attr="_accel_vmbo",
                                 exact=False, fast=True)

        # Voronoi initialization via closest labeled point
        _, cp = _eik.dijkstra(g, train_ind, bdy_val=np.zeros(len(train_ind)),
                              return_cp=True, accel=acc)
        lab_of = np.full(n, -1, dtype=int)
        lab_of[train_ind] = train_labels
        labels = np.array(lab_of[np.maximum(cp, 0)])
        labels[labels < 0] = 0
        labels[train_ind] = train_labels

        fixed_mask = np.zeros(n, dtype=bool)
        fixed_mask[train_ind] = True
        fixed_labels = np.zeros(n, dtype=int)
        fixed_labels[train_ind] = train_labels

        vc = self.volume_constraint
        lower = jnp.asarray(np.floor(vc * self.class_counts), dtype=dtype)
        upper = jnp.asarray(np.ceil((2 - vc) * self.class_counts), dtype=dtype)
        target = jnp.asarray(self.class_counts, dtype=dtype)
        fixed_mask_j = jnp.asarray(fixed_mask)
        fixed_labels_j = jnp.asarray(fixed_labels)

        deg = _ops.degree_vector(g)

        if acc is not None:
            deg_p = acc.to_perm(deg)
            dinv_p = jnp.where(deg_p > 0,
                               1.0 / jnp.where(deg_p == 0, 1.0, deg_p), 0.0)

            def dual_conv(labels):
                return acc.dual_conv_labels(dinv_p, labels, k)
        else:

            @jax.jit
            def dual_conv(labels):
                u = jax.nn.one_hot(labels, k, dtype=dtype)
                a = _ops.spmm(g, u) / deg[:, None]
                a = _ops.spmm(g, a) / deg[:, None]
                return a

        # seed=None: draw the device-RNG seed from the GLOBAL numpy RNG —
        # the reference's Monte-Carlo thresholding is srand-driven
        # (mbo_convolution.cpp:770-802), i.e. stochastic per fit
        key = jax.random.PRNGKey(
            int(np.random.randint(2**31)) if self.seed is None
            else int(self.seed))
        temp = self.temperature
        dist = getattr(self, "_dist", None)
        if dist is not None and all_labels is None:
            from graphlearning_tpu.parallel import execute as _exec

            out = _exec.volume_mbo_fit_sharded(
                dist, W, labels, fixed_mask, fixed_labels,
                np.asarray(lower), np.asarray(upper), temp, key, k,
                self.max_iters)
            labels = np.array(out)
            labels[train_ind] = train_labels
            return utils.labels_to_onehot(labels, k)
        ck = getattr(self, "_ckpt", None)
        if ck is not None and all_labels is None:
            # checkpointed MBO fixed point (SURVEY.md §5 checkpoint row):
            # one jitted round per iteration, (labels, key, it, stop)
            # saved every `checkpoint_every` rounds; the PRNG key threads
            # through the state so a killed fit resumed from the same
            # path replays the identical annealing-noise sequence and
            # yields the identical prediction.  The round is cond-gated
            # on the stop flag so overshoot segments are no-ops.
            from graphlearning_tpu import checkpoint as _checkpoint
            from graphlearning_tpu.solvers import volume as _volume

            path, every = ck
            temp_j = jnp.asarray(temp, dtype=dtype)

            @jax.jit
            def _round(st):
                return jax.lax.cond(
                    st[3], lambda s: s,
                    lambda s: _volume.mbo_round(
                        dual_conv, s, fixed_mask_j, fixed_labels_j,
                        lower, upper, temp_j, n_true=n), st)

            state0 = (jnp.asarray(labels, jnp.int32), key,
                      jnp.asarray(0, jnp.int32), jnp.asarray(False))
            (out, _, _, _), _ = _checkpoint.run_checkpointed_while(
                _round, state0,
                done_fn=lambda st: bool(np.asarray(st[3])),
                max_steps=self.max_iters, path=path, every=every)
            labels = np.array(out)
            labels[train_ind] = train_labels
            return utils.labels_to_onehot(labels, k)

        if all_labels is None:
            # fused fixed point: the whole MBO loop is ONE device program
            # (per-iteration eager dispatch through the TPU tunnel costs
            # ~0.3 s/step); one int-label transfer at the end
            labels0 = jnp.asarray(labels, dtype=jnp.int32)
            if acc is not None:
                out, _ = acc.volume_mbo(
                    dinv_p, labels0, fixed_mask_j, fixed_labels_j, lower,
                    upper, temp, key, k=k, max_iters=self.max_iters)
            else:
                out, _ = _volume_mbo_loop_xla(
                    g, jnp.asarray(deg, dtype=dtype), labels0, fixed_mask_j,
                    fixed_labels_j, lower, upper,
                    jnp.asarray(temp, dtype=dtype), key, k=k,
                    max_iters=self.max_iters, n_true=n)
            labels = np.array(out)   # writable copy (train pins below)
        else:
            # verbose path: per-iteration accuracy tracing (reference
            # ssl.py fit(all_labels=...) semantics) — eager loop
            for it in range(self.max_iters):
                a = dual_conv(jnp.asarray(labels))
                if temp > 0:
                    key, sub = jax.random.split(key)
                    a = a + temp / (it + 1) * jax.random.gumbel(
                        sub, a.shape, dtype=dtype) / n
                new_labels = np.array(
                    _volume_assignment(a, fixed_mask_j, fixed_labels_j,
                                       lower, upper, target)
                )
                changed = np.sum(new_labels != labels)
                labels = new_labels
                acc_pct = ssl_accuracy(labels, all_labels, train_ind)
                print("%d, changed=%d, Accuracy = %.2f" % (it, changed, acc_pct))
                if changed == 0 and (temp == 0 or it > 10):
                    break
        labels[train_ind] = train_labels
        return utils.labels_to_onehot(labels, k)


class multiclass_mbo(ssl):
    """Multiclass MBO (Garcia-Cardona et al.; reference ``ssl.py:912-1005``):
    diffusion in a truncated eigenbasis + fidelity + threshold.  The inner
    Ns-step diffusion is dense (num_eig-rank) matmuls — fully on device."""

    def __init__(self, W=None, class_priors=None, Ns=6, T=10, dt=0.15, mu=50,
                 num_eig=50, seed=None):
        super().__init__(W, class_priors)
        self.Ns, self.T, self.dt, self.mu, self.num_eig = Ns, T, dt, mu, num_eig
        self.seed = seed
        self.requires_eig = True
        self.accuracy_filename = "_multiclass_mbo_Ns_%d_T_%d_dt_%.3f_mu_%.2f" % (
            Ns, T, dt, mu)
        self.name = "Multiclass MBO"

    def _fit(self, train_ind, train_labels, all_labels=None):
        Ns, T, dt, mu = self.Ns, self.T, self.dt, self.mu
        n = self.graph.num_nodes
        k = len(np.unique(train_labels))
        dtype = config.float_dtype()

        dist = getattr(self, "_dist", None)
        if dist is not None:
            from graphlearning_tpu.parallel import execute as _exec

            eigvals, X = _exec.eigen_decomp_sharded(
                dist, self.graph.weight_matrix,
                normalization="normalized", k=self.num_eig)
        else:
            eigvals, X = self.graph.eigen_decomp(normalization="normalized",
                                                 k=self.num_eig)
        X = jnp.asarray(X, dtype=dtype)
        V = jnp.asarray(1.0 / (1.0 + (dt / Ns) * eigvals), dtype=dtype)

        # seed=None consumes the GLOBAL numpy RNG — the reference's
        # semantics (ssl.py:978 np.random.rand) — so repeated fits are
        # genuinely stochastic; an explicit seed gives reproducibility
        rs = np.random if self.seed is None else np.random.RandomState(self.seed)
        u0 = utils.labels_to_onehot(rs.rand(n, k).argmax(axis=1), k)
        u0[train_ind] = utils.labels_to_onehot(train_labels, k)
        J = np.zeros((n, 1))
        J[train_ind] = 1
        K = np.zeros((n, k))
        K[train_ind] = utils.labels_to_onehot(train_labels, k)
        J = jnp.asarray(J, dtype=dtype)
        K = jnp.asarray(K, dtype=dtype)

        @jax.jit
        def mbo_iter(u):
            def diffuse(s, u):
                Z = u - (dt / Ns) * mu * J * (u - K)
                return X @ (V[:, None] * (X.T @ Z))

            u = jax.lax.fori_loop(0, Ns, diffuse, u)
            labels = jnp.argmax(u, axis=1)
            return jax.nn.one_hot(labels, k, dtype=dtype)

        u = jnp.asarray(u0, dtype=dtype)
        for i in range(T):
            u = mbo_iter(u)
            if all_labels is not None:
                self.prob = np.asarray(u)
                acc = ssl_accuracy(self.predict(), all_labels, train_ind)
                print("Accuracy = %.2f" % acc)
        return np.asarray(u)


class modularity_mbo(ssl):
    """Modularity MBO (Boyd et al.; reference ``ssl.py:1007-1103``):
    modularity-spectrum diffusion ``exp(-λ dt)`` + fidelity + threshold."""

    def __init__(self, W=None, class_priors=None, gamma=0.5, epsilon=1,
                 lamb=1, T=20, Ns=5):
        super().__init__(W, class_priors)
        self.gamma, self.epsilon, self.lamb, self.T, self.Ns = gamma, epsilon, lamb, T, Ns
        self.requires_eig = True
        self.accuracy_filename = "_modularity_mbo_gamma_%.2f_epsilon_%.2f_lamb_%.2f" % (
            gamma, epsilon, lamb)
        self.name = "Modularity MBO"

    def _fit(self, train_ind, train_labels, all_labels=None):
        gamma, eps, lamb, T, Ns = self.gamma, self.epsilon, self.lamb, self.T, self.Ns
        n = self.graph.num_nodes
        k = len(np.unique(train_labels))
        dtype = config.float_dtype()

        train_onehot = utils.labels_to_onehot(train_labels, k)
        u0 = np.zeros((n, k))
        u0[train_ind] = train_onehot

        num_eig = 5 * k
        dist = getattr(self, "_dist", None)
        if dist is not None:
            from graphlearning_tpu.parallel import execute as _exec

            D, V = _exec.eigen_decomp_mod_sharded(
                dist, self.graph.weight_matrix, k=num_eig, gamma=gamma)
        else:
            D, V = self.graph.eigen_decomp(normalization="combinatorial",
                                           k=num_eig, gamma=gamma)

        deg = self.graph.degree_vector()
        dtlow = 0.15 / ((gamma + 1) * np.max(deg))
        dthigh = np.log(np.linalg.norm(u0) / eps) / max(D[0], 1e-12)
        dt = np.sqrt(dtlow * max(dthigh, dtlow))

        Vj = jnp.asarray(V, dtype=dtype)
        expD = jnp.asarray(np.exp(-D * dt), dtype=dtype)
        ti = jnp.asarray(train_ind)
        onehot_j = jnp.asarray(train_onehot, dtype=dtype)

        @jax.jit
        def mbo_iter(u):
            u = Vj @ (expD[:, None] * (Vj.T @ u))
            if lamb > 0:
                def fid(s, u):
                    return u.at[ti].add(-(dt / Ns) * lamb * (u[ti] - onehot_j))

                u = jax.lax.fori_loop(0, Ns, fid, u)
            labels = jnp.argmax(u, axis=1)
            return jax.nn.one_hot(labels, k, dtype=dtype)

        u = jnp.asarray(u0, dtype=dtype)
        for i in range(T):
            u = mbo_iter(u)
            if all_labels is not None:
                self.prob = np.asarray(u)
                acc = ssl_accuracy(self.predict(), all_labels, train_ind)
                print("Accuracy = %.2f" % acc)
        return np.asarray(u)


@jax.jit
def _dynamic_lp_step(P, u, Pt, ti, Kj, alpha, lam):
    """One dynamic-LP round (reference ssl.py:1318-1341): dense MXU
    matmuls ``Pt <- P Pt P^T + alpha v v^T + lam I``."""
    n = P.shape[0]
    v = P @ u
    u = Pt @ u
    u = u.at[ti].set(Kj)
    Pt = P @ Pt @ P.T + alpha * (v @ v.T) + lam * jnp.eye(n, dtype=P.dtype)
    return u, Pt


class dynamic_label_propagation(ssl):
    _sharded_supported = False
    """Dynamic label propagation (Wang-Tu-Tsotsos; reference
    ``ssl.py:1263-1343``): dense T-step propagation with kernel update
    ``Pt ← P Pt Pᵀ + α v vᵀ + λ I`` — dense device matmuls (MXU)."""

    def __init__(self, W=None, class_priors=None, alpha=0.05, lam=0.1, T=2):
        super().__init__(W, class_priors)
        self.alpha, self.lam, self.T = alpha, lam, T
        self.accuracy_filename = "_dynamic_label_propagation"
        self.name = "Dynamic Label Propagation"

    def _fit(self, train_ind, train_labels, all_labels=None):
        n = self.graph.num_nodes
        k = len(np.unique(train_labels))
        if n > 5000:
            print("Cannot use Dynamic Label Propagation on large datasets.")
            return np.zeros((n, k))
        dtype = config.float_dtype()
        W = self.graph.weight_matrix.copy()
        W.setdiag(0)
        W.eliminate_zeros()
        d = np.asarray(W.sum(1)).ravel()
        P = jnp.asarray(np.asarray(W.todense()) / d[:, None], dtype=dtype)
        K = utils.labels_to_onehot(train_labels, k)
        k = K.shape[1]     # onehot widens k for non-consecutive label ids
        u = np.zeros((n, k))
        u[train_ind] = K
        ti = jnp.asarray(train_ind)
        Kj = jnp.asarray(K, dtype=dtype)

        uj = jnp.asarray(u, dtype=dtype)
        Pt = P
        for i in range(self.T):
            # module-level jit: a per-fit closure would recompile the dense
            # n x n matmul chain on every fit
            uj, Pt = _dynamic_lp_step(P, uj, Pt, ti, Kj,
                                      jnp.asarray(self.alpha, dtype),
                                      jnp.asarray(self.lam, dtype))
            if all_labels is not None:
                self.prob = np.asarray(uj)
                acc = ssl_accuracy(self.predict(), all_labels, train_ind)
                print("Accuracy = %.2f" % acc)
        return np.asarray(uj)


class centered_kernel(ssl):
    """Centered kernel method (Mai-Couillet; reference ``ssl.py:1346-1426``):
    power iteration for the top centered-kernel eigenvalue, then a
    fixed-point iteration to tolerance — one fused jitted program."""

    def __init__(self, W=None, class_priors=None, tol=1e-10, power_it=100,
                 alpha=1.05, seed=0):
        super().__init__(W, class_priors)
        self.tol = tol
        self.power_it = power_it
        self.alpha = alpha
        self.seed = seed
        self.accuracy_filename = "_centered_kernel"
        self.name = "Centered Kernel"

    def _fit(self, train_ind, train_labels, all_labels=None):
        n = self.graph.num_nodes
        k = len(np.unique(train_labels))
        dtype = config.float_dtype()
        W, G = self._nodiag_graph()
        g = G.sparse

        K = np.zeros((n, k))
        K[train_ind] = utils.labels_to_onehot(train_labels, k)
        K[train_ind] -= np.sum(K, axis=0) / len(train_ind)
        Kj = jnp.asarray(K, dtype=dtype)
        mask = np.zeros(n, dtype=bool)
        mask[train_ind] = True
        maskj = jnp.asarray(mask)
        tol = max(self.tol, 100 * float(jnp.finfo(dtype).eps))

        dist = getattr(self, "_dist", None)
        if dist is not None:
            from graphlearning_tpu.parallel import execute as _exec

            return _exec.centered_kernel_fit_sharded(
                dist, W, K, mask, self.alpha, tol, self.power_it,
                self.seed)

        # banded fast path: the fixed point is hundreds of SpMM rounds
        acc = _accel.maybe_build(W, cache_obj=self, attr="_accel_ck",
                                 exact=True)
        if acc is not None:
            u_p = acc.centered_kernel(
                acc.to_perm(Kj), acc.to_perm(maskj, fill=True),
                self.alpha, tol, jax.random.PRNGKey(self.seed),
                power_it=self.power_it, n_true=n)
            return np.asarray(acc.from_perm(u_p))

        def center(X):
            return X - jnp.mean(X, axis=0, keepdims=True)

        def A(X):  # centered kernel operator
            return center(_ops.spmm(g, center(X)))

        @jax.jit
        def solve(key):
            e = jax.random.normal(key, (n, 1), dtype=dtype)

            def pbody(i, e):
                w = A(e)
                return w / jnp.linalg.norm(w)

            e = jax.lax.fori_loop(0, self.power_it, pbody, e)
            l = jnp.abs(jnp.vdot(e, A(e)) / jnp.vdot(e, e))
            alpha = self.alpha * l

            def cond(state):
                u, err, it = state
                return jnp.logical_and(err > tol, it < 10**5)

            def body(state):
                u, err, it = state
                w = A(u) / alpha - u
                w = jnp.where(maskj[:, None], 0.0, w)
                err = jnp.max(jnp.abs(w))
                return u + w, err, it + 1

            u, _, _ = jax.lax.while_loop(
                cond, body, (Kj, jnp.asarray(jnp.inf, dtype), 0)
            )
            return u

        return np.asarray(solve(jax.random.PRNGKey(self.seed)))


class sparse_label_propagation(ssl):
    """Sparse label propagation (Jung et al.; reference
    ``ssl.py:1429-1508``): primal-dual TV iteration on graph gradients.
    Edge fields live in the padded-ELL (n,k_edges) layout; the per-class
    loop of the reference is batched into one (n, k_edges, k_classes)
    program on device (ops.gradient/divergence, mirror indices)."""

    def __init__(self, W=None, class_priors=None, T=100):
        super().__init__(W, class_priors)
        self.T = T
        self.accuracy_filename = "_sparse_label_propagation"
        self.name = "Sparse LP"

    def _edge_list(self):
        """Flat COO edge arrays + mirror permutation (cached on the scipy
        matrix).  The padded-ELL edge layout pays ``n * max_degree`` per
        edge-field op — one hub makes every row carry its padding — while
        the flat list is exactly nnz (padded to a block), with the dual
        variable transported to the reverse edge by one permutation
        gather."""
        W0 = self.graph.weight_matrix
        cached = getattr(W0, "_glt_edges", None)
        if cached is None:
            coo = W0.tocoo()
            m = coo.nnz
            n = W0.shape[0]
            mp = max(256, ((m + 255) // 256) * 256)
            erow = np.full(mp, n, np.int32)       # pad -> dropped segment
            ecol = np.zeros(mp, np.int32)
            ew = np.zeros(mp, np.float64)
            erow[:m] = coo.row
            ecol[:m] = coo.col
            ew[:m] = coo.data
            # mirror: position of edge (col, row); symmetric patterns only
            key = erow.astype(np.int64) * (n + 1) + ecol
            mkey = ecol.astype(np.int64) * (n + 1) + erow
            mkey[m:] = key[m:]                    # pads mirror themselves
            order = np.argsort(key, kind="stable")
            pos = np.searchsorted(key[order], mkey)
            pos = np.clip(pos, 0, mp - 1)
            emir = np.where(key[order][pos] == mkey, order[pos],
                            np.arange(mp)).astype(np.int32)
            cached = (jnp.asarray(erow), jnp.asarray(ecol),
                      jnp.asarray(ew, dtype=config.float_dtype()),
                      jnp.asarray(emir))
            try:
                W0._glt_edges = cached
            except Exception:
                pass
        return cached

    def _fit(self, train_ind, train_labels, all_labels=None):
        dist = getattr(self, "_dist", None)
        if dist is not None:
            from graphlearning_tpu.parallel import execute as _exec

            return _exec.sparse_lp_fit_sharded(dist, self, train_ind,
                                               train_labels)
        n = self.graph.num_nodes
        kc = len(np.unique(train_labels))
        dtype = config.float_dtype()
        erow, ecol, ew, emir = self._edge_list()

        onehot = utils.labels_to_onehot(train_labels, kc)
        ti = jnp.asarray(train_ind)
        onehot_j = jnp.asarray(onehot, dtype=dtype)
        deg = _ops.degree_vector(self.graph.sparse)
        gamma = jnp.asarray(1.0 / deg, dtype=dtype)
        return np.asarray(_sparse_lp_run(
            erow, ecol, ew, emir, gamma, ti, onehot_j, n=n, kc=kc,
            T=self.T))


@functools.partial(jax.jit, static_argnames=("n", "kc", "T"))
def _sparse_lp_run(erow, ecol, ew, emir, gamma, ti, onehot_j, *, n, kc, T):
    """Primal-dual TV iteration on the flat edge list (reference
    ``ssl.py:1457-1508``; per-class loop batched over the class axis).
    ``lam_e = 1/(2 w_e + 1e-10)``; zero-weight pad edges contribute 0 to
    both the gradient and the divergence."""
    dtype = gamma.dtype
    lam = 1.0 / (2.0 * ew + 1e-10)

    def grad_all(u):                              # (m, kc)
        return ew[:, None] * (jnp.take(u, ecol, axis=0)
                              - jnp.take(u, jnp.clip(erow, 0, n - 1), axis=0))

    def div_all(Y):                               # (n, kc)
        contrib = ew[:, None] * (Y - jnp.take(Y, emir, axis=0))
        return 0.5 * jax.ops.segment_sum(contrib, erow,
                                         num_segments=n + 1)[:n]

    def body(i, state):
        u, Y = state
        u_prev = u
        div = 2.0 * div_all(Y)
        u = u_prev - gamma[:, None] * div
        u = u.at[ti].set(onehot_j)
        u_tilde = 2.0 * u - u_prev
        Gu = -grad_all(u_tilde)
        Y = Y + Gu * lam[:, None]
        Y = jnp.clip(Y, -1.0, 1.0)
        return u, Y

    u0 = jnp.zeros((n, kc), dtype=dtype)
    Y0 = jnp.zeros((erow.shape[0], kc), dtype=dtype)
    u, _ = jax.lax.fori_loop(0, T, body, (u0, Y0))
    return u


class graph_nearest_neighbor(ssl):
    """Geodesic nearest-neighbor classifier via Bellman-Ford closest-point
    labels (reference ``ssl.py:1511-1567``), with optional kNN-density
    reweighting of the eikonal RHS."""

    def __init__(self, W=None, class_priors=None, D=None, alpha=1):
        super().__init__(W, class_priors)
        self.alpha = alpha
        if class_priors is not None:
            self.onevsrest = True
            self.similarity = False
        if D is None:
            self.f = 1
        else:
            d = np.asarray(D.max(axis=1).todense()).ravel()
            self.f = (d / np.max(d)) ** alpha
        self.accuracy_filename = "_graph_nearest_neighbor_alpha%.2f" % self.alpha
        self.name = "Graph NN (alpha=%.2f)" % self.alpha

    def _fit(self, train_ind, train_labels, all_labels=None):
        from graphlearning_tpu.solvers import eikonal as _eik

        g = self.graph.sparse
        dist = getattr(self, "_dist", None)
        if dist is not None:
            from graphlearning_tpu.parallel import execute as _exec

            W = self.graph.weight_matrix
            if self.onevsrest:
                return _exec.dijkstra_fit_sharded(
                    dist, W, train_ind[train_labels], 0, self.f)
            _, cp = _exec.dijkstra_fit_sharded(
                dist, W, train_ind, np.zeros(len(train_ind)), self.f,
                return_cp=True)
            lab_of = np.zeros(self.graph.num_nodes, dtype=int)
            lab_of[train_ind] = train_labels
            k = len(np.unique(train_labels))
            return utils.labels_to_onehot(lab_of[cp], k)
        if self.onevsrest:
            return _eik.dijkstra(g, train_ind[train_labels], bdy_val=0, f=self.f)
        _, cp = _eik.dijkstra(g, train_ind,
                              bdy_val=np.zeros(len(train_ind)), f=self.f,
                              return_cp=True)
        lab_of = np.zeros(self.graph.num_nodes, dtype=int)
        lab_of[train_ind] = train_labels
        k = len(np.unique(train_labels))
        return utils.labels_to_onehot(lab_of[cp], k)


class amle(ssl):
    """AMLE (infinity-Laplace) learning, one-vs-rest wrapper over the
    device solver (reference ``ssl.py:1569-1614``)."""

    def __init__(self, W=None, class_priors=None, tol=1e-3, max_num_it=10**5,
                 weighted=False, prog=False):
        super().__init__(W, class_priors)
        self.tol = tol
        self.max_num_it = max_num_it
        self.weighted = weighted
        self.onevsrest = True
        self.accuracy_filename = "_amle" + ("" if weighted else "_unweighted")
        self.name = "AMLE"

    def _fit(self, train_ind, train_labels, all_labels=None):
        return self.graph.amle(train_ind, train_labels.astype(float),
                               tol=self.tol, max_num_it=self.max_num_it,
                               weighted=self.weighted)

    def _fit_onevsrest(self, train_ind, train_labels, unique_labels):
        from graphlearning_tpu.solvers.plaplace import amle_mc, _voronoi_init

        bdy_vals = (train_labels[:, None] == unique_labels[None, :]).astype(
            float)
        dist = getattr(self, "_dist", None)
        if dist is not None:
            from graphlearning_tpu.parallel import execute as _exec

            u0 = _voronoi_init(self.graph.sparse, train_ind, bdy_vals)
            return _exec.lip_fit_sharded(
                dist, self.graph.weight_matrix, train_ind, bdy_vals,
                alpha=0.0, beta=1.0, weighted=self.weighted, tol=self.tol,
                max_num_it=self.max_num_it, u0=u0)
        from graphlearning_tpu.native import hostpath as _hp

        acc = _accel.maybe_build(self.graph.weight_matrix, cache_obj=self,
                                 attr="_accel_dist", exact=False, fast=True)
        W = self.graph.weight_matrix
        if _hp.use_host_lip(self.graph.num_nodes, int(W.nnz), accel=acc):
            from graphlearning_tpu import native as _nat

            return _nat.lip_iterate_host_mc(
                W, train_ind, bdy_vals, alpha=0.0, beta=1.0,
                weighted=self.weighted, max_num_it=self.max_num_it,
                tol=self.tol)
        return amle_mc(self.graph.sparse, train_ind, bdy_vals, tol=self.tol,
                       accel=acc, bucketed=self.graph.bucketed(),
                       max_num_it=self.max_num_it, weighted=self.weighted)


class peikonal(ssl):
    """p-eikonal learning, one-vs-rest distance scores (reference
    ``ssl.py:1616-1678``)."""

    def __init__(self, W=None, class_priors=None, D=None, p=1, alpha=1,
                 max_num_it=10**5, tol=1e-3, num_bisection_it=30,
                 eps_ball_graph=False):
        super().__init__(W, class_priors)
        self.p = p
        self.alpha = alpha
        self.max_num_it = max_num_it
        self.tol = tol
        self.num_bisection_it = num_bisection_it
        self.onevsrest = True
        self.similarity = False
        if D is None:
            if eps_ball_graph:
                d = self.graph.degree_vector()
                self.f = (d / np.max(d)) ** (-alpha)
            else:
                self.f = 1
        else:
            d = np.asarray(D.max(axis=1).todense()).ravel()
            self.f = (d / np.max(d)) ** alpha
        self.accuracy_filename = "_peikonal_p%.2f_alpha%.2f" % (self.p, self.alpha)
        self.name = "p-eikonal (p=%.2f, alpha=%.2f)" % (self.p, self.alpha)

    def _fit(self, train_ind, train_labels, all_labels=None):
        return self.graph.peikonal(train_ind[train_labels], bdy_val=0,
                                   f=self.f, p=self.p,
                                   max_num_it=self.max_num_it, tol=self.tol,
                                   num_bisection_it=self.num_bisection_it)

    def _fit_onevsrest(self, train_ind, train_labels, unique_labels):
        from graphlearning_tpu.solvers.eikonal import peikonal_mc
        from graphlearning_tpu.native import hostpath as _hp

        dist = getattr(self, "_dist", None)
        if dist is not None:
            from graphlearning_tpu.parallel import execute as _exec

            n = self.graph.num_nodes
            C = len(unique_labels)
            bdy_mask = np.zeros((n, C), dtype=bool)
            for c, l in enumerate(unique_labels):
                bdy_mask[train_ind[train_labels == l], c] = True
            f = self.f
            if np.isscalar(f) or np.ndim(f) == 0:
                f = np.full((n,), float(f))
            return _exec.peikonal_fit_sharded(
                dist, self.graph.weight_matrix, bdy_mask, f, self.p,
                self.tol, self.max_num_it, self.num_bisection_it)

        if _hp.use_host(self.graph.num_nodes):
            from graphlearning_tpu import native as _nat

            return np.stack([
                _nat.peikonal_host(
                    self.graph.weight_matrix,
                    train_ind[train_labels == l], bdy_val=0, f=self.f,
                    p=self.p, max_num_it=self.max_num_it, tol=self.tol,
                    num_bisection_it=self.num_bisection_it)
                for l in unique_labels], axis=1)
        # no accel build: the warm start is now the class-batched
        # _bellman_ford_mc over the same padded-ELL operator the Jacobi
        # uses (one program for all classes; solvers/eikonal.py)
        bdy_sets = [train_ind[train_labels == l] for l in unique_labels]
        return peikonal_mc(self.graph.sparse, bdy_sets, f=self.f, p=self.p,
                           max_num_it=self.max_num_it, tol=self.tol,
                           num_bisection_it=self.num_bisection_it)


class plaplace(ssl):
    """Game-theoretic p-Laplace learning, one-vs-rest wrapper (reference
    ``ssl.py:1681-1727``)."""

    def __init__(self, W=None, class_priors=None, p=10, max_num_it=10**6,
                 tol=1e-1, fast=True):
        super().__init__(W, class_priors)
        self.p = p
        self.max_num_it = max_num_it
        self.tol = 1e-5 if fast else tol
        self.onevsrest = True
        self.fast = fast
        self.accuracy_filename = "_plaplace_p%.2f" % self.p
        self.name = "p-Laplace (p=%.2f)" % self.p

    def _fit(self, train_ind, train_labels, all_labels=None):
        return self.graph.plaplace(train_ind, train_labels.astype(float),
                                   self.p, max_num_it=self.max_num_it,
                                   tol=self.tol)

    def _fit_onevsrest(self, train_ind, train_labels, unique_labels):
        from graphlearning_tpu.solvers.plaplace import (plaplace_mc,
                                                        _voronoi_init)

        bdy_vals = (train_labels[:, None] == unique_labels[None, :]).astype(
            float)
        dist = getattr(self, "_dist", None)
        if dist is not None and self.fast:
            from graphlearning_tpu.parallel import execute as _exec

            alpha = 1.0 / (self.p - 1.0)
            tol = self.tol if self.tol < 1e-1 else 1e-5
            u0 = _voronoi_init(self.graph.sparse, train_ind, bdy_vals)
            return _exec.lip_fit_sharded(
                dist, self.graph.weight_matrix, train_ind, bdy_vals,
                alpha=alpha, beta=1.0 - alpha, weighted=False, tol=tol,
                max_num_it=self.max_num_it, u0=u0)
        from graphlearning_tpu.native import hostpath as _hp

        acc = None
        if self.fast:
            acc = _accel.maybe_build(self.graph.weight_matrix,
                                     cache_obj=self, attr="_accel_dist",
                                     exact=False, fast=True)
        W = self.graph.weight_matrix
        if self.fast and _hp.use_host_lip(self.graph.num_nodes,
                                          int(W.nnz), accel=acc):
            # class-parallel host Gauss-Seidel: on band-hostile graphs
            # (high-dim kNN) the device kernels stream ~99% zeros while
            # the host sweep touches only real edges (BASELINE config 5a)
            from graphlearning_tpu import native as _nat

            alpha = 1.0 / (self.p - 1.0)
            return _nat.lip_iterate_host_mc(
                W, train_ind, bdy_vals, alpha=alpha, beta=1.0 - alpha,
                max_num_it=self.max_num_it, tol=1e-6)
        return plaplace_mc(self.graph.sparse, train_ind, bdy_vals, self.p,
                           max_num_it=self.max_num_it, tol=self.tol,
                           fast=self.fast, accel=acc,
                           bucketed=self.graph.bucketed())


# -- report generators (reference ssl.py:1837-2053) ------------------------


def accuracy_plot(model_list, tag="", testerror=False, savefile=None,
                  title=None, errorbars=False, loglog=False, ylim=None,
                  fontsize=16, legend_fontsize=16, label_fontsize=16):
    """Plot mean accuracy (or test error) vs number of labels for models
    benchmarked with :meth:`ssl.ssl_trials` (reference ``ssl.py:1837-1923``)."""
    import matplotlib
    import matplotlib.pyplot as plt

    if errorbars:
        matplotlib.rcParams.update({"errorbar.capsize": 5})
    matplotlib.rcParams.update({"font.size": fontsize})
    styles = ["^b-", "or-", "dg-", "sk-", "pm-", "xc-", "*y-"]
    plt.figure()
    si = -1
    for model in model_list:
        num_train, acc_mean, acc_std, _ = model.trials_statistics(tag=tag)
        if testerror:
            acc_mean = 100.0 - acc_mean
        # column 0 = plain accuracy; column 1 (priors runs) plotted as an
        # extra '+CP' series (reference ssl.py:1879-1889)
        series = [(acc_mean[:, 0], acc_std[:, 0], model.name)]
        if acc_mean.shape[1] > 1:
            series.append((acc_mean[:, 1], acc_std[:, 1],
                           model.name + "+CP"))
        for y, yerr, name in series:
            si = (si + 1) % len(styles)
            style = styles[si]
            if errorbars:
                plt.errorbar(num_train, y, fmt=style, yerr=yerr, label=name)
            elif loglog:
                plt.loglog(num_train, y, style, label=name)
            else:
                plt.plot(num_train, y, style, label=name)
    plt.xlabel("Number of labels", fontsize=label_fontsize)
    if testerror:
        plt.ylabel("Test error (%)", fontsize=label_fontsize)
        plt.legend(loc="upper right", fontsize=legend_fontsize)
    else:
        plt.ylabel("Accuracy (%)", fontsize=label_fontsize)
        plt.legend(loc="lower right", fontsize=legend_fontsize)
    if title is not None:
        plt.title(title)
    plt.tight_layout()
    plt.grid(True)
    if ylim is not None:
        plt.ylim(ylim)
    if savefile is not None:
        plt.savefig(savefile)
    else:
        plt.show()


def accuracy_table(model_list, tag="", testerror=False, savefile="table.tex",
                   title="", fontsize="small", append=False, two_column=False,
                   small_caps=True):
    """Emit a LaTeX table of mean (std) accuracy per label count, bolding
    the best model in each column (reference ``ssl.py:1925-2053``);
    class-priors runs add a '+CP' row per model, and the bolding considers
    both the plain and the priors accuracy (reference class_priors_best);
    ``testerror`` reports 100-accuracy and bolds the lowest instead."""
    stats = [m.trials_statistics(tag=tag) for m in model_list]
    num_train = stats[0][0]
    ncols = len(num_train)
    num_trials = int(stats[0][3])

    # best (model, priors?) per label count across ALL rows including the
    # '+CP' rows (reference ssl.py:1960-1975); highest accuracy = lowest
    # test error, so the same selection serves both display modes
    best = [None] * ncols
    class_priors_best = [False] * ncols
    best_score = [-np.inf] * ncols
    for i, (_, acc_mean, _, _) in enumerate(stats):
        for j in range(ncols):
            if acc_mean[j, 0] > best_score[j]:
                best_score[j] = acc_mean[j, 0]
                best[j] = i
                class_priors_best[j] = False
        if acc_mean.shape[1] > 1:
            for j in range(ncols):
                if acc_mean[j, 1] > best_score[j]:
                    best_score[j] = acc_mean[j, 1]
                    best[j] = i
                    class_priors_best[j] = True

    env = "table*" if two_column else "table"
    lines = []
    if not append:
        lines += [
            "\\documentclass{article}",
            "\\usepackage[T1]{fontenc}",
            "\\usepackage{booktabs}",
            "\\usepackage[margin=1in]{geometry}",
            "\\begin{document}",
        ]
    lines += [
        "", f"\\begin{{{env}}}[t!]", "\\vspace{-3mm}",
        ("\\caption{%s: Average (standard deviation) %s over %d trials.}"
         % (title,
            "test error" if testerror else "classification accuracy",
            num_trials)),
        "\\vspace{-3mm}", "\\label{tab:%s}" % title, "\\vskip 0.15in",
        "\\begin{center}", f"\\begin{{{fontsize}}}",
    ]
    if small_caps:
        lines.append("\\begin{sc}")
    lines.append("\\begin{tabular}{l" + "l" * ncols + "}")
    lines.append("\\toprule")
    lines.append("\\# Labels" + "".join(
        "&\\textbf{%d}" % int(m) for m in num_train) + "\\\\")
    lines.append("\\midrule")

    def emit_row(name, vals, errs, is_best):
        row = name.ljust(15)
        for j in range(ncols):
            v = 100.0 - vals[j] if testerror else vals[j]
            cell = "%.1f (%.1f)" % (v, errs[j])
            row += "&{\\bf %s}" % cell if is_best(j) else "&%s      " % cell
        lines.append(row + "\\\\")

    for i, model in enumerate(model_list):
        _, acc_mean, acc_std, _ = stats[i]
        emit_row(model.name, acc_mean[:, 0], acc_std[:, 0],
                 lambda j, i=i: best[j] == i and not class_priors_best[j])
        if acc_mean.shape[1] > 1:
            emit_row(model.name + "+CP", acc_mean[:, 1], acc_std[:, 1],
                     lambda j, i=i: best[j] == i and class_priors_best[j])
    lines += ["\\bottomrule", "\\end{tabular}"]
    if small_caps:
        lines.append("\\end{sc}")
    lines += [f"\\end{{{fontsize}}}", "\\end{center}", "\\vskip -0.1in",
              f"\\end{{{env}}}", "", "\\end{document}", ""]

    if append and os.path.exists(savefile):
        with open(savefile) as fh:
            old = [ln for ln in fh.read().splitlines()
                   if ln != "\\end{document}"]
        lines = old + lines
    with open(savefile, "w") as fh:
        fh.write("\n".join(lines))
