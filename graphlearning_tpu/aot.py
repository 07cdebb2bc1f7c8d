"""AOT warmup packs — serialized compiled executables for flagship fits.

``gl.warmup()`` absorbs first-compile cost per process; the persistent
compilation cache helps across processes but a fresh process on the
remote-TPU tunnel still pays tens of seconds of tracing + per-program
tunnel round trips (measured 24-120 s for the config-2 Poisson fit even
with a warm cache).  An AOT pack removes that: the WHOLE fit is one
jitted program, compiled once, serialized with
``jax.experimental.serialize_executable``, and a fresh process
deserializes and CALLS it — no tracing, no compile, no tunnel round trip
(measured: toy program fresh-process total 1.5 s; see
``scripts/aot_pack_bench.py`` for the flagship measurement).

The pack is graph-shape-specific (it embeds the degree-segment geometry
of the :class:`ops.gather.GatherAccel` operator) and device-specific
(an XLA executable).  Reference has no equivalent (scipy needs no
compilation; SURVEY.md §5 checkpoint/persistence rows).

.. warning:: SECURITY — packs are pickle files (the serialized
   executable's in/out pytree defs are not JSON-representable).  Loading
   a pack runs ``pickle.load``, which is arbitrary code execution; only
   load packs YOU saved or that come from a trusted source, exactly like
   a ``torch.load`` checkpoint."""

from __future__ import annotations

import functools
import pickle

import numpy as np
import jax
import jax.numpy as jnp

from graphlearning_tpu.ops.gather import (GatherAccel, _eig_norm_g,
                                          _laplace_constrained_g, _spmm_of)


@functools.partial(jax.jit, static_argnames=("segs", "prec", "max_iter"))
def _poisson_fit_g(cols, vals, order, inv, b, tol, *, segs, prec,
                   max_iter=10**5):
    """End-to-end Poisson-learning solve (reference ssl.py:624-629) as
    ONE program over the segmented-gather operator: permute source,
    normalized-Laplacian CG, kernel projection, un-permute."""
    from graphlearning_tpu.solvers import cg as _cg

    spmm = _spmm_of(cols, vals, segs, prec)
    deg_p = jnp.concatenate([jnp.sum(v, axis=1) for v in vals])
    s = jnp.where(deg_p > 0,
                  jnp.where(deg_p == 0, 1.0, deg_p) ** -0.5, 0.0)
    b_p = jnp.take(b, order, axis=0)

    def A(X):
        return X - s[:, None] * spmm(s[:, None] * X)

    v, _, _ = _cg.conjgrad(A, s[:, None] * b_p, tol=tol, max_iter=max_iter)
    # project out the D^{1/2} 1 kernel (ssl._project_out_nlap_kernel)
    q = jnp.sqrt(jnp.maximum(deg_p, 0.0)).astype(v.dtype)
    v = v - q[:, None] * ((q @ v) / jnp.sum(q * q))[None, :]
    return jnp.take(s[:, None] * v, inv, axis=0)


def save_poisson_pack(W, num_classes: int, path: str, tol: float = 1e-3):
    """Compile the Poisson fit for ``W``'s shapes + ``num_classes`` and
    serialize the executable to ``path``.  Run this once per
    graph-geometry (e.g. right after building the kNN graph, before
    labels exist — the pack is label-independent)."""
    from jax.experimental import serialize_executable as se

    acc = GatherAccel(_nodiag(W), prec="f32")
    n = acc.n
    b0 = jnp.zeros((n, int(num_classes)), jnp.float32)
    statics = dict(segs=acc._segs, prec=acc.prec)
    lowered = _poisson_fit_g.lower(
        acc.cols, acc.vals, acc._order_dev, acc._inv_dev, b0,
        jnp.float32(tol), **statics)
    blob = se.serialize(lowered.compile())
    with open(path, "wb") as fh:
        pickle.dump({"kind": "poisson", "blob": blob, "n": n,
                     "num_classes": int(num_classes), "tol": float(tol),
                     "segs": acc._segs, "prec": acc.prec,
                     "nnz": acc.nnz}, fh)
    return path


def _robust_exec(comp, jit_call):
    """Wrap a deserialized executable with a jit-recompile fallback.

    XLA:CPU's thunk-runtime AOT deserializer intermittently drops fusion
    thunks for some program/shape combinations — the loaded executable
    then fails at result fetch with ``NOT_FOUND: Buffer Definition
    Event: Function <fusion> not found`` (measured round 5; process- and
    graph-structure-dependent, upstream bug).  On that specific error
    the wrapper permanently switches to jit-compiling the IDENTICAL
    program (same semantics, pays one trace+compile); every other error
    propagates.  TPU loads are unaffected."""
    state = {"broken": False}

    def call(*args):
        if not state["broken"]:
            try:
                return np.asarray(comp(*args))
            except Exception as e:   # jaxlib runtime error types vary
                if "Buffer Definition Event" not in str(e):
                    raise
                import warnings

                warnings.warn(
                    "XLA:CPU AOT loader produced a corrupt executable "
                    "(upstream thunk-deserialization bug); falling back "
                    "to jit-compiling the pack program")
                state["broken"] = True
        return np.asarray(jit_call(*args))

    return call


def _nodiag(W):
    """Zero-diagonal copy (poisson._fit semantics, reference
    ssl.py:614-617)."""
    import scipy.sparse as sp

    W = sp.csr_matrix(W).copy()
    W.setdiag(0)
    W.eliminate_zeros()
    return W


@functools.partial(jax.jit, static_argnames=("segs", "prec",
                                             "normalization", "order",
                                             "max_iter"))
def _laplace_fit_aot(cols, vals, order_dev, inv_dev, deg, diagL, tau,
                     mask, bdy, tol, *, segs, prec, normalization,
                     order, max_iter=10**5):
    """End-to-end Laplace-learning solve (reference ssl.py:1206-1261) as
    ONE program over the segmented-gather operator: permute, masked
    Jacobi-preconditioned CG on ``tau + L^order``, un-permute.  Inputs
    are in ORIGINAL node order; ``mask`` int32 (1 at labels)."""
    take = lambda a: jnp.take(a, order_dev, axis=0)
    u_p = _laplace_constrained_g(
        cols, vals, take(deg), take(diagL), take(tau), take(mask) > 0,
        take(bdy), tol, None, segs=segs, prec=prec,
        normalization=normalization, order=order, max_iter=max_iter)
    return jnp.take(u_p, inv_dev, axis=0)


def save_laplace_pack(W, num_classes: int, path: str, tol: float = 1e-5,
                      normalization: str = "combinatorial", order: int = 1,
                      tau: float = 0.0):
    """Compile the Laplace-learning fit (``gl.ssl.laplace`` semantics,
    no reweighting) for ``W``'s shapes + ``num_classes`` and serialize
    the executable — the config-5b-shaped companion to
    :func:`save_poisson_pack`."""
    from jax.experimental import serialize_executable as se

    acc, args = _laplace_pack_args(W, num_classes, tau, normalization)
    statics = dict(segs=acc._segs, prec=acc.prec,
                   normalization=normalization, order=int(order))
    lowered = _laplace_fit_aot.lower(*args, jnp.float32(tol), **statics)
    blob = se.serialize(lowered.compile())
    with open(path, "wb") as fh:
        pickle.dump({"kind": "laplace", "blob": blob, "n": acc.n,
                     "num_classes": int(num_classes), "tol": float(tol),
                     "segs": acc._segs, "prec": acc.prec,
                     "normalization": normalization, "order": int(order),
                     "tau": float(tau), "nnz": acc.nnz}, fh)
    return path


def _laplace_pack_args(W, num_classes, tau, normalization):
    """(acc, positional args with a zero mask/bdy) for the laplace AOT
    program — shared by save (lowering) and load (warm dispatch)."""
    import scipy.sparse as sp

    Wc = sp.csr_matrix(W)
    acc = GatherAccel(Wc, prec="f32")
    n = acc.n
    deg = np.asarray(Wc.sum(1)).ravel().astype(np.float32)
    dW = np.asarray(Wc.diagonal()).ravel().astype(np.float32)
    # diag(L) per normalization — SAME formula (incl. the isolated-node
    # guard) as ops.graphops.laplacian_diag so pack and model paths agree
    if normalization == "combinatorial":
        diagL = deg - dW
    else:  # randomwalk / normalized; degree-0 rows are identity rows
        diagL = np.where(deg > 0, 1.0 - dW / np.maximum(deg, 1e-30), 1.0)
    args = (acc.cols, acc.vals, acc._order_dev, acc._inv_dev,
            jnp.asarray(deg), jnp.asarray(diagL.astype(np.float32)),
            jnp.full((n,), np.float32(tau)),
            jnp.zeros((n,), jnp.int32),
            jnp.zeros((n, int(num_classes)), jnp.float32))
    return acc, args


def load_laplace_pack(W, path: str, warm: bool = True):
    """Load a pack saved by :func:`save_laplace_pack` for the SAME graph
    geometry; returns ``fit_predict(train_ind, train_labels)`` running
    the deserialized executable (no tracing, no compile)."""
    from jax.experimental import serialize_executable as se

    with open(path, "rb") as fh:
        meta = pickle.load(fh)
    if meta.get("kind") != "laplace":
        raise ValueError(f"not a laplace pack: {meta.get('kind')}")
    acc, args = _laplace_pack_args(W, meta["num_classes"], meta["tau"],
                                   meta["normalization"])
    if tuple(acc._segs) != tuple(meta["segs"]) or acc.n != meta["n"]:
        raise ValueError(
            "AOT pack graph geometry mismatch: the pack was built for a "
            f"graph with segments {meta['segs']} (n={meta['n']}); this "
            f"graph has {acc._segs} (n={acc.n})")
    comp = se.deserialize_and_load(*meta["blob"],
                                   execution_devices=jax.devices()[:1])
    call = _robust_exec(comp, lambda *a: _laplace_fit_aot(
        *a, segs=tuple(meta["segs"]), prec=meta["prec"],
        normalization=meta["normalization"], order=int(meta["order"])))
    n, C = meta["n"], meta["num_classes"]
    if warm:
        comp(*args, jnp.float32(meta["tol"]))

    def fit_predict(train_ind, train_labels):
        train_ind = np.asarray(train_ind)
        train_labels = np.asarray(train_labels)
        classes = np.unique(train_labels)
        if len(classes) != C:
            raise ValueError(f"pack was built for {C} classes, "
                             f"got {len(classes)}")
        mask = np.zeros(n, np.int32)
        mask[train_ind] = 1
        bdy = np.zeros((n, C), np.float32)
        bdy[train_ind] = (train_labels[:, None]
                          == classes[None, :]).astype(np.float32)
        u = call(*args[:7], jnp.asarray(mask), jnp.asarray(bdy),
                 jnp.float32(meta["tol"]))
        return classes[np.argmax(u, axis=1)]

    fit_predict.num_classes = C
    return fit_predict


@functools.partial(jax.jit, static_argnames=("segs", "prec", "power",
                                             "m", "kcl", "n_init",
                                             "km_iter"))
def _spectral_fit_aot(cols, vals, inv_dev, s_p, X0, key, *, segs, prec,
                      power, m, kcl, n_init, km_iter):
    """NgJordanWeiss spectral clustering (reference clustering.py:113-198)
    as ONE program: LOBPCG on the normalized Laplacian through the
    segmented gather, eigenvalue sort, row normalization, multi-restart
    device k-means.  Returns int32 labels in ORIGINAL node order."""
    from graphlearning_tpu.solvers.kmeans import _kmeans_all

    vals_e, U_p = _eig_norm_g(cols, vals, s_p, X0, power=power, m=m,
                              segs=segs, prec=prec)
    order_idx = jnp.argsort(vals_e)
    U = jnp.take(U_p, inv_dev, axis=0)[:, order_idx]
    norms = jnp.sqrt(jnp.sum(U * U, axis=1))
    V = U / jnp.maximum(norms[:, None], 1e-30)
    lab, _ = _kmeans_all(V, key, k=kcl, n_init=n_init, max_iter=km_iter)
    return lab


def save_spectral_pack(W, num_clusters: int, path: str, extra_dim: int = 0,
                       n_init: int = 10, km_iter: int = 50):
    """Compile NgJordanWeiss spectral clustering for ``W``'s shapes and
    serialize the executable (the config-3 program — its LOBPCG was the
    worst tunnel cold-compile observed, 479 s)."""
    from jax.experimental import serialize_executable as se

    acc, args, kw = _spectral_pack_args(W, num_clusters, extra_dim,
                                        n_init, km_iter)
    lowered = _spectral_fit_aot.lower(*args, **kw)
    blob = se.serialize(lowered.compile())
    with open(path, "wb") as fh:
        pickle.dump({"kind": "spectral", "blob": blob, "n": acc.n,
                     "num_clusters": int(num_clusters),
                     "extra_dim": int(extra_dim), "n_init": int(n_init),
                     "km_iter": int(km_iter), "segs": acc._segs,
                     "prec": acc.prec, "nnz": acc.nnz}, fh)
    return path


def _spectral_pack_args(W, num_clusters, extra_dim, n_init, km_iter):
    import scipy.sparse as sp
    from graphlearning_tpu.solvers.eig import _default_power

    Wc = sp.csr_matrix(W)
    acc = GatherAccel(Wc, prec="f32")
    k = int(num_clusters) + int(extra_dim)
    deg = np.asarray(Wc.sum(1)).ravel().astype(np.float32)
    s = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-30)),
                 0.0).astype(np.float32)
    s_p = jnp.take(jnp.asarray(s), acc._order_dev, axis=0)
    # X0/key: the SAME deterministic seeds the model path uses
    # (GatherAccel.eig_normalized PRNGKey(0); kmeans seed 0)
    X0 = jax.random.normal(jax.random.PRNGKey(0), (acc.n, k),
                           dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    args = (acc.cols, acc.vals, acc._inv_dev, s_p, X0, key)
    kw = dict(segs=acc._segs, prec=acc.prec,
              power=_default_power(jnp.float32), m=200,
              kcl=int(num_clusters), n_init=int(n_init),
              km_iter=int(km_iter))
    return acc, args, kw


def load_spectral_pack(W, path: str, warm: bool = True):
    """Load a pack saved by :func:`save_spectral_pack`; returns
    ``fit_predict() -> labels`` running the deserialized executable."""
    from jax.experimental import serialize_executable as se

    with open(path, "rb") as fh:
        meta = pickle.load(fh)
    if meta.get("kind") != "spectral":
        raise ValueError(f"not a spectral pack: {meta.get('kind')}")
    acc, args, kw_ = _spectral_pack_args(
        W, meta["num_clusters"], meta["extra_dim"], meta["n_init"],
        meta["km_iter"])
    if tuple(acc._segs) != tuple(meta["segs"]) or acc.n != meta["n"]:
        raise ValueError(
            "AOT pack graph geometry mismatch: the pack was built for a "
            f"graph with segments {meta['segs']} (n={meta['n']}); this "
            f"graph has {acc._segs} (n={acc.n})")
    comp = se.deserialize_and_load(*meta["blob"],
                                   execution_devices=jax.devices()[:1])
    call = _robust_exec(comp, lambda *a: _spectral_fit_aot(*a, **kw_))
    if warm:
        comp(*args)   # async program/buffer load overlap

    def fit_predict():
        return call(*args)

    fit_predict.num_clusters = meta["num_clusters"]
    return fit_predict


def load_poisson_pack(W, path: str, warm: bool = True):
    """Load a pack saved by :func:`save_poisson_pack` for the SAME graph
    (or any graph with identical degree-segment geometry) and return a
    ``fit_predict(train_ind, train_labels) -> labels`` callable that
    runs the deserialized executable — no tracing, no compilation.

    Measured on the remote-TPU tunnel (config-2 shapes, n=70k,
    scripts/aot_pack_bench.py): fresh-process import-to-first-prediction
    20.4-29.4 s with the pack vs 120-265 s without (trace + per-program
    tunnel compiles, persistent cache warm).  The remaining cost is the
    tunnel's ONE-TIME device program/buffer load (~7-24 s for this
    program — infrastructure, not compilation; deserialize itself is
    4 s and repeat fits are 0.43 s); ``warm=True`` dispatches a
    throwaway zero-source execution asynchronously at load so that load
    overlaps the caller's data/label preparation."""
    from jax.experimental import serialize_executable as se

    with open(path, "rb") as fh:
        meta = pickle.load(fh)
    acc = GatherAccel(_nodiag(W), prec=meta["prec"])
    if tuple(acc._segs) != tuple(meta["segs"]) or acc.n != meta["n"]:
        raise ValueError(
            "AOT pack graph geometry mismatch: the pack was built for a "
            f"graph with segments {meta['segs']} (n={meta['n']}); this "
            f"graph has {acc._segs} (n={acc.n})")
    # single-device executable: pin execution_devices (the default is ALL
    # local devices, which breaks on multi-device/virtual-mesh hosts)
    comp = se.deserialize_and_load(*meta["blob"],
                                   execution_devices=jax.devices()[:1])
    call = _robust_exec(comp, lambda *a: _poisson_fit_g(
        *a, segs=tuple(meta["segs"]), prec=meta["prec"]))
    n, C = meta["n"], meta["num_classes"]
    if warm:
        # async dispatch (NOT blocked on): the device loads the program
        # and graph buffers now, overlapping the caller's host-side prep
        comp(acc.cols, acc.vals, acc._order_dev, acc._inv_dev,
             jnp.zeros((n, C), jnp.float32), jnp.float32(meta["tol"]))

    def fit_predict(train_ind, train_labels):
        train_ind = np.asarray(train_ind)
        train_labels = np.asarray(train_labels)
        classes = np.unique(train_labels)
        if len(classes) != C:
            raise ValueError(f"pack was built for {C} classes, "
                             f"got {len(classes)}")
        onehot = (train_labels[:, None] == classes[None, :]).astype(
            np.float32)
        b = np.zeros((n, C), np.float32)
        b[train_ind] = onehot - onehot.mean(0)
        u = call(acc.cols, acc.vals, acc._order_dev, acc._inv_dev,
                 jnp.asarray(b), jnp.float32(meta["tol"]))
        return classes[np.argmax(u, axis=1)]

    fit_predict.num_classes = C
    return fit_predict
