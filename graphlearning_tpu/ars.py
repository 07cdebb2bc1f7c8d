"""Attraction-Repulsion Swarming t-SNE (ARS), TPU-native.

Re-implements the reference's C ARS t-SNE (``c_code/tsne.cpp``,
``c_code/sptree.cpp``; driver ``graph.py:1494-1609``) with a TPU-first
design:

* perplexity calibration = batched bisection over all points at once
  (reference: serial per-point binary search, ``tsne.cpp:489-589``),
* attraction = edge-wise force over the padded-ELL P graph, summed over
  the fixed k axis (reference: CSR edge loop ``sptree.cpp:381-408``),
* repulsion = **exact** chunked all-pairs computation on the MXU
  (reference: Barnes-Hut quadtree ``sptree.cpp:340-378`` — pointer
  chasing, TPU-hostile; at t-SNE scales (n ≤ 1e5) exact all-pairs is
  both faster on TPU and more accurate than BH).

Math (matching ``tsne.cpp:271-295``):

  pos_f[i] = sum_j P_ij (y_i - y_j) / (1 + |y_i - y_j|^theta1)
  neg_f[i] = sum_{j != i} q_ij psi_ij (y_i - y_j) / sum_{j != i} q_ij
             with q = 1/(1+D2), psi = 1/(1+D2^(theta2/2))
  dC = alpha * pos_f - neg_f     (early exaggeration; alpha=1 after)
  Y <- Y - dt * dC / alpha       (early;  Y - dt * dC after)
  Y <- Y - mean(Y)
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _calibrate_perplexity(knn_d2, perplexity, num_iter=64):
    """Per-row Gaussian bandwidth bisection: find beta_i with
    H_i(beta) = log(perplexity), H = beta*<d2, p>/sum p + log sum p
    (reference ``tsne.cpp:536-588``).  Vectorized over all rows; fixed
    trip count (TPU-friendly).  Returns row-normalized P of shape (n, K).
    """
    logU = jnp.log(perplexity)
    n = knn_d2.shape[0]
    beta = jnp.ones((n,), knn_d2.dtype)
    lo = jnp.zeros((n,), knn_d2.dtype)
    hi = jnp.full((n,), jnp.inf, knn_d2.dtype)

    def H_of(beta):
        P = jnp.exp(-beta[:, None] * knn_d2)
        sumP = jnp.maximum(P.sum(1), 1e-35)
        H = beta * (knn_d2 * P).sum(1) / sumP + jnp.log(sumP)
        return H, P, sumP

    def body(_, st):
        beta, lo, hi = st
        H, _, _ = H_of(beta)
        too_high = H > logU          # entropy too high -> increase beta
        lo = jnp.where(too_high, beta, lo)
        hi = jnp.where(too_high, hi, beta)
        beta = jnp.where(jnp.isinf(hi), beta * 2.0, (lo + hi) / 2.0)
        return beta, lo, hi

    beta, _, _ = jax.lax.fori_loop(0, num_iter, body, (beta, lo, hi))
    _, P, sumP = H_of(beta)
    return P / sumP[:, None]


def _build_P(X, perplexity):
    """kNN (K = 3*perplexity) -> calibrated similarities -> symmetrize
    P + P^T -> row-normalize, returned as padded-ELL (cols, vals).
    (reference ``tsne.cpp:138-156,589-660``)."""
    import scipy.sparse as sp
    from graphlearning_tpu import weightmatrix

    n = X.shape[0]
    K = min(int(3 * perplexity), n - 1)
    knn_ind, knn_dist = weightmatrix.knnsearch(X, K + 1)
    knn_ind, knn_dist = knn_ind[:, 1:], knn_dist[:, 1:]   # drop self
    P = _calibrate_perplexity(jnp.asarray(knn_dist**2), perplexity)
    P = np.asarray(P, dtype=np.float64)
    rows = np.repeat(np.arange(n), K)
    Psp = sp.coo_matrix((P.ravel(), (rows, knn_ind.ravel())),
                        shape=(n, n)).tocsr()
    Psp = Psp + Psp.T                      # symmetrize (sum; row-norm next)
    rowsum = np.maximum(np.asarray(Psp.sum(1)).ravel(), 1e-35)
    Psp = sp.diags(1.0 / rowsum) @ Psp

    from graphlearning_tpu.core.sparse import SparseGraph
    return SparseGraph.from_scipy(Psp, dtype=jnp.float32)


def _pow_static(x, e: float):
    """``x ** e`` with fast exact forms for the common static exponents
    (theta1=2 -> e=1, theta2=3 -> e=1.5 in the reference ARS kernels,
    sptree.cpp:366,400): a general float pow lowers to exp/log on the VPU
    and dominates the all-pairs repulsion."""
    if e == 1.0:
        return x
    if e == 0.5:
        return jnp.sqrt(x)
    if e == 1.5:
        return x * jnp.sqrt(x)
    if e == 2.0:
        return x * x
    if float(e).is_integer() and 0 < e <= 8:
        return x ** int(e)
    return jnp.power(x, e)


@functools.partial(jax.jit, static_argnames=("theta1", "theta2", "chunk"))
def _ars_forces(Y, cols, vals, valid, theta1: float, theta2: float,
                chunk: int):
    """One gradient evaluation: (pos_f, neg_f)."""
    n, dim = Y.shape

    # attraction over the ELL P graph: gather neighbor positions,
    # per-edge kernel, reduce over the fixed k axis
    Yj = jnp.take(Y, cols, axis=0)                   # (n, k, dim)
    diff = Y[:, None, :] - Yj
    D2 = jnp.sum(diff * diff, axis=2)
    coef = vals / (1.0 + _pow_static(jnp.maximum(D2, 1e-35), theta1 / 2.0))
    pos_f = jnp.sum(coef[:, :, None] * diff, axis=1)

    # exact all-pairs repulsion, chunked over rows (MXU for the Gram part)
    ysq = jnp.sum(Y * Y, axis=1)
    ids = jnp.arange(n)

    def one_chunk(c):
        Yc = jax.lax.dynamic_slice(Y, (c * chunk, 0), (chunk, dim))
        idc = jax.lax.dynamic_slice(ids, (c * chunk,), (chunk,))
        D2c = (jnp.sum(Yc * Yc, 1)[:, None] + ysq[None, :]
               - 2.0 * Yc @ Y.T)                      # (chunk, n)
        D2c = jnp.maximum(D2c, 0.0)
        offdiag = (idc[:, None] != ids[None, :]) & valid[None, :]
        q = jnp.where(offdiag, 1.0 / (1.0 + D2c), 0.0)
        psi = 1.0 / (1.0 + _pow_static(jnp.maximum(D2c, 1e-35), theta2 / 2.0))
        qpsi = q * psi
        # sum_j q psi (y_i - y_j) = y_i * sum_j qpsi - qpsi @ Y
        num = Yc * jnp.sum(qpsi, 1)[:, None] - qpsi @ Y
        den = jnp.maximum(jnp.sum(q, 1), 1e-35)
        return num / den[:, None]

    neg_f = jax.lax.map(one_chunk, jnp.arange(n // chunk))
    return pos_f, neg_f.reshape(n, dim)


@functools.partial(
    jax.jit,
    static_argnames=("iters", "num_early", "theta1", "theta2", "chunk"))
def _ars_iterate(Y, cols, vals, valid, *, iters: int, num_early: int,
                 time_step: float, theta1: float, theta2: float,
                 alpha: float, chunk: int):
    nvalid = jnp.maximum(jnp.sum(valid.astype(Y.dtype)), 1.0)

    def step(it, Y):
        pos_f, neg_f = _ars_forces(Y, cols, vals, valid, theta1, theta2,
                                   chunk)
        early = it < num_early
        a = jnp.where(early, alpha, 1.0)
        dC = a * pos_f - neg_f
        scale = jnp.where(early, time_step / alpha, time_step)
        Y = Y - scale * dC
        Y = jnp.where(valid[:, None], Y, 0.0)
        mean = jnp.sum(Y, axis=0) / nvalid            # zero-mean (valid rows)
        return jnp.where(valid[:, None], Y - mean[None, :], 0.0)

    return jax.lax.fori_loop(0, iters, step, Y)


def ars(X, dim=2, perplexity=30, kappa=0.5, iters=1000, time_step=1,
        theta1=2, theta2=3, alpha=10, num_early=250, use_pca=True,
        init_dim=200, init="pca", prog=False, dump=False, chunk=1024):
    """Attraction-Repulsion Swarming t-SNE embedding (Lu-Calder).

    API-parity with reference ``graph.ars`` (``graph.py:1494-1609``);
    ``kappa`` (the Barnes-Hut opening angle) is accepted but unused —
    the TPU path computes the repulsion exactly.  ``dump`` writes
    ``ars_<i>.npy`` snapshots every 50 iterations (reference dumps
    ``ars_%d.bin`` every iteration, ``tsne.cpp:180-189``).
    """
    X = np.asarray(X, dtype=np.float64)
    n = X.shape[0]

    if use_pca and X.shape[1] > init_dim:
        Xc = X - X.mean(0)
        import scipy.sparse.linalg as spla
        _, Q = spla.eigsh(Xc.T @ Xc, k=init_dim, which="LM")
        X = Xc @ Q

    # reference preprocessing: zero mean, scale by max abs (tsne.cpp:100-105)
    X = X - X.mean(0)
    X = X / np.maximum(np.abs(X).max(), 1e-35)

    if isinstance(init, np.ndarray):
        Y0 = np.array(init, dtype=np.float64)
    elif init == "pca":
        Xc = X - X.mean(0)
        U, S, _ = np.linalg.svd(Xc, full_matrices=False)
        Y0 = U[:, :dim] * S[:dim]
        Y0 = Y0 / max(np.std(Y0[:, 0]), 1e-35) * 1e-4
    else:
        rs = np.random.RandomState(0)
        Y0 = rs.randn(n, dim) * 1e-4

    P = _build_P(X, perplexity)

    chunk = min(chunk, n)
    n_pad = (-n) % chunk
    valid = np.ones((n + n_pad,), bool)
    valid[n:] = False
    Yp = np.concatenate([Y0, np.zeros((n_pad, dim))]).astype(np.float32)
    cols = jnp.concatenate(
        [P.cols, jnp.arange(n, n + n_pad, dtype=P.cols.dtype)[:, None]
         * jnp.ones((1, P.k), P.cols.dtype)])
    vals = jnp.concatenate([P.vals, jnp.zeros((n_pad, P.k), P.vals.dtype)])
    valid = jnp.asarray(valid)

    if dump or prog:
        # visible progress / snapshots: run in 50-iter segments
        Y = jnp.asarray(Yp)
        done = 0
        seg_id = 0
        while done < iters:
            seg = min(50, iters - done)
            Y = _ars_iterate(
                Y, cols, vals, valid, iters=seg,
                num_early=max(0, min(seg, num_early - done)),
                time_step=float(time_step), theta1=float(theta1),
                theta2=float(theta2), alpha=float(alpha), chunk=chunk)
            done += seg
            if prog:
                print(f"ARS iteration {done}/{iters}", flush=True)
            if dump:
                np.save(f"ars_{seg_id}.npy", np.asarray(Y[:n]))
            seg_id += 1
    else:
        Y = _ars_iterate(
            Y=jnp.asarray(Yp), cols=cols, vals=vals, valid=valid,
            iters=int(iters), num_early=int(num_early),
            time_step=float(time_step), theta1=float(theta1),
            theta2=float(theta2), alpha=float(alpha), chunk=chunk)
    return np.asarray(Y[:n], dtype=np.float64)
