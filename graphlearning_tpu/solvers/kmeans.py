"""Device-resident k-means (Lloyd's algorithm with k-means++ seeding).

Replaces the ``sklearn.cluster.KMeans`` calls of the reference's spectral
clustering (reference ``clustering.py:196``) for embeddings that already
live on device: the whole multi-restart solve is ONE jitted program
(``n_init`` restarts batched with ``vmap``), and only the winning label
vector (int32) crosses the host↔device tunnel instead of the full
``(n, k)`` eigenvector block.

Shapes are static throughout: k-means++ seeding is a ``fori_loop`` over the
``k`` seeds, Lloyd iterations a ``fori_loop`` with a frozen-when-converged
update (fixed trip count keeps a single compiled program across restarts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k", "n_init", "max_iter"))
def _kmeans_all(X, key, k: int, n_init: int, max_iter: int):
    n, d = X.shape
    Xsq = jnp.sum(X * X, axis=1)

    # greedy k-means++ (sklearn's _kmeans_plusplus): L candidates per
    # step, keep the one minimizing the resulting total potential —
    # measurably better basins than plain ++ (digits expQt embedding:
    # mean accuracy 70.8 -> sklearn-parity with greedy)
    L = 2 + int(np.log(max(k, 2)))

    def plus_plus_init(key):
        k0, key = jax.random.split(key)
        first = jax.random.randint(k0, (), 0, n)
        C = jnp.zeros((k, d), X.dtype).at[0].set(X[first])
        d2 = Xsq - 2.0 * (X @ C[0]) + jnp.sum(C[0] * C[0])
        d2 = jnp.maximum(d2, 0.0)

        def body(i, state):
            C, d2, key = state
            kc, key = jax.random.split(key)
            # L samples ∝ d2 via categorical on log d2 (Gumbel-max trick,
            # no normalizing); zero-distance points get -inf logits
            logits = jnp.where(d2 > 0, jnp.log(d2), -jnp.inf)
            idx = jax.random.categorical(kc, logits, shape=(L,))
            Cand = X[idx]                                    # (L, d)
            d2c = jnp.maximum(
                Xsq[None, :] - 2.0 * (Cand @ X.T)
                + jnp.sum(Cand * Cand, axis=1)[:, None], 0.0)  # (L, n)
            pot = jnp.sum(jnp.minimum(d2[None, :], d2c), axis=1)
            best = jnp.argmin(pot)
            C = C.at[i].set(Cand[best])
            d2 = jnp.minimum(d2, d2c[best])
            return C, d2, key

        C, _, _ = jax.lax.fori_loop(1, k, body, (C, d2, key))
        return C

    def lloyd(key):
        C = plus_plus_init(key)

        def assign(C):
            # (n, k) squared distances via one MXU matmul
            D = Xsq[:, None] - 2.0 * (X @ C.T) + jnp.sum(C * C, axis=1)[None, :]
            lab = jnp.argmin(D, axis=1)
            inertia = jnp.sum(jnp.min(D, axis=1))
            return lab, inertia

        def body(i, state):
            C, lab, done = state
            onehot = jax.nn.one_hot(lab, k, dtype=X.dtype)
            counts = jnp.sum(onehot, axis=0)
            sums = onehot.T @ X
            Cnew = jnp.where(counts[:, None] > 0,
                             sums / jnp.maximum(counts, 1.0)[:, None], C)
            new_lab, _ = assign(Cnew)
            moved = jnp.any(new_lab != lab)
            Cn = jnp.where(done, C, Cnew)
            ln = jnp.where(done, lab, new_lab)
            return Cn, ln, done | ~moved

        lab0, _ = assign(C)
        # while_loop (not fori): under vmap this runs to the max over
        # restarts of the CONVERGENCE time, not always max_iter — sklearn
        # runs to tol/convergence the same way
        def cond(state):
            i, C, lab, done = state
            return (i < max_iter) & ~done

        def wbody(state):
            i, C, lab, done = state
            C, lab, done = body(i, (C, lab, done))
            return i + 1, C, lab, done

        _, C, lab, _ = jax.lax.while_loop(
            cond, wbody, (0, C, lab0, jnp.array(False)))
        _, inertia = assign(C)
        return lab.astype(jnp.int32), inertia

    keys = jax.random.split(key, n_init)
    labs, inertias = jax.vmap(lloyd)(keys)
    best = jnp.argmin(inertias)
    return labs[best], inertias[best]


def kmeans(X, k: int, n_init: int = 10, max_iter: int = 300, seed: int = 0):
    """Cluster rows of ``X`` (device or host array) into ``k`` clusters.

    Returns an int32 label array ON DEVICE (callers decide when to pull it
    to host).  Multi-restart best-inertia selection matches sklearn's
    ``KMeans(n_clusters=k, n_init=n_init)`` semantics."""
    X = jnp.asarray(X)
    lab, _ = _kmeans_all(X, jax.random.PRNGKey(seed), k=int(k),
                         n_init=int(n_init), max_iter=int(max_iter))
    return lab
