"""Graph construction — TPU-native re-expression of reference
``graphlearning/weightmatrix.py``.

The reference's nearest-neighbor search is a per-point Python loop over an
annoy index (``weightmatrix.py:361-407``).  Here kNN search runs **on
device** as chunked all-pairs distance matmuls (MXU) + ``lax.top_k``
(SURVEY.md §7.1 item 4), with a scipy cKDTree host path for low dimensions.
Kernel weight computation (gaussian / self-tuning bandwidth,
``weightmatrix.py:139-164``) is a fused elementwise epilogue on the same
device arrays — the SDDMM of BASELINE.json.

Public API (knn / epsilon_ball / grid_graph / knnsearch / load_knn_data)
returns scipy matrices for reference parity; the TPU-native fast path
:func:`knn_graph` returns a device :class:`SparseGraph` directly.
"""

from __future__ import annotations

import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sparse

from graphlearning_tpu import config, utils
from graphlearning_tpu.core.sparse import SparseGraph

knn_dir = os.path.abspath(os.path.join(os.getcwd(), "knn_data"))


# -- on-device brute-force kNN -------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "similarity"))
def _chunk_topk(Q, X, Xsq, k: int, similarity: str):
    """Top-k nearest of each query row in Q against all of X (one chunk)."""
    if similarity in ("euclidean", "angular"):
        Qsq = jnp.sum(Q * Q, axis=1)
        d2 = Qsq[:, None] - 2.0 * Q @ X.T + Xsq[None, :]
        score, idx = jax.lax.top_k(-d2, k)
        dist = jnp.sqrt(jnp.maximum(-score, 0.0))
    elif similarity == "dot":
        s = Q @ X.T
        score, idx = jax.lax.top_k(s, k)
        dist = -score  # annoy 'dot' convention: distance = -(u.v)
    elif similarity == "hamming":
        # 0/1 data: unequal-bit count = |q|_1 + |x|_1 - 2 q.x  (MXU-friendly)
        q1 = jnp.sum(Q, axis=1)
        x1 = jnp.sum(X, axis=1)
        d = q1[:, None] + x1[None, :] - 2.0 * Q @ X.T
        score, idx = jax.lax.top_k(-d, k)
        dist = -score
    elif similarity == "manhattan":
        d = jnp.sum(jnp.abs(Q[:, None, :] - X[None, :, :]), axis=2)
        score, idx = jax.lax.top_k(-d, k)
        dist = -score
    else:
        raise ValueError(f"invalid similarity {similarity}")
    return idx, dist


def _brute_knn_device(X, k, similarity="euclidean", chunk_size=2048):
    """Chunked all-pairs kNN on device.  Returns (ind, dist) numpy arrays
    of shape (n, k), self included first (reference knnsearch contract)."""
    dtype = np.float64 if config.float_dtype() == jnp.float64 else np.float32
    Xn = np.asarray(X, dtype=dtype)
    if similarity == "angular":
        Xn = Xn / np.maximum(np.linalg.norm(Xn, axis=1, keepdims=True), 1e-30)
    n = Xn.shape[0]
    k = min(k, n)
    Xd = jnp.asarray(Xn)
    Xsq = jnp.sum(Xd * Xd, axis=1)
    # manhattan materialises (chunk, n, d); keep its chunks small
    if similarity == "manhattan":
        chunk_size = max(1, min(chunk_size, (1 << 24) // max(1, n * Xn.shape[1])))
    # keep per-chunk results ON DEVICE and fetch once at the end: a
    # per-chunk np.asarray would synchronize every chunk (35 round trips
    # at n=70k — measured 17s of a 18s search on a tunneled runtime)
    # pad the query set to a chunk multiple: every chunk then has the same
    # shape, so the search compiles exactly once
    n_pad = ((n + chunk_size - 1) // chunk_size) * chunk_size
    Qall = jnp.pad(Xd, ((0, n_pad - n), (0, 0))) if n_pad != n else Xd
    inds, dists = [], []
    for s in range(0, n_pad, chunk_size):
        Q = Qall[s : s + chunk_size]
        idx, dist = _chunk_topk(Q, Xd, Xsq, k, similarity)
        inds.append(idx)
        dists.append(dist)
    return (np.asarray(jnp.concatenate(inds))[:n],
            np.asarray(jnp.concatenate(dists))[:n])


def _ivf_knn_device(X, k, num_clusters=None, num_probe=16, kmeans_iters=10,
                    seed=0):
    """Approximate kNN via inverted-file (IVF) search, all on device —
    the TPU-native replacement for the reference's annoy ANN path
    (``weightmatrix.py:361-407``): tree traversal is pointer-chasing; IVF is
    matmul + top_k with fixed shapes.

    1. coarse k-means (chunked MXU assign + segment-sum update, fixed
       iteration count);
    2. queries grouped by home cluster — every query in cluster c scans the
       members of c's ``num_probe`` nearest clusters (fixed-size padded
       member tables, so the whole search is one vmapped program);
    3. exact distances to all candidates, top_k re-rank.

    Returns (ind, dist) with self included, like the brute path.  Recall
    depends on num_probe (≈1.0 at 8-16 probes for kNN-graph workloads).
    """
    dtype = np.float64 if config.float_dtype() == jnp.float64 else np.float32
    Xn = np.asarray(X, dtype=dtype)
    n, d = Xn.shape
    k = min(k, n)
    # ~64 points per cluster: probing p clusters then scans ~64p exact
    # candidates per query — high recall at a small fraction of brute cost
    C = int(num_clusters or max(8, min(4096, n // 64)))
    C = min(C, n)
    p = int(min(num_probe, C))
    Xd = jnp.asarray(Xn)
    Xsq = jnp.sum(Xd * Xd, axis=1)

    # -- coarse k-means (device) -------------------------------------------
    rs = np.random.RandomState(seed)
    cent = Xd[jnp.asarray(rs.choice(n, C, replace=False))]

    @jax.jit
    def assign(cent):
        d2 = (Xsq[:, None] - 2.0 * Xd @ cent.T
              + jnp.sum(cent * cent, axis=1)[None, :])
        return jnp.argmin(d2, axis=1)

    @jax.jit
    def update(cent, a):
        sums = jax.ops.segment_sum(Xd, a, num_segments=C)
        cnts = jax.ops.segment_sum(jnp.ones((n,), Xd.dtype), a,
                                   num_segments=C)
        return jnp.where(cnts[:, None] > 0, sums / jnp.maximum(cnts, 1.0)[:, None],
                         cent)

    for _ in range(kmeans_iters):
        cent = update(cent, assign(cent))
    a = np.asarray(assign(cent))

    # -- fixed-shape member tables (host, one-time) ------------------------
    counts = np.bincount(a, minlength=C)
    M = int(counts.max())
    members = np.full((C, M), -1, np.int32)
    slot = np.zeros(C, np.int64)
    order = np.argsort(a, kind="stable")
    for i in order:
        c = a[i]
        members[c, slot[c]] = i
        slot[c] += 1

    # probe lists: p nearest clusters of each cluster (by centroid distance)
    cent_np = np.asarray(cent)
    cd2 = ((cent_np[:, None, :] - cent_np[None, :, :]) ** 2).sum(-1)
    probes = np.argsort(cd2, axis=1)[:, :p].astype(np.int32)     # (C, p)

    members_j = jnp.asarray(members)
    probes_j = jnp.asarray(probes)

    # -- per-cluster search (vmapped, fixed shapes) -------------------------
    def search_cluster(c):
        q_idx = members_j[c]                                   # (M,) pad -1
        cand = members_j[probes_j[c]].reshape(-1)              # (p*M,) pad -1
        cand_valid = cand >= 0
        cand_c = jnp.where(cand_valid, cand, 0)
        Q = Xd[jnp.where(q_idx >= 0, q_idx, 0)]                # (M, d)
        Cd = Xd[cand_c]                                        # (pM, d)
        d2 = (jnp.sum(Q * Q, 1)[:, None] - 2.0 * Q @ Cd.T
              + jnp.sum(Cd * Cd, 1)[None, :])
        d2 = jnp.where(cand_valid[None, :], d2, jnp.inf)
        score, local = jax.lax.top_k(-d2, k)
        return q_idx, cand_c[local], jnp.sqrt(jnp.maximum(-score, 0.0))

    ind_out = np.zeros((n, k), np.int64)
    dist_out = np.zeros((n, k), dtype)
    # batch clusters through vmap in groups to bound memory
    G = max(1, int((1 << 27) // max(1, M * p * M * 4)))
    searcher = jax.jit(jax.vmap(search_cluster))
    for s in range(0, C, G):
        cs = jnp.arange(s, min(s + G, C))
        q_idx, idx, dist = searcher(cs)
        q_idx = np.asarray(q_idx)
        valid = q_idx >= 0
        ind_out[q_idx[valid]] = np.asarray(idx)[valid]
        dist_out[q_idx[valid]] = np.asarray(dist)[valid]
    return ind_out, dist_out


def knnsearch(X, k, method=None, similarity="euclidean", dataset=None, metric="raw"):
    """kNN search (reference ``weightmatrix.py:295-427``).

    method: 'kdtree' (host cKDTree, default for dim<=5), 'brute' (device
    all-pairs matmul + top_k — the TPU path, default for dim>5), 'ivf'
    (device approximate inverted-file search — the ANN path for large n),
    'annoy' (accepted for compatibility; routed to 'ivf', the TPU-native
    approximate search replacing the reference's annoy trees)."""
    X = np.asarray(X)
    n, m = X.shape
    k = min(k, n)
    if method is None:
        method = "kdtree" if m <= 5 else "brute"
    if method == "annoy":
        method = "ivf"

    if method == "ivf":
        if similarity == "angular":
            X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        elif similarity != "euclidean":
            sys.exit("ivf knnsearch supports euclidean/angular similarity")
        knn_ind, knn_dist = _ivf_knn_device(X, k)
    elif method == "kdtree":
        from scipy import spatial

        if similarity not in ("euclidean", "angular"):
            sys.exit("Invalid choice of similarity " + similarity)
        Y = X
        if similarity == "angular":
            Y = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        tree = spatial.cKDTree(Y)
        knn_dist, knn_ind = tree.query(Y, k=k)
        if k == 1:
            knn_dist = knn_dist[:, None]
            knn_ind = knn_ind[:, None]
    elif method == "brute":
        knn_ind, knn_dist = _brute_knn_device(X, k, similarity=similarity)
    else:
        sys.exit("Invalid choice of knnsearch method " + method)

    if dataset is not None:
        dataFile = dataset.lower() + "_" + metric.lower() + ".npz"
        os.makedirs(knn_dir, exist_ok=True)
        np.savez_compressed(
            os.path.join(knn_dir, dataFile), J=knn_ind, D=knn_dist
        )
    return knn_ind, knn_dist


def load_knn_data(dataset, metric="raw"):
    """Load cached kNN data npz (format-compatible with the reference's
    ``kNNData/*.npz``: fields J, D; ``weightmatrix.py:429-465``)."""
    dataFile = dataset.lower() + "_" + metric.lower() + ".npz"
    path = os.path.join(knn_dir, dataFile)
    if not os.path.exists(path):
        url = (
            "https://github.com/jwcalder/GraphLearning/raw/master/kNNData/"
            + dataFile
        )
        os.makedirs(knn_dir, exist_ok=True)
        utils.download_file(url, path)
    knn_ind = utils.numpy_load(path, "J")
    knn_dist = utils.numpy_load(path, "D")
    return knn_ind, knn_dist


# -- kernel weights (device, fused) --------------------------------------


@functools.partial(jax.jit, static_argnames=("kernel",))
def _knn_weights_device(knn_ind, knn_dist, kernel: str):
    """Self-tuning kernel weights from kNN distances
    (reference ``weightmatrix.py:139-164``)."""
    k = knn_dist.shape[1]
    if kernel == "uniform":
        return jnp.ones_like(knn_dist)
    if kernel == "gaussian":
        D = knn_dist * knn_dist
        eps = D[:, k - 1]
        return jnp.exp(-4.0 * D / jnp.maximum(eps[:, None], 1e-30))
    if kernel == "symgaussian":
        eps = knn_dist[:, k - 1]
        return jnp.exp(
            -4.0 * knn_dist * knn_dist
            / jnp.maximum(eps[:, None] * eps[knn_ind], 1e-30)
        )
    if kernel == "distance":
        return knn_dist
    if kernel == "singular":
        w = jnp.where(knn_dist == 0, 1.0, knn_dist)
        return 1.0 / w
    raise ValueError("Invalid choice of kernel: " + kernel)


def knn(data, k, kernel="gaussian", eta=None, symmetrize=True, metric="raw",
        similarity="euclidean", knn_data=None):
    """kNN weight matrix (reference ``weightmatrix.py:68-186``); returns a
    scipy CSR matrix for API parity.  Symmetrization rules per kernel match
    the reference (``weightmatrix.py:177-185``)."""
    k = k + 1  # self counted in knn data
    if knn_data is not None:
        knn_ind, knn_dist = knn_data
    elif isinstance(data, str):
        knn_ind, knn_dist = load_knn_data(data, metric=metric)
    else:
        knn_ind, knn_dist = knnsearch(data, k, similarity=similarity)

    n = knn_ind.shape[0]
    k = min(knn_ind.shape[1], k)
    knn_ind = np.asarray(knn_ind)[:, :k]
    knn_dist = np.asarray(knn_dist)[:, :k]

    if eta is None:
        weights = np.asarray(
            _knn_weights_device(jnp.asarray(knn_ind), jnp.asarray(knn_dist, dtype=config.float_dtype()), kernel)
        )
    else:
        D = knn_dist * knn_dist
        eps = D[:, k - 1]
        weights = eta(D / np.maximum(eps[:, None], 1e-30))

    self_ind = np.repeat(np.arange(n), k)
    W = sparse.coo_matrix(
        (weights.flatten(), (self_ind, knn_ind.flatten())), shape=(n, n)
    ).tocsr()

    if symmetrize:
        if kernel in ("distance", "uniform", "singular"):
            W = utils.sparse_max(W, W.T.tocsr())
        elif kernel == "symgaussian":
            WT = W.T.tocsr()
            W = W + WT.multiply(WT > W) - W.multiply(WT > W)
        else:
            W = (W + W.T) / 2
    W = sparse.csr_matrix(W)
    W.setdiag(0)
    W.eliminate_zeros()
    if not isinstance(data, str) and np.ndim(data) == 2 \
            and np.shape(data)[1] <= 3:
        # low-dimensional point coordinates enable the Hilbert-curve
        # ordering candidate in ops.accel.AccelSpMM (measured 1.46x SpMM
        # throughput over RCM on 2-D kNN graphs, round-4 item 6)
        try:
            W._glt_points = np.asarray(data)
        except Exception:    # pragma: no cover
            pass
    return W


def knn_graph(data, k, kernel="gaussian", similarity="euclidean", symmetrize=True,
              dtype=None):
    """TPU-native fast path: data → device kNN → kernel weights →
    :class:`SparseGraph`, avoiding the scipy round-trip when possible."""
    W = knn(data, k, kernel=kernel, similarity=similarity, symmetrize=symmetrize)
    return SparseGraph.from_scipy(W, dtype=dtype)


# -- epsilon-ball & grid graphs ------------------------------------------


def _ball_weights(dists2, epsilon, kernel, eta):
    if eta is None:
        if kernel == "uniform":
            return np.ones_like(dists2), 1.0
        if kernel == "gaussian":
            return np.exp(-4 * dists2 / (epsilon * epsilon)), 1.0
        if kernel == "distance":
            return np.sqrt(dists2), 0.0
        if kernel == "singular":
            w = np.sqrt(dists2)
            w[dists2 == 0] = 1
            return 1 / w, 1.0
        sys.exit("Invalid choice of kernel: " + kernel)
    return eta(dists2 / (epsilon * epsilon)), eta(0)


def epsilon_ball(data, epsilon, kernel="gaussian", features=None, epsilon_f=1, eta=None):
    """Epsilon-ball weight matrix via cKDTree pair query
    (reference ``weightmatrix.py:188-264``)."""
    from scipy import spatial

    data = np.asarray(data)
    n = data.shape[0]
    tree = spatial.cKDTree(data)
    M = np.array(list(tree.query_pairs(epsilon)))
    if len(M) == 0:
        return sparse.csr_matrix((n, n))
    V = data[M[:, 0], :] - data[M[:, 1], :]
    dists2 = np.sum(V * V, axis=1)
    weights, fzero = _ball_weights(dists2, epsilon, kernel, eta)
    if features is not None:
        VF = features[M[:, 0], :] - features[M[:, 1], :]
        fw, _ = _ball_weights(np.sum(VF * VF, axis=1), epsilon_f, kernel, eta)
        weights = weights * fw
        fzero = fzero**2
    weights = np.concatenate((weights, weights, fzero * np.ones(n)))
    M1 = np.concatenate((M[:, 0], M[:, 1], np.arange(n)))
    M2 = np.concatenate((M[:, 1], M[:, 0], np.arange(n)))
    W = sparse.coo_matrix((weights, (M1, M2)), shape=(n, n))
    W = sparse.csr_matrix(W)
    W.setdiag(0)
    W.eliminate_zeros()
    if data.ndim == 2 and data.shape[1] <= 3:
        # coordinates enable the curve-ordering candidate (see knn)
        try:
            W._glt_points = data
        except Exception:    # pragma: no cover
            pass
    return W


def grid_graph(n, m=None, return_xy=False):
    """4-neighbor grid graph (reference ``weightmatrix.py:19-66``)."""
    if m is None:
        s = np.asarray(n).shape
        m, n = s[1], s[0]
    xm, ym = np.meshgrid(np.arange(m), np.arange(n))
    c = (xm + m * ym).flatten()
    nbrs = [
        (np.clip(xm + 1, 0, m - 1) + m * ym).flatten(),
        (np.clip(xm - 1, 0, m - 1) + m * ym).flatten(),
        (xm + m * np.clip(ym + 1, 0, n - 1)).flatten(),
        (xm + m * np.clip(ym - 1, 0, n - 1)).flatten(),
    ]
    edges = np.vstack([np.vstack((c, nb)).T for nb in nbrs])
    edges = edges[edges[:, 0] != edges[:, 1]]
    W = sparse.coo_matrix(
        (np.ones(len(edges)), (edges[:, 0], edges[:, 1])), shape=(m * n, m * n)
    ).tocsr()
    if return_xy:
        X = np.vstack((xm.flatten(), ym.flatten())).T.astype(float)
        return W, X
    return W


# -- VAE embedding (reference weightmatrix.py:467-646, torch) -------------
# TPU-native version: a small flax MLP-VAE trained with optax.


def vae(data, layer_widths=(400, 20), no_cuda=False, batch_size=128,
        epochs=100, learning_rate=1e-3, seed=0):
    """Train a 2-layer VAE on raw data and return the latent means, used to
    build ``metric='vae'`` graphs.  Flax/optax on the default JAX device
    (the reference uses torch CUDA, ``weightmatrix.py:620-622``)."""
    import flax.linen as nn
    import optax

    X = np.asarray(data, dtype=np.float32)
    X = X / max(1e-12, X.max())
    n, d = X.shape
    h, z = int(layer_widths[0]), int(layer_widths[1])

    class VAE(nn.Module):
        @nn.compact
        def __call__(self, x, key):
            e = nn.relu(nn.Dense(h)(x))
            mu = nn.Dense(z)(e)
            logvar = nn.Dense(z)(e)
            eps = jax.random.normal(key, mu.shape, dtype=mu.dtype)
            zs = mu + jnp.exp(0.5 * logvar) * eps
            dec = nn.relu(nn.Dense(h)(zs))
            out = nn.sigmoid(nn.Dense(d)(dec))
            return out, mu, logvar

    model = VAE()
    key = jax.random.PRNGKey(seed)
    params = model.init(key, X[:2], key)
    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, xb, key):
        def loss_fn(p):
            out, mu, logvar = model.apply(p, xb, key)
            bce = -jnp.sum(
                xb * jnp.log(out + 1e-8) + (1 - xb) * jnp.log(1 - out + 1e-8)
            )
            kld = -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar))
            return bce + kld

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    steps_per_epoch = max(1, n // batch_size)
    rs = np.random.RandomState(seed)
    for ep in range(epochs):
        perm = rs.permutation(n)
        for i in range(steps_per_epoch):
            xb = jnp.asarray(X[perm[i * batch_size : (i + 1) * batch_size]])
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, xb, sub)

    @jax.jit
    def encode(xb):
        # latent means only (deterministic embedding)
        out, mu, logvar = model.apply(params, xb, jax.random.PRNGKey(0))
        return mu

    mus = [np.asarray(encode(jnp.asarray(X[s : s + 4096]))) for s in range(0, n, 4096)]
    return np.concatenate(mus, axis=0)
