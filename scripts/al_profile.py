"""Itemized per-`update` cost profile for the active-learning loop
(round-4 verdict item 5): where does the fixed overhead that eats the
warm-start iteration savings go?

Stages measured at the config-2 scale (n=70k k=10 laplace/poisson):
  up      host->device transfer of the (n,k) bdy/source arrays (tunnel)
  solve   the jitted CG itself, device args already resident (cold=2nd)
  down    device->host fetch of the (n,k) solution u
  fit     the whole model.fit (includes all of the above + host prep)
  select  select_queries (acq compute on host u)

Usage: N=70000 python scripts/al_profile.py
"""
import os
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import graphlearning_tpu as gl
from graphlearning_tpu import active_learning as al


def t(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


n = int(os.environ.get("N", 70000))
cache = f"/tmp/calib_graph_n{n}_k10_d30.npz"
if os.path.exists(cache):
    W = sp.load_npz(cache)
else:
    rs = np.random.RandomState(0)
    centers = rs.randn(10, 30) * 1.0
    labels0 = rs.randint(0, 10, n)
    pts = (centers[labels0] + rs.randn(n, 30)).astype(np.float32)
    W = gl.weightmatrix.knn(pts, 10).tocsr()
    sp.save_npz(cache, W)
W = sp.csr_matrix(W)
rs = np.random.RandomState(0)
centers = rs.randn(10, 30) * 1.0
labels = rs.randint(0, 10, n)
train_ind = gl.trainsets.generate(labels, rate=3, seed=0)

k = 10
print(f"n={n} k=10 backend={jax.default_backend()}", flush=True)

# raw tunnel transfer costs at the fit's array shapes
b = np.zeros((n, k), np.float32)
dt_up, bd = t(lambda: jax.block_until_ready(jnp.asarray(b)))
dt_up2, bd2 = t(lambda: jax.block_until_ready(jnp.asarray(b + 1)))
dt_down, _ = t(lambda: np.asarray(bd2))
print(f"transfer: up {dt_up:.3f}/{dt_up2:.3f}s  down {dt_down:.3f}s "
      f"({n * k * 4 / 1e6:.1f} MB each way)", flush=True)

for name, mk in (("laplace", lambda: gl.ssl.laplace(W, tol=1e-8)),
                 ("poisson", lambda: gl.ssl.poisson(W, tol=1e-8))):
    for warm in (False, True):
        m = mk()
        learner = al.active_learner(m, al.unc_sampling(), train_ind,
                                    labels[train_ind], warm_start=warm)
        q = learner.select_queries(batch_size=1)
        learner.update(q, labels[q])          # absorb compiles
        fits, sels = [], []
        for _ in range(5):
            dt_s, q = t(lambda: learner.select_queries(batch_size=1))
            sels.append(dt_s)
            dt_f, _ = t(lambda: learner.update(q, labels[q]))
            fits.append(dt_f)
        print(f"{name:8s} warm={int(warm)}: update med {np.median(fits):.3f}s"
              f" min {min(fits):.3f}s | select med {np.median(sels):.3f}s",
              flush=True)
