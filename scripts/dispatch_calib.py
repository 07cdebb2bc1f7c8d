"""Dispatch-policy calibration on the model-benchmark geometry
(30-d Gaussian-mixture kNN, the config-2..5 surrogate family).

Measures, on the real chip, per-SpMM time at solver shapes (d=10) and
bench shape (d=128) for: the current AccelSpMM choice (band family),
GatherSpMM f32/bf16 (degree-sorted segmented gather), and the plain
full-ELL XLA gather.  Output feeds the maybe_build pre-gate thresholds
and the _GATHER_NS constant.
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
from graphlearning_tpu.core.sparse import SparseGraph
from graphlearning_tpu.ops import graphops as ops
from graphlearning_tpu.ops.gather import GatherSpMM

n = int(os.environ.get("N", 70000))
k = int(os.environ.get("K", 10))
dim = int(os.environ.get("DIM", 30))
ITERS = 30

cache = f"/tmp/calib_graph_n{n}_k{k}_d{dim}.npz"
if os.path.exists(cache):
    W = sp.load_npz(cache)
else:
    rs = np.random.RandomState(0)
    centers = rs.randn(10, dim) * 1.0
    labels = rs.randint(0, 10, n)
    pts = (centers[labels] + rs.randn(n, dim)).astype(np.float32)
    W = gl.weightmatrix.knn(pts, k).tocsr()
    sp.save_npz(cache, W)
W = sp.csr_matrix(W)
n = W.shape[0]
nnz = W.nnz
deg = np.diff(W.indptr)
print(f"n={n} nnz={nnz} deg p50={np.percentile(deg,50):.0f} "
      f"p95={np.percentile(deg,95):.0f} max={deg.max()}", flush=True)

# RCM bandwidth profile (the cheap pre-gate input)
from scipy.sparse.csgraph import reverse_cuthill_mckee

t0 = time.time()
perm = np.asarray(reverse_cuthill_mckee(W, symmetric_mode=True))
inv = np.argsort(perm)
I = np.repeat(np.arange(n), deg)
bw = np.abs(inv[I] - inv[W.indices])
t_rcm = time.time() - t0
print(f"RCM {t_rcm:.1f}s bw p50={np.percentile(bw,50):.0f} "
      f"p90={np.percentile(bw,90):.0f} p95={np.percentile(bw,95):.0f} "
      f"(n/4={n//4})", flush=True)

rs = np.random.RandomState(1)


def timed(name, fn, X0, edges=nnz):
    out = fn(X0)
    float(jnp.sum(out.reshape(-1)[:4]))
    Y = X0
    for _ in range(3):
        Y = fn(Y)
    float(jnp.sum(Y.reshape(-1)[:4]))
    t0 = time.perf_counter()
    Y = X0
    for _ in range(ITERS):
        Y = fn(Y)
    float(jnp.sum(Y.reshape(-1)[:4]))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:26s} {dt*1e3:8.3f} ms  {edges/dt/1e6:9.1f} M e/s  "
          f"{dt/edges*1e9:6.2f} ns/edge", flush=True)
    return dt


for d in (10, 128):
    print(f"--- d={d}", flush=True)
    X0 = jnp.asarray(rs.randn(n, d).astype(np.float32))

    # plain full-ELL gather (kmax-padded)
    g = SparseGraph.from_scipy(W, dtype=jnp.float32)
    print(f"full ELL k={g.k} slots={n*g.k}", flush=True)
    _sp = jax.jit(ops.spmm)
    timed(f"full_ell_f32 d={d}", lambda X: _sp(g, X), X0)

    for prec in ("f32", "bf16"):
        gs = GatherSpMM(W, prec=prec)
        slots = sum((e - s) * kc for s, e, kc in gs.segs)
        if prec == "f32":
            print(f"gather segs={len(gs.segs)} slots={slots} "
                  f"(pad {slots/nnz:.2f}x)", flush=True)
        Xp = gs.to_perm(X0)
        timed(f"gatherspmm_{prec} d={d}", gs.spmm, Xp)

# current accel choice at solver shape
from graphlearning_tpu.ops import accel as _accel

t0 = time.time()
acc = _accel.maybe_build(W, d_pad=128, exact=False, fast=True)
t_build = time.time() - t0
if acc is None:
    print(f"maybe_build: DISABLED (gather path) [{t_build:.1f}s]",
          flush=True)
else:
    print(f"maybe_build: band Wwin={acc.Wwin} mat={acc.materialize} "
          f"tiles={'y' if acc._tiles is not None else 'n'} "
          f"resid={acc.n_resid/nnz*100:.1f}% mode={acc.mode} "
          f"[{t_build:.1f}s]", flush=True)
    for d in (10, 128):
        X0 = jnp.asarray(rs.randn(n, d).astype(np.float32))
        Xp = acc.to_perm(X0)
        _aspmm = jax.jit(acc.spmm)
        timed(f"accel_spmm d={d}", _aspmm, Xp)
