"""On-chip SpMM kernel shootout for the band-hostile 30-d kNN graph
(VERDICT r3 item 1).  The graph is degree-skewed (hub degree ~500 at
n=262k), so every gather variant runs on the BucketedELL layout
(kcap = p95 main + COO spill) — the full ELL would pad 7.07M edges to
130M slots.  Candidates:

  f32_gather    bucketed slot-loop gather, f32 table (status-quo fallback)
  bf16_gather   gather from a bf16 X copy — the gather-rate cliff lives
                at table BYTES (f32 n=262k d=128 = 134MB -> ~12.8ns/row;
                bf16 67MB -> ~3.9ns/row), f32 accumulate
  bf16x2        hi/lo split-table gather (2 bf16 gathers ~= f32 exact)
  accel_auto    whatever AccelSpMM's cost model picks for this graph

All arrays are jit ARGUMENTS (closed-over constants serialize into the
remote-compile payload -> HTTP 413).  Timed CHAINED with a host-value
fetch.  Prints one line per candidate + rel error vs scipy f64.
"""
import functools
import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, "/root/repo")

n_env = int(os.environ.get("N", 1 << 18))
cache = f"/tmp/highdim_graph_n{n_env}_k16_d30.npz"
W = sp.load_npz(cache)
n = W.shape[0]
W = sp.diags(1.0 / np.asarray(W.sum(1)).ravel()) @ W   # row-stochastic
W = W.tocsr()
nnz = W.nnz
d = 128
ITERS = int(os.environ.get("ITERS", 20))

import jax
import jax.numpy as jnp

from graphlearning_tpu.core.sparse import BucketedELL, SparseGraph

rs = np.random.RandomState(1)
X0_np = rs.randn(n, d).astype(np.float32)

# scipy f64 reference for error + baseline rate
Xc = X0_np.astype(np.float64)
W @ Xc
t0 = time.perf_counter()
Yc = Xc
for _ in range(3):
    Yc = W @ Yc
dt_base = (time.perf_counter() - t0) / 3
base_rate = nnz / dt_base
ref3 = Yc

results = {}


def run(name, fn, X0, from_perm=None):
    try:
        out = fn(X0)
        float(jnp.sum(out[0]))
        Y = X0
        for _ in range(3):
            Y = fn(Y)
        Yh = np.asarray(Y, np.float64)
        if from_perm is not None:
            Yh = from_perm(Yh)
        err = float(np.max(np.abs(Yh - ref3)) / np.max(np.abs(ref3)))
        t0 = time.perf_counter()
        Y = X0
        for _ in range(ITERS):
            Y = fn(Y)
        float(jnp.sum(Y[0]))
        dt = (time.perf_counter() - t0) / ITERS
        rate = nnz / dt
        results[name] = dict(edges_per_s=rate, ms=dt * 1e3, rel_err=err,
                             vs_scipy=rate / base_rate)
        print(f"{name:14s} {rate/1e6:9.1f} M e/s  {dt*1e3:8.2f} ms  "
              f"rel_err {err:.2e}  {rate/base_rate:6.1f}x scipy",
              flush=True)
    except Exception as e:
        print(f"{name:14s} FAIL: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


cols_np, vals_np, deg_np = SparseGraph.ell_from_scipy(W)
b = BucketedELL.from_ell_np(cols_np, vals_np, deg_np, dtype=jnp.float32)
kb = b.kcap
print(f"n={n} nnz={nnz} raw ELL k={cols_np.shape[1]} bucketed kcap={kb} "
      f"spill={b.m} scipy {base_rate/1e6:.1f} M e/s", flush=True)

bm_cols = b.main.cols
bm_vals = jnp.where(jnp.arange(kb)[None, :] < b.main.deg[:, None],
                    b.main.vals, 0.0).astype(jnp.float32)
sp_rows, sp_cols = b.sp_rows, b.sp_cols
sp_vals = b.sp_vals.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("prec",))
def bucketed_spmm(cols, vals, sp_r, sp_c, sp_v, X, prec="f32"):
    if prec == "f32":
        tabs = [X]
    elif prec == "bf16":
        tabs = [X.astype(jnp.bfloat16)]
    else:  # bf16x2
        hi = X.astype(jnp.bfloat16)
        lo = (X - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        tabs = [hi, lo]
    out = jnp.zeros((n, d), jnp.float32)
    for s in range(kb):
        c = cols[:, s]
        xs = sum(jnp.take(t, c, axis=0).astype(jnp.float32) for t in tabs)
        out = out + vals[:, s:s + 1] * xs
    sv = sum(jnp.take(t, sp_c, axis=0).astype(jnp.float32) for t in tabs)
    return out.at[sp_r].add(sp_v[:, None] * sv, mode="drop")


for prec in ("f32", "bf16", "bf16x2"):
    run(f"{prec}_gather",
        lambda X, p=prec: bucketed_spmm(bm_cols, bm_vals, sp_rows, sp_cols,
                                        sp_vals, X, prec=p),
        jnp.asarray(X0_np))

# AccelSpMM auto choice
try:
    from graphlearning_tpu.ops.accel import AccelSpMM

    t0 = time.perf_counter()
    acc = AccelSpMM(W, exact=False, fast=True)
    print(f"accel: materialize={acc.materialize} Wwin={acc.Wwin} "
          f"tiles={'y' if acc._tiles is not None else 'n'} "
          f"n_resid={acc.n_resid} ({acc.n_resid/max(nnz,1)*100:.1f}%) "
          f"mode={acc.mode} build={time.perf_counter()-t0:.1f}s",
          flush=True)
    Xp0 = acc.to_perm(jnp.asarray(X0_np))
    _spmm = jax.jit(acc.spmm)
    inv = np.asarray(acc.inv)

    run("accel_auto", _spmm, Xp0,
        from_perm=lambda Yh: Yh[inv])
except Exception as e:
    print(f"accel_auto FAIL: {type(e).__name__}: {str(e)[:300]}", flush=True)

json.dump(results, open("/tmp/highdim_kernel_bench.json", "w"), indent=1)
print("saved /tmp/highdim_kernel_bench.json", flush=True)
