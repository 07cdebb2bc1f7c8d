"""Gather probe round 2: XLA take at realistic table sizes + dtypes.

The SpMM gather path reads rows of X (n, d) by ELL column index.  How
fast is XLA's row gather as a function of table size (VMEM-resident vs
HBM), dtype, and index locality?  Also: the composite ELL SpMM
(gather + weighted segment-sum over k slots) end-to-end.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

d = 128
M = 1 << 20
ITERS = 20
rs = np.random.RandomState(0)


def timeit(name, fn, *args, m=M):
    out = fn(*args)
    float(jnp.sum(out.reshape(-1)[:4]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(jnp.sum(out.reshape(-1)[:4]))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:42s} {m/dt/1e9:8.3f} G rows/s  {dt*1e3:8.2f} ms "
          f"({m*d*4/dt/1e9:7.1f} GB/s out)", flush=True)
    return dt


take = jax.jit(lambda x, i: jnp.take(x, i, axis=0))

for C in (8192, 65536, 262144, 1 << 20):
    x = jnp.asarray(rs.randn(C, d).astype(np.float32))
    idx = jnp.asarray(rs.randint(0, C, M).astype(np.int32))
    timeit(f"take f32 C={C} random", take, x, idx)
    # locality: indices sorted in blocks of 1024 (cluster-ordered graph)
    idx_s = np.sort(rs.randint(0, C, M).astype(np.int32).reshape(-1, 1024),
                    axis=1).ravel()
    timeit(f"take f32 C={C} blocksorted", take, x, jnp.asarray(idx_s))
    xb = x.astype(jnp.bfloat16)
    timeit(f"take bf16 C={C} random", take, xb, idx)

# composite ELL SpMM: n rows, k slots
n, k = 262144, 24
C = n
x = jnp.asarray(rs.randn(C, d).astype(np.float32))
cols = jnp.asarray(rs.randint(0, C, (n, k)).astype(np.int32))
vals = jnp.asarray(rs.rand(n, k).astype(np.float32) / k)


@jax.jit
def ell_spmm(x, cols, vals):
    out = jnp.zeros((n, d), jnp.float32)
    for s in range(k):
        out = out + vals[:, s:s + 1] * jnp.take(x, cols[:, s], axis=0)
    return out


@jax.jit
def ell_spmm_flat(x, cols, vals):
    g = jnp.take(x, cols.reshape(-1), axis=0).reshape(n, k, d)
    return jnp.einsum("nk,nkd->nd", vals, g)


timeit("ell spmm slotloop n=262k k=24", ell_spmm, x, cols, vals, m=n * k)
timeit("ell spmm flat n=262k k=24", ell_spmm_flat, x, cols, vals, m=n * k)

# cluster-local ELL: columns restricted to the row's 8192-block
base = (np.arange(n) // 8192) * 8192
cols_loc = jnp.asarray(
    (base[:, None] + rs.randint(0, 8192, (n, k))).astype(np.int32))
timeit("ell spmm slotloop cluster-local", ell_spmm, x, cols_loc, vals,
       m=n * k)
