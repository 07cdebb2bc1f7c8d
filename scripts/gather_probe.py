"""Microbenchmark: how fast can this chip gather X rows by index?

Variants probed (each guarded — unsupported lowerings just report FAIL):
  A. XLA jnp.take of (M,) rows from an (C, d) table            [status quo]
  B. Pallas kernel, whole-block jnp.take from a VMEM-resident table
  C. Pallas kernel, per-row dynamic-slice fori_loop from VMEM
  D. Pallas kernel, one-hot MXU matmul gather (R x C) @ (C, d)
  E. XLA one-hot matmul gather (batched, for reference)

The winner sets the design for the band-hostile (high-dimensional kNN)
SpMM format: if VMEM gather sustains >= ~1 row/ns-ish rates, a
cluster-resident gather kernel beats every dense-band format on graphs
whose band occupancy is <1%.

Run on the real chip:  python scripts/gather_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 8192          # table rows (one "cluster" resident in VMEM)
d = 128           # feature dim
M = 1 << 20       # gathers per call
R = 512           # rows per grid step
ITERS = 20

rs = np.random.RandomState(0)
x = jnp.asarray(rs.randn(C, d).astype(np.float32))
idx = jnp.asarray(rs.randint(0, C, M).astype(np.int32))


def timeit(name, fn, *args):
    try:
        out = fn(*args)
        s0 = float(jnp.sum(out[0]))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        s = float(jnp.sum(out[0]))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:30s} {M/dt/1e9:8.3f} G rows/s   {dt*1e3:8.3f} ms "
              f"({M*d*4/dt/1e9:7.1f} GB/s out)", flush=True)
        return dt
    except Exception as e:
        print(f"{name:30s} FAIL: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None


# A. XLA take
timeit("A xla take", jax.jit(lambda x, i: jnp.take(x, i, axis=0)), x, idx)

# B. Pallas whole-block take from VMEM table
def kern_take(i_ref, x_ref, o_ref):
    o_ref[:] = jnp.take(x_ref[:], i_ref[:], axis=0)

@jax.jit
def pallas_take(x, idx):
    return pl.pallas_call(
        kern_take,
        grid=(M // R,),
        in_specs=[
            pl.BlockSpec((R,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, d), jnp.float32),
    )(idx, x)

timeit("B pallas vmem take", pallas_take, x, idx)


# B2: take_along_axis formulation
def kern_taa(i_ref, x_ref, o_ref):
    ii = i_ref[:].reshape(R, 1)
    o_ref[:] = jnp.take_along_axis(
        x_ref[:], jnp.broadcast_to(ii, (R, d)), axis=0)

@jax.jit
def pallas_taa(x, idx):
    return pl.pallas_call(
        kern_taa,
        grid=(M // R,),
        in_specs=[
            pl.BlockSpec((R,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, d), jnp.float32),
    )(idx, x)

timeit("B2 pallas take_along_axis", pallas_taa, x, idx)


# C. per-row dynamic-slice loop
def kern_loop(i_ref, x_ref, o_ref):
    def body(r, _):
        o_ref[pl.ds(r, 1), :] = x_ref[pl.ds(i_ref[r], 1), :]
        return 0
    jax.lax.fori_loop(0, R, body, 0)

@jax.jit
def pallas_loop(x, idx):
    return pl.pallas_call(
        kern_loop,
        grid=(M // R,),
        in_specs=[
            pl.BlockSpec((R,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((C, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, d), jnp.float32),
    )(idx, x)

timeit("C pallas ds-loop", pallas_loop, x, idx)


# D. one-hot MXU gather (R, C) @ (C, d)
def kern_onehot(i_ref, x_ref, o_ref):
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    oh = (cols == i_ref[:].reshape(R, 1)).astype(jnp.bfloat16)
    o_ref[:] = jnp.dot(oh, x_ref[:].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

@jax.jit
def pallas_onehot(x, idx):
    return pl.pallas_call(
        kern_onehot,
        grid=(M // R,),
        in_specs=[
            pl.BlockSpec((R,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, d), jnp.float32),
    )(idx, x)

timeit("D pallas one-hot MXU", pallas_onehot, x, idx)


# E. XLA one-hot matmul
@jax.jit
def xla_onehot(x, idx):
    oh = jax.nn.one_hot(idx, C, dtype=jnp.bfloat16)
    return oh @ x.astype(jnp.bfloat16)

timeit("E xla one-hot matmul", xla_onehot, x, idx)
