"""Manual double-buffered DMA pipeline for the packed bf16 SpMM —
does explicit pipelining beat Mosaic's auto-pipeline?

MEASURED ANSWER (real v5e, 2026-08-21, 3 reps in-process): NO.
  auto-pipeline (band_tiles_spmm_packed, bf16, 256/128/12): 1.26-1.28e9 e/s
  this kernel, NB=2 double buffering:                        1.23-1.30e9 e/s
  NB=3 triple buffering:                                     1.28-1.29e9 e/s
  per-tile chunked wait+dot (fine-grained overlap):          0.79e9 (-40%:
      sub-(R,WT) dots pay MXU ramp + semaphore-wait overhead)
Numerics identical (rel 2.9e-3 = the bf16 mode).  Together with the
stream-only ceiling measurement (scripts/stream_ceiling.py): the ~30%
gap between the real kernels and their pure-DMA schedule is intrinsic
DMA/compute contention on this chip, not pipeline depth, issue order,
or scheduler hints (vmem_limit/dimension_semantics/CostEstimate all
measured neutral-or-worse) — the packed-kernel headlines stand at the
practical hardware limit for this access pattern.

Env knobs: NB (buffer count), CHUNKED=1 (per-tile wait+dot variant).
Geometry (256,128,12) on the headline Hilbert graph; bf16 band + bf16 X,
one dot per slab.
"""
import sys, os, time, functools, numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import scipy.sparse as sp
from scipy.spatial import cKDTree
from graphlearning_tpu.core.sparse import SparseGraph
from graphlearning_tpu.ops.accel import hilbert_order_2d
from graphlearning_tpu.parallel.shard import pad_graph_to
from graphlearning_tpu.ops.pallas_spmm import (
    apply_residual, build_residual_ell, materialize_band_tiles,
    pack_band, pack_tiles, plan_tiles)

n, k, d = 1 << 18, 16, 128
rs = np.random.RandomState(0)
pts = rs.rand(n, 2)
tree = cKDTree(pts)
dist, ind = tree.query(pts, k=k + 1)
dist, ind = dist[:, 1:], ind[:, 1:]
eps = np.maximum(dist[:, -1:] ** 2, 1e-12)
w = np.exp(-4 * dist**2 / eps).astype(np.float64)
rows = np.repeat(np.arange(n, dtype=np.int64), k)
W = sp.csr_matrix((w.ravel(), (rows, ind.ravel())), shape=(n, n))
W = (W + W.T) / 2
perm = hilbert_order_2d(pts)
W = W[perm, :][:, perm].tocsr()
W = sp.diags(1.0 / np.asarray(W.sum(1)).ravel()) @ W
W = W.tocsr()
nnz = W.nnz
g0 = SparseGraph.from_scipy(W, dtype=jnp.float32)
X_np = rs.randn(n, d).astype(np.float32)
Y1_ref = W @ X_np.astype(np.float64)
y1max = np.abs(Y1_ref).max()

R, WT, S = 256, 128, 12
SW = S * WT
gp = pad_graph_to(g0, max(R, WT))
X = jnp.asarray(X_np)
if gp.n != g0.n:
    X = jnp.pad(X, ((0, gp.n - g0.n), (0, 0)))
met = max(8, int(R * WT * 4 / 700e9 / 40e-9))
tb, ts, bf, rrows, rslots, kcap = plan_tiles(
    np.asarray(gp.cols), R=R, WT=WT, deg=np.asarray(gp.deg),
    min_edges_per_tile=met)
resid = build_residual_ell(rrows, rslots, np.asarray(gp.cols),
                           np.asarray(gp.vals).astype(np.float32), gp.n)
sb, sts, sbf, src = pack_tiles(tb, ts, bf, S)
b0 = materialize_band_tiles(gp.cols[:, :kcap], gp.vals[:, :kcap],
                            jnp.asarray(tb), jnp.asarray(ts), R=R, WT=WT,
                            out_dtype=jnp.float32)
packed = pack_band(b0, src, R=R, WT=WT)
b0.delete()
band16 = packed.astype(jnp.bfloat16)
jax.block_until_ready(band16)
packed.delete()
G = len(sb)
NBLK = gp.n // R
print("G =", G, "NBLK =", NBLK, flush=True)

sb_j = jnp.asarray(sb)
sts_j = jnp.asarray(sts.reshape(-1) // WT)  # tile index: offsets provably WT-divisible
sbf_j = jnp.asarray(sbf)
NB = int(os.environ.get('NB', 2))
CHUNKED = os.environ.get('CHUNKED', '0') == '1'


def kern(sb_ref, sts_ref, bf_ref, band_hbm, x_hbm, out_hbm,
         bband, bx, acc, sem_b, sem_x, sem_o):
    def band_dma(slot, g):
        return pltpu.make_async_copy(
            band_hbm.at[pl.ds(g * R, R), :], bband.at[slot],
            sem_b.at[slot])

    def x_dma(slot, kk, g):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(sts_ref[g * S + kk] * WT, WT), :],
            bx.at[slot, pl.ds(kk * WT, WT), :], sem_x.at[slot, kk])

    def out_dma(oslot, blk):
        return pltpu.make_async_copy(
            acc.at[oslot], out_hbm.at[pl.ds(blk * R, R), :],
            sem_o.at[oslot])

    # warm up: start DMAs for slab 0
    band_dma(0, 0).start()
    for kk in range(S):
        x_dma(0, kk, 0).start()

    def body(g, carry):
        oslot, flushing = carry
        slot = jax.lax.rem(g, NB)
        nslot = jax.lax.rem(g + 1, NB)

        @pl.when(g + 1 < G)
        def _():
            band_dma(nslot, g + 1).start()
            for kk in range(S):
                x_dma(nslot, kk, g + 1).start()

        band_dma(slot, g).wait()
        if not CHUNKED:
            for kk in range(S):
                x_dma(slot, kk, g).wait()

        # new row block: flush the accumulator of the previous block
        # (async) and switch accumulators
        new_blk = bf_ref[g] == 1

        def flush(carry):
            oslot, flushing = carry
            @pl.when(flushing == 1)
            def _():
                out_dma(1 - oslot, sb_ref[jnp.maximum(g - 1, 0)]).wait()
            out_dma(oslot, sb_ref[jnp.maximum(g - 1, 0)]).start()
            noslot = 1 - oslot
            acc[noslot] = jnp.zeros_like(acc[noslot])
            return noslot, jnp.int32(1)

        oslot, flushing = jax.lax.cond(
            jnp.logical_and(new_blk, g > 0), flush,
            lambda c: c, (oslot, flushing))

        A = bband[slot]
        if CHUNKED:
            part = jnp.zeros((R, d), jnp.float32)
            for kk in range(S):
                x_dma(slot, kk, g).wait()
                part += jax.lax.dot_general(
                    A[:, kk * WT:(kk + 1) * WT],
                    bx[slot, pl.ds(kk * WT, WT), :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            acc[oslot] += part
        else:
            x = bx[slot]
            acc[oslot] += jax.lax.dot_general(
                A, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return oslot, flushing

    acc[0] = jnp.zeros_like(acc[0])
    oslot, flushing = jax.lax.fori_loop(
        0, G, body, (jnp.int32(0), jnp.int32(0)))
    # final flush
    @pl.when(flushing == 1)
    def _():
        out_dma(1 - oslot, sb_ref[G - 2]).wait()
    out_dma(oslot, sb_ref[G - 1]).start()
    out_dma(oslot, sb_ref[G - 1]).wait()


call = pl.pallas_call(
    kern,
    in_specs=[
        pl.BlockSpec(memory_space=pltpu.SMEM),      # sb
        pl.BlockSpec(memory_space=pltpu.SMEM),      # sts flat
        pl.BlockSpec(memory_space=pltpu.SMEM),      # bf
        pl.BlockSpec(memory_space=pltpu.ANY),       # band HBM
        pl.BlockSpec(memory_space=pltpu.ANY),       # X HBM
    ],
    out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
    out_shape=jax.ShapeDtypeStruct((gp.n, d), jnp.float32),
    scratch_shapes=[
        pltpu.VMEM((NB, R, SW), jnp.bfloat16),
        pltpu.VMEM((NB, SW, d), jnp.bfloat16),
        pltpu.VMEM((2, R, d), jnp.float32),
        pltpu.SemaphoreType.DMA((NB,)),
        pltpu.SemaphoreType.DMA((NB, S)),
        pltpu.SemaphoreType.DMA((2,)),
    ],
    compiler_params=pltpu.CompilerParams(has_side_effects=True),
)


@jax.jit
def run_manual(b_, sb_, sts_, sbf_, resid_, Xf):
    Xk = Xf.astype(jnp.bfloat16)
    out = call(sb_, sts_, sbf_, b_, Xk)
    return apply_residual(out, Xf, resid_)


fn = lambda Xf: run_manual(band16, sb_j, sts_j, sbf_j, resid, Xf)
out = fn(X)
rel1 = float(np.abs(np.asarray(out[:n]).astype(np.float64)
                    - Y1_ref).max() / y1max)
print("manual rel_err:", rel1, flush=True)
out = X
for _ in range(3):
    out = fn(out)
float(jnp.sum(out[0]))
for rep in range(3):
    t0 = time.perf_counter()
    Y = X
    for _ in range(30):
        Y = fn(Y)
    float(jnp.sum(Y[0]))
    dt = (time.perf_counter() - t0) / 30
    print(f"manual pipeline: {nnz/dt/1e6:.1f} M e/s  {dt*1e3:.3f} ms",
          flush=True)
