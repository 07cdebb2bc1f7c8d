"""Measured HBM stream ceiling for the packed tiled-band SpMM schedule
(round-4 verdict item 4).

The degenerate kernel below has the IDENTICAL grid + BlockSpec schedule
as ``band_tiles_spmm_packed`` (ops/pallas_spmm.py): per grid step it
DMAs one (R, S*WT) band slab + S (WT, d) X window tiles into VMEM and
writes one (R, d) output block — but does no matmul (a single VPU copy
keeps the output defined).  Whatever GB/s this reaches at the headline
geometry IS the achievable bandwidth for that access pattern on this
chip; the roofline fraction of the real kernel should be quoted against
it, not against the 819 GB/s paper peak (which assumes perfectly
sequential maximal-burst streams, not tile-strided DMA).

Usage: python scripts/stream_ceiling.py  (prints one JSON line per config)
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stream_kernel(tb_ref, ts_ref, bf_ref, band_ref, *rest, WT, S, d):
    xs = rest[:-1]
    out_ref = rest[-1]
    # touch every DMA'd operand with VPU-only work: the block DMAs are
    # issued for the FULL blocks by the pipeline regardless of use, and
    # the adds prevent operand elision
    A = band_ref[:]                                   # (R, S*WT)
    acc = A[:, :d].astype(jnp.float32)
    xacc = jnp.zeros((1, d), jnp.float32)
    for x_ref in xs:                                  # (WT, d) each
        xacc = xacc + jnp.sum(x_ref[:].astype(jnp.float32), axis=0,
                              keepdims=True)
    out_ref[:] = acc + xacc


def stream_spmm_like(band, slab_block, slab_starts, slab_first, X, n, R, WT,
                     S):
    G = slab_block.shape[0]
    d = X.shape[1]
    slab_starts = slab_starts.reshape(-1)
    kernel = functools.partial(_stream_kernel, WT=WT, S=S, d=d)
    x_specs = [
        pl.BlockSpec(
            (WT, d),
            (lambda k: lambda g, tb, ts, bf: (ts[g * S + k] // WT, 0))(k),
            memory_space=pltpu.VMEM)
        for k in range(S)
    ]
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((R, S * WT), lambda g, tb, ts, bf: (g, 0),
                             memory_space=pltpu.VMEM),
            ] + x_specs,
            out_specs=pl.BlockSpec((R, d),
                                   lambda g, tb, ts, bf: (tb[g], 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
    )(slab_block, slab_starts, slab_first, band, *([X] * S))


def main():
    import scipy.sparse as sp
    from scipy.spatial import cKDTree
    from graphlearning_tpu.core.sparse import SparseGraph
    from graphlearning_tpu.ops.accel import hilbert_order_2d
    from graphlearning_tpu.ops.pallas_spmm import (
        materialize_band_tiles, pack_band, pack_tiles, plan_tiles)
    from graphlearning_tpu.parallel.shard import pad_graph_to

    n = int(os.environ.get("GLT_BENCH_N", 1 << 18))
    k = int(os.environ.get("GLT_BENCH_K", 16))
    d = int(os.environ.get("GLT_BENCH_D", 128))
    iters = int(os.environ.get("GLT_BENCH_ITERS", 50))

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
    g = SparseGraph.from_scipy(W, dtype=jnp.float32)

    # headline geometry from the tuned config
    tuned = json.load(open(os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "scripts",
        "spmm_tuned.json")))
    bp = tuned["best_packed_hilbert"]
    R, WT, S = int(bp["R"]), int(bp["WT"]), int(bp["S"])
    R = int(os.environ.get("GLT_BENCH_R", R))
    WT = int(os.environ.get("GLT_BENCH_WT", WT))
    S = int(os.environ.get("GLT_BENCH_S", S))

    gp = pad_graph_to(g, max(R, WT))
    tb, ts, bf, rrows, rslots, kcap = plan_tiles(
        np.asarray(gp.cols), R=R, WT=WT, deg=np.asarray(gp.deg))
    sb, sts, sbf, src = pack_tiles(tb, ts, bf, S)
    slabs = (jnp.asarray(sb), jnp.asarray(sts), jnp.asarray(sbf))
    G = len(sb)
    X = jnp.asarray(rs.randn(gp.n, d).astype(np.float32))

    for band_dt, x_dt in ((jnp.bfloat16, jnp.bfloat16),
                          (jnp.bfloat16, jnp.float32),
                          (jnp.float32, jnp.float32)):
        _m = jax.jit(lambda c, v, tb_, ts_: materialize_band_tiles(
            c, v, tb_, ts_, R=R, WT=WT, out_dtype=band_dt))
        b0 = _m(gp.cols[:, :kcap], gp.vals[:, :kcap], jnp.asarray(tb),
                jnp.asarray(ts))
        band = pack_band(b0, src, R=R, WT=WT)
        b0.delete()
        Xc = X.astype(x_dt)

        run = jax.jit(lambda band_, sb_, sts_, sbf_, Xc_: stream_spmm_like(
            band_, sb_, sts_, sbf_, Xc_, n=gp.n, R=R, WT=WT, S=S))
        out = run(band, *slabs, Xc)
        float(jnp.sum(out[0]))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(band, *slabs, Xc)
        float(jnp.sum(out[0]))
        dt = (time.perf_counter() - t0) / iters

        bb = 2 if band_dt == jnp.bfloat16 else 4
        bx = 2 if x_dt == jnp.bfloat16 else 4
        traffic = (G * (R * S * WT * bb + S * WT * d * bx)
                   + (gp.n // R) * R * d * 4)
        print(json.dumps({
            "kernel": "stream_only",
            "band_dtype": str(np.dtype(band_dt)), "x_dtype": str(np.dtype(x_dt)),
            "R": R, "WT": WT, "S": S, "G_slabs": int(G), "n": n, "d": d,
            "nnz": int(nnz),
            "ms_per_pass": round(dt * 1e3, 3),
            "traffic_GB": round(traffic / 1e9, 3),
            "achieved_GBps": round(traffic / dt / 1e9, 1),
            "frac_of_819GBps": round(traffic / dt / 819e9, 3),
        }), flush=True)
        band.delete()


if __name__ == "__main__":
    main()
