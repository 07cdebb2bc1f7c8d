"""On-chip sweep of the compact tiled-band SpMM geometry (round-2 verdict
item 3): time (R, WT, mode) candidates on the standard bench graph and
report the traffic roofline for each — bytes streamed per SpMM
(band tiles + X tiles + output blocks), achieved HBM GB/s, and the
fraction of the v5e ~819 GB/s peak.

The traffic model: each grid step fetches one (R, WT) band tile and one
(WT, d) X tile; each row block writes one (R, d) output block once.
    bytes = G*(R*WT*b_band + WT*d*4) + (n/R)*R*d*4
Minimizing G*WT*(R*b_band/4 + d) over the geometry is the whole game —
the band is ~0.5% occupied, so smaller tiles cut zero-streaming but
re-fetch X more often.

Usage: python scripts/spmm_sweep.py   (real TPU; ~2 min/config cold)
Writes results to scripts/spmm_sweep_results.json and updates
scripts/spmm_tuned.json's best_tiles when a config wins.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp
from scipy.spatial import cKDTree
from scipy.sparse.csgraph import reverse_cuthill_mckee

import jax
import jax.numpy as jnp

HBM_PEAK = 819e9     # v5e


def build_graph(n, k):
    rs = np.random.RandomState(0)
    pts = rs.rand(n, 2)
    dist, ind = cKDTree(pts).query(pts, k=k + 1)
    dist, ind = dist[:, 1:], ind[:, 1:]
    eps = np.maximum(dist[:, -1:] ** 2, 1e-12)
    w = np.exp(-4 * dist**2 / eps).astype(np.float64)
    rows = np.repeat(np.arange(n, dtype=np.int64), k)
    W = sp.csr_matrix((w.ravel(), (rows, ind.ravel())), shape=(n, n))
    W = (W + W.T) / 2
    perm = np.asarray(reverse_cuthill_mckee(W, symmetric_mode=True))
    W = W[perm, :][:, perm].tocsr()
    W = sp.diags(1.0 / np.asarray(W.sum(1)).ravel()) @ W
    return W.tocsr()


def main():
    from graphlearning_tpu.core.sparse import SparseGraph
    from graphlearning_tpu.parallel.shard import pad_graph_to
    from graphlearning_tpu.ops.pallas_spmm import (
        build_residual_ell, materialize_band_tiles, plan_tiles,
        spmm_tiles_hybrid)

    n = int(os.environ.get("GLT_BENCH_N", 1 << 18))
    k = int(os.environ.get("GLT_BENCH_K", 16))
    d = int(os.environ.get("GLT_BENCH_D", 128))
    iters = int(os.environ.get("GLT_BENCH_ITERS", 30))
    W = build_graph(n, k)
    nnz = W.nnz
    g = SparseGraph.from_scipy(W, dtype=jnp.float32)
    rs = np.random.RandomState(1)
    X0 = rs.randn(n, d).astype(np.float32)

    candidates = []
    for R, WT in ((512, 512), (512, 256), (256, 256), (256, 128),
                  (128, 256), (128, 128)):
        for mode in ("bf16x3", "bf16"):
            candidates.append((R, WT, mode))

    results = []
    for R, WT, mode in candidates:
        gp = pad_graph_to(g, max(R, WT))
        X = jnp.asarray(np.pad(X0, ((0, gp.n - n), (0, 0))))
        tb, ts, bf, rrows, rslots, kcap = plan_tiles(
            np.asarray(gp.cols), R=R, WT=WT, deg=np.asarray(gp.deg))
        resid = build_residual_ell(rrows, rslots, np.asarray(gp.cols),
                                   np.asarray(gp.vals).astype(np.float32),
                                   gp.n)
        tiles = (jnp.asarray(tb), jnp.asarray(ts), jnp.asarray(bf))
        band_dtype = jnp.bfloat16 if mode == "bf16" else jnp.float32
        b_band = 2 if mode == "bf16" else 4
        _mat = jax.jit(lambda c, v, tb_, ts_: materialize_band_tiles(
            c, v, tb_, ts_, R=R, WT=WT, out_dtype=band_dtype))
        band = _mat(gp.cols[:, :kcap], gp.vals[:, :kcap], tiles[0],
                    tiles[1])
        float(jnp.sum(band[0, :8].astype(jnp.float32)))
        _hybrid = jax.jit(
            lambda band_, tiles_, g_, resid_, X: spmm_tiles_hybrid(
                band_, tiles_, g_, X, R=R, WT=WT, mode=mode, resid=resid_))
        fn = lambda Y: _hybrid(band, tiles, gp, resid, Y)
        out = fn(X)
        float(jnp.sum(out[0]))
        Y = X
        for _ in range(3):
            Y = fn(Y)
        float(jnp.sum(Y[0]))
        t0 = time.perf_counter()
        Y = X
        for _ in range(iters):
            Y = fn(Y)
        float(jnp.sum(Y[0]))
        dt = (time.perf_counter() - t0) / iters
        G = len(tb)
        traffic = G * (R * WT * b_band + WT * d * 4) + (gp.n // R) * R * d * 4
        row = {
            "R": R, "WT": WT, "mode": mode, "G": int(G),
            "kcap": int(kcap),
            "residual_frac": round(len(rrows) / nnz, 5),
            "edges_per_s": round(nnz / dt, 1),
            "ms_per_spmm": round(dt * 1e3, 3),
            "bytes_per_edge": round(traffic / nnz, 1),
            "traffic_GB": round(traffic / 1e9, 3),
            "achieved_GBps": round(traffic / dt / 1e9, 1),
            "hbm_frac": round(traffic / dt / HBM_PEAK, 3),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        band.delete()

    results.sort(key=lambda r: -r["edges_per_s"])
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "spmm_sweep_results.json")
    json.dump({"n": n, "k": k, "d": d, "nnz": int(nnz),
               "results": results}, open(out_path, "w"), indent=1)
    print("best:", json.dumps(results[0]))




def sweep_packed():
    """Packed-slab sweep (S tiles per grid step + optional bf16 X): the
    grid-step-floor fix measured in the round-3 geometry sweep."""
    from graphlearning_tpu.core.sparse import SparseGraph
    from graphlearning_tpu.parallel.shard import pad_graph_to
    from graphlearning_tpu.ops.pallas_spmm import (
        band_tiles_spmm_packed, build_residual_ell, materialize_band_tiles,
        pack_band, pack_tiles, plan_tiles, apply_residual)

    n = int(os.environ.get("GLT_BENCH_N", 1 << 18))
    k = int(os.environ.get("GLT_BENCH_K", 16))
    d = int(os.environ.get("GLT_BENCH_D", 128))
    iters = int(os.environ.get("GLT_BENCH_ITERS", 30))
    W = build_graph(n, k)
    nnz = W.nnz
    g0 = SparseGraph.from_scipy(W, dtype=jnp.float32)
    rs = np.random.RandomState(1)
    X0 = rs.randn(n, d).astype(np.float32)

    results = []
    for R, WT, S, mode, xdt in (
            (256, 128, 4, "bf16", "bf16"),
            (256, 128, 4, "bf16", "f32"),
            (128, 128, 8, "bf16", "bf16"),
            (256, 128, 4, "bf16x3", "f32"),
            (256, 256, 2, "bf16", "bf16"),
            (512, 128, 4, "bf16", "bf16"),
            (512, 256, 2, "bf16x3", "f32"),
    ):
        gp = pad_graph_to(g0, max(R, WT))
        Xp = np.pad(X0, ((0, gp.n - n), (0, 0)))
        X = jnp.asarray(Xp, jnp.bfloat16 if xdt == "bf16" else jnp.float32)
        tb, ts, bf, rrows, rslots, kcap = plan_tiles(
            np.asarray(gp.cols), R=R, WT=WT, deg=np.asarray(gp.deg))
        resid = build_residual_ell(rrows, rslots, np.asarray(gp.cols),
                                   np.asarray(gp.vals).astype(np.float32),
                                   gp.n)
        band_dtype = jnp.bfloat16 if mode == "bf16" else jnp.float32
        b_band = 2 if mode == "bf16" else 4
        band0 = materialize_band_tiles(
            gp.cols[:, :kcap], gp.vals[:, :kcap], jnp.asarray(tb),
            jnp.asarray(ts), R=R, WT=WT, out_dtype=band_dtype)
        sb, sts, sbf, src = pack_tiles(tb, ts, bf, S)
        band = pack_band(band0, src, R=R, WT=WT)
        band0.delete()
        sbj, stsj, sbfj = (jnp.asarray(sb), jnp.asarray(sts),
                           jnp.asarray(sbf))
        bx = 2 if xdt == "bf16" else 4

        @jax.jit
        def _run(band, sb_, sts_, sbf_, resid_, X):
            out = band_tiles_spmm_packed(
                band, sb_, sts_, sbf_, X, n=gp.n, R=R, WT=WT, S=S,
                mode=mode)
            out = apply_residual(out, X.astype(jnp.float32), resid_)
            return out.astype(X.dtype)

        fn = lambda Y: _run(band, sbj, stsj, sbfj, resid, Y)
        out = fn(X)
        float(jnp.sum(out[0].astype(jnp.float32)))
        Y = X
        for _ in range(3):
            Y = fn(Y)
        float(jnp.sum(Y[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        Y = X
        for _ in range(iters):
            Y = fn(Y)
        float(jnp.sum(Y[0].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters
        G = len(sb)
        traffic = (G * (R * S * WT * b_band + S * WT * d * bx)
                   + (gp.n // R) * R * d * 4)
        row = {"R": R, "WT": WT, "S": S, "mode": mode, "x_dtype": xdt,
               "G_slabs": int(G), "kcap": int(kcap),
               "residual_frac": round(len(rrows) / nnz, 5),
               "edges_per_s": round(nnz / dt, 1),
               "ms_per_spmm": round(dt * 1e3, 3),
               "bytes_per_edge": round(traffic / nnz, 1),
               "achieved_GBps": round(traffic / dt / 1e9, 1),
               "hbm_frac": round(traffic / dt / HBM_PEAK, 3)}
        results.append(row)
        print(json.dumps(row), flush=True)
        band.delete()
    results.sort(key=lambda r: -r["edges_per_s"])
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "spmm_sweep_packed.json")
    json.dump({"n": n, "k": k, "d": d, "nnz": int(nnz),
               "results": results}, open(out_path, "w"), indent=1)
    print("best packed:", json.dumps(results[0]))


if __name__ == "__main__":
    if os.environ.get("GLT_SWEEP_PACKED"):
        sweep_packed()
    else:
        main()
