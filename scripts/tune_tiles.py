"""Autotune the compact tiled-band SpMM (R, WT, mode) on the real TPU.

Builds the bench graph ONCE, then times each config in-process.
Writes the winners into scripts/spmm_tuned.json under "best_tiles"
(exact/accurate) and "best_tiles_fast" (bf16).  Run: python scripts/tune_tiles.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    from scipy.spatial import cKDTree
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    from graphlearning_tpu.core.sparse import SparseGraph
    from graphlearning_tpu.parallel.shard import pad_graph_to
    from graphlearning_tpu.ops.pallas_spmm import (
        build_residual_ell, materialize_band_tiles, plan_tiles,
        spmm_tiles_hybrid)

    n = int(os.environ.get("GLT_BENCH_N", 1 << 18))
    k = int(os.environ.get("GLT_BENCH_K", 16))
    d = int(os.environ.get("GLT_BENCH_D", 128))
    iters = int(os.environ.get("GLT_BENCH_ITERS", 30))

    rs = np.random.RandomState(0)
    pts = rs.rand(n, 2)
    tree = cKDTree(pts)
    dist, ind = tree.query(pts, k=k + 1)
    dist, ind = dist[:, 1:], ind[:, 1:]
    w = np.exp(-4 * dist**2 / np.maximum(dist[:, -1:] ** 2, 1e-12))
    rows = np.repeat(np.arange(n, dtype=np.int64), k)
    W = sp.csr_matrix((w.ravel(), (rows, ind.ravel())), shape=(n, n))
    W = (W + W.T) / 2
    perm = np.asarray(reverse_cuthill_mckee(W, symmetric_mode=True))
    W = W[perm, :][:, perm].tocsr()
    W = sp.diags(1.0 / np.asarray(W.sum(1)).ravel()) @ W
    W = W.tocsr()
    nnz = W.nnz
    print(f"# graph ready n={n} nnz={nnz}", flush=True)

    results = []
    for R, WT in [(512, 512), (512, 1024), (1024, 512), (1024, 1024),
                  (256, 512), (2048, 512), (512, 2048)]:
        g = pad_graph_to(SparseGraph.from_scipy(W, dtype=jnp.float32),
                         max(R, WT))
        X = jnp.asarray(rs.randn(g.n, d).astype(np.float32))
        cols_np = np.asarray(g.cols)
        try:
            tb, ts, bf, rr, rsl, kcap = plan_tiles(
                cols_np, R=R, WT=WT, deg=np.asarray(g.deg))
        except AssertionError as e:
            print(f"R={R} WT={WT}: plan failed {e}", flush=True)
            continue
        resid = build_residual_ell(rr, rsl, cols_np,
                                   np.asarray(g.vals).astype(np.float32),
                                   g.n)
        tiles = (jnp.asarray(tb), jnp.asarray(ts), jnp.asarray(bf))
        cells_row = len(tb) * R * WT // g.n
        for mode in ("bf16x3", "bf16"):
            bdt = jnp.bfloat16 if mode == "bf16" else jnp.float32
            try:
                _mat = jax.jit(lambda c, v, tb_, ts_, R=R, WT=WT, bdt=bdt:
                               materialize_band_tiles(c, v, tb_, ts_, R=R,
                                                      WT=WT, out_dtype=bdt))
                band = _mat(g.cols[:, :kcap], g.vals[:, :kcap], tiles[0],
                            tiles[1])
                float(jnp.sum(band[:8, :8].astype(jnp.float32)))
                _fn = jax.jit(lambda b, t, gg, rsd, X, R=R, WT=WT, mode=mode:
                              spmm_tiles_hybrid(b, t, gg, X, R=R, WT=WT,
                                                mode=mode, resid=rsd))
                out = _fn(band, tiles, g, resid, X)
                float(jnp.sum(out[0]))
                Y = X
                for _ in range(3):
                    Y = _fn(band, tiles, g, resid, Y)
                float(jnp.sum(Y[0]))
                t0 = time.perf_counter()
                Y = X
                for _ in range(iters):
                    Y = _fn(band, tiles, g, resid, Y)
                float(jnp.sum(Y[0]))
                dt = time.perf_counter() - t0
                eps = nnz * iters / dt
                print(f"R={R} WT={WT} mode={mode}: {eps:.3e} e/s "
                      f"cells/row={cells_row} resid={len(rr)/nnz:.4f}",
                      flush=True)
                results.append({"R": R, "WT": WT, "mode": mode,
                                "edges_per_sec": eps,
                                "cells_per_row": int(cells_row)})
                band.delete()
            except Exception as e:
                print(f"R={R} WT={WT} mode={mode}: FAILED {type(e).__name__}"
                      f" {str(e)[:200]}", flush=True)

    if not results:
        return
    tuned_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "spmm_tuned.json")
    tuned = json.load(open(tuned_path)) if os.path.exists(tuned_path) else {}
    acc = [r for r in results if r["mode"] != "bf16"]
    fast = [r for r in results if r["mode"] == "bf16"]
    if acc:
        tuned["best_tiles"] = max(acc, key=lambda r: r["edges_per_sec"])
    if fast:
        tuned["best_tiles_fast"] = max(fast, key=lambda r: r["edges_per_sec"])
    tuned["tiles_sweep"] = results
    json.dump(tuned, open(tuned_path, "w"), indent=1)
    print("# wrote", tuned_path, flush=True)


if __name__ == "__main__":
    main()
