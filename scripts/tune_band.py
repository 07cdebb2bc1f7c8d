"""Autotune the materialized-band streaming SpMM (the solver fast path).

Sweeps (R, WT, band dtype, matmul mode) on the real device over the same
representative RCM kNN graph as tune_spmm.py, measuring dispatch-to-value
of the full hybrid (band stream + regrouped residual).  The band stream is
memory-bound (n*W*bytes per call), so the main levers are the band dtype
(f32 vs bf16 halves the bytes) and the row-block R (x tiles are re-read
(n/R) times; bigger R cuts that overhead).

Updates the best_band* entries of scripts/spmm_tuned.json in place.

Usage: python scripts/tune_band.py [n_exp] [k] [d]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = 1 << int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 18
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    from scipy.spatial import cKDTree
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    from graphlearning_tpu.core.sparse import SparseGraph
    from graphlearning_tpu.ops.pallas_spmm import (
        plan_banded, materialize_band, spmm_band_hybrid, build_residual_ell)

    rs = np.random.RandomState(0)
    pts = rs.rand(n, 2)
    dist, ind = cKDTree(pts).query(pts, k=k + 1, workers=-1)
    dist, ind = dist[:, 1:], ind[:, 1:]
    w = np.exp(-4 * dist**2 / np.maximum(dist[:, -1:] ** 2, 1e-12))
    rows = np.repeat(np.arange(n), k)
    Wm = sp.csr_matrix((w.ravel(), (rows, ind.ravel())), shape=(n, n))
    Wm = (Wm + Wm.T) / 2
    perm = np.asarray(reverse_cuthill_mckee(Wm, symmetric_mode=True))
    Wm = Wm[perm][:, perm].tocsr()
    Wm = (sp.diags(1.0 / np.asarray(Wm.sum(1)).ravel()) @ Wm).tocsr()
    nnz = Wm.nnz

    g = SparseGraph.from_scipy(Wm, dtype=jnp.float32)
    deg_np = np.asarray(g.deg)
    cols_np = np.asarray(g.cols)
    vals_np = np.asarray(g.vals)
    X = jnp.asarray(rs.randn(n, d).astype(np.float32))
    ref = Wm @ np.asarray(X, np.float64)
    refmax = np.abs(ref).max()

    results = []
    grid = [(512, 512), (1024, 512), (1024, 1024), (512, 1024), (2048, 512)]
    for R, WT in grid:
        if n % max(R, WT):
            continue
        try:
            winstart, rr, rsl, Wwin, kcap = plan_banded(
                cols_np, R=R, WT=WT, max_residual=0.002, deg=deg_np,
                kcap_max=32)
        except Exception as e:
            print(f"R={R} WT={WT}: plan FAILED {e}", flush=True)
            continue
        resid = build_residual_ell(rr, rsl, cols_np, vals_np, g.n)
        plan = (winstart, rr, rsl, Wwin, kcap)
        for band_dtype in (jnp.float32, jnp.bfloat16):
            try:
                t0 = time.perf_counter()
                band = materialize_band(
                    g.cols[:, :kcap], g.vals[:, :kcap],
                    jnp.asarray(winstart), Wwin, R=R, WT=WT,
                    out_dtype=band_dtype)
                band.block_until_ready()
                t_build = time.perf_counter() - t0
            except Exception as e:
                print(f"R={R} WT={WT} dtype={band_dtype.__name__}: build "
                      f"FAILED {str(e).splitlines()[0][:100]}", flush=True)
                continue
            modes = ("bf16",) if band_dtype == jnp.bfloat16 else (
                "f32", "bf16x3", "bf16")
            for mode in modes:
                try:
                    f = jax.jit(lambda b, Xv, R=R, WT=WT, mode=mode:
                                spmm_band_hybrid(b, g, Xv, plan, R=R, WT=WT,
                                                 mode=mode, resid=resid))
                    out = f(band, X)
                    err = float(np.abs(np.asarray(out) - ref).max() / refmax)
                    iters = 20
                    t0 = time.perf_counter()
                    Y = X
                    for _ in range(iters):
                        Y = f(band, Y)
                    float(jnp.sum(Y[0]))
                    eps = nnz * iters / (time.perf_counter() - t0)
                    rec = {"R": R, "WT": WT, "W": Wwin, "kcap": kcap,
                           "mode": mode, "band_dtype": band_dtype.__name__,
                           "max_residual": 0.002, "residual": int(len(rr)),
                           "rel_err": err, "band_build_s": t_build,
                           "edges_per_sec": eps}
                    results.append(rec)
                    print(f"R={R} WT={WT} W={Wwin} kcap={kcap} "
                          f"band={band_dtype.__name__} mode={mode} "
                          f"err={err:.1e} build={t_build:.2f}s "
                          f"{eps:.3e} edges/s", flush=True)
                except Exception as e:
                    print(f"R={R} WT={WT} mode={mode}: FAILED "
                          f"{str(e).splitlines()[0][:100]}", flush=True)
            del band

    if not results:
        print("no config succeeded")
        return
    pick = lambda rs_: max(rs_, key=lambda r: r["edges_per_sec"]) if rs_ else None
    best = pick([r for r in results if r["rel_err"] < 5e-5])
    best_exact = pick([r for r in results if r["rel_err"] < 1e-6])
    best_fast = pick(results)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "spmm_tuned.json")
    cfg = {}
    if os.path.exists(out_path):
        cfg = json.load(open(out_path))
    note = f"materialized band, n={n} k={k} d={d} (tune_band.py)"
    for key, rec in (("best_band", best), ("best_band_exact", best_exact),
                     ("best_band_fast", best_fast)):
        if rec is not None:
            cfg[key] = {**rec, "note": note}
    cfg["band_all"] = results
    with open(out_path, "w") as fh:
        json.dump(cfg, fh, indent=1)
    print("best_band:", best, "->", out_path)


if __name__ == "__main__":
    main()
