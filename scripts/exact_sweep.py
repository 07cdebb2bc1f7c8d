"""Exact-CG-grade packed-SpMM sweep (round-4 verdict item 3).

The exact mode (bf16x3: f32 band split hi/lo in-kernel, 3 MXU passes)
is traffic-proportional to the bf16 mode at the same geometry — its 4
B/cell band stream is 2x the bf16 stream, which is exactly the measured
1.37e9 -> 0.91e9 e/s gap.  The lever the bf16-tuned geometry leaves on
the table: with a 4 B band, pushing sparse tiles into the f32 residual
gather pays off at HALF the occupancy threshold, so the exact optimum
wants a higher ``min_edges_per_tile`` / tighter ``kcap`` than the bf16
optimum.  This sweeps (R, S, min_edges_per_tile, kcap_max) in bf16x3 on
the Hilbert-ordered headline graph and records edges/s + measured
rel_err (vs one scipy f64 SpMM).

Usage: python scripts/exact_sweep.py [--iters 20] [--quick]
Writes scripts/exact_sweep_results.json; updates spmm_tuned.json's
best_packed_exact_hilbert when a config beats it.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def main():
    import scipy.sparse as sp
    from scipy.spatial import cKDTree
    from graphlearning_tpu.core.sparse import SparseGraph
    from graphlearning_tpu.ops.accel import hilbert_order_2d
    import functools
    from graphlearning_tpu.ops.pallas_spmm import (
        apply_residual, band_tiles_spmm_packed, band_tiles_spmm_packed_i8,
        band_tiles_spmm_packed_rowq, build_residual_ell,
        materialize_band_tiles, pack_band, pack_tiles, plan_tiles,
        quantize_band_i8, quantize_band_rowq)
    from graphlearning_tpu.parallel.shard import pad_graph_to

    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--mode", default="bf16x3",
                   choices=["bf16x3", "bf16", "bf16i8", "rowq2"],
                   help="bf16x3 = exact-grade sweep; bf16 = fast-mode "
                        "(bf16 band + bf16 X) headline re-sweep; bf16i8 "
                        "= exact-grade 3 B/cell band (bf16 hi + int8 lo); "
                        "rowq2 = exact-grade 2 B/cell row-quantized "
                        "2-plane int8 band (single stream)")
    args = p.parse_args()
    iters = args.iters
    MODE = args.mode
    XDT = "bf16" if MODE == "bf16" else "f32"

    n = int(os.environ.get("GLT_BENCH_N", 1 << 18))
    k = int(os.environ.get("GLT_BENCH_K", 16))
    d = int(os.environ.get("GLT_BENCH_D", 128))

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
    X_np = rs.randn(n, d).astype(np.float32)
    Y1_ref = (W @ X_np.astype(np.float64))
    y1max = np.abs(Y1_ref).max()

    if args.quick:
        grid = [(384, 128, 6, 1, None)]
    elif MODE == "bf16":
        # fast-mode re-sweep: residual-push is known counterproductive
        # (exact sweep), so just widen the geometry grid
        grid = []
        for R in (256, 384, 512, 768):
            for S in (4, 6, 8, 12):
                grid.append((R, 128, S, 1, None))
    elif MODE == "bf16i8":
        # 3 B/cell band shifts the traffic balance toward the X stream,
        # so sweep geometry around both the bf16 and bf16x3 optima
        grid = []
        for R in (256, 384, 512):
            for S in (6, 8, 12):
                grid.append((R, 128, S, 1, None))
    elif MODE == "rowq2":
        grid = []
        for R in (256, 384, 512):
            for S in (12, 16):
                grid.append((R, 128, S, 1, None))
    else:
        # X traffic = #kept-tiles * WT * d (S only pads slabs), so the
        # sweep leans on R (row granularity) and min_edges_per_tile /
        # kcap (dense-vs-residual split); S kept near the bf16 optimum
        grid = []
        for R in (256, 384):
            for S in (6, 8):
                for met_mult in (1, 3, 6, 10):
                    for kcap_max in (None, 19):
                        grid.append((R, 128, S, met_mult, kcap_max))

    results = []
    best = None
    for R, WT, S, met_mult, kcap_max in grid:
        try:
            gp = pad_graph_to(g, max(R, WT))
            X = jnp.asarray(X_np)
            if gp.n != g.n:
                X = jnp.pad(X, ((0, gp.n - g.n), (0, 0)))
            met = max(8, int(R * WT * 4 / 700e9 / 40e-9)) * met_mult
            tb, ts, bf, rrows, rslots, kcap = plan_tiles(
                np.asarray(gp.cols), R=R, WT=WT, deg=np.asarray(gp.deg),
                kcap_max=kcap_max, min_edges_per_tile=met)
            resid_frac = len(rrows) / max(1, nnz)
            if resid_frac > 0.25:
                continue          # residual gather would dominate
            resid = build_residual_ell(
                rrows, rslots, np.asarray(gp.cols),
                np.asarray(gp.vals).astype(np.float32), gp.n)
            sb, sts, sbf, src = pack_tiles(tb, ts, bf, S)
            slabs = (jnp.asarray(sb), jnp.asarray(sts), jnp.asarray(sbf))
            G = len(sb)
            bdt = jnp.bfloat16 if MODE == "bf16" else jnp.float32
            _m = jax.jit(lambda c, v, tb_, ts_: materialize_band_tiles(
                c, v, tb_, ts_, R=R, WT=WT, out_dtype=bdt))
            b0 = _m(gp.cols[:, :kcap], gp.vals[:, :kcap], jnp.asarray(tb),
                    jnp.asarray(ts))
            band = pack_band(b0, src, R=R, WT=WT)
            b0.delete()

            if MODE == "bf16i8":
                hi, qlo = jax.jit(quantize_band_i8)(band)
                jax.block_until_ready(qlo)
                band.delete()
                band = (hi, qlo)

                @jax.jit
                def run(hi_, q_, sb_, sts_, sbf_, resid_, Xf):
                    out = band_tiles_spmm_packed_i8(
                        hi_, q_, sb_, sts_, sbf_, Xf, n=gp.n, R=R,
                        WT=WT, S=S)
                    return apply_residual(out, Xf, resid_)

                fn = lambda Xc: run(*band, *slabs, resid, Xc)
            elif MODE == "rowq2":
                row_of = jnp.asarray(
                    np.repeat(np.asarray(sb, np.int64) * R, R)
                    + np.tile(np.arange(R), len(sb)))
                qband, srow = jax.jit(functools.partial(
                    quantize_band_rowq, n=gp.n, planes=2))(band, row_of)
                jax.block_until_ready(qband)
                band.delete()
                band = (qband, srow)

                @jax.jit
                def run(q_, s_, sb_, sts_, sbf_, resid_, Xf):
                    out = band_tiles_spmm_packed_rowq(
                        q_, s_, sb_, sts_, sbf_, Xf, n=gp.n, R=R,
                        WT=WT, S=S, planes=2)
                    return apply_residual(out, Xf, resid_)

                fn = lambda Xc: run(*band, *slabs, resid, Xc)
            else:
                @jax.jit
                def run(band_, sb_, sts_, sbf_, resid_, Xf):
                    Xc = Xf.astype(jnp.bfloat16) if XDT == "bf16" else Xf
                    out = band_tiles_spmm_packed(
                        band_, sb_, sts_, sbf_, Xc, n=gp.n, R=R, WT=WT,
                        S=S, mode=MODE)
                    return apply_residual(out, Xf, resid_)

                fn = lambda Xc: run(band, *slabs, resid, Xc)
            out = fn(X)
            float(jnp.sum(out[0]))
            rel1 = float(np.abs(np.asarray(out[:n]).astype(np.float64)
                                - Y1_ref).max() / y1max)
            out = X
            for _ in range(3):
                out = fn(out)
            float(jnp.sum(out[0]))
            t0 = time.perf_counter()
            Y = X
            for _ in range(iters):
                Y = fn(Y)
            float(jnp.sum(Y[0]))
            dt = (time.perf_counter() - t0) / iters
            eps_s = nnz / dt
            bb = {"bf16": 2, "bf16i8": 3, "rowq2": 2}.get(MODE, 4)
            bx = 2 if XDT == "bf16" else 4
            traffic = (G * (R * S * WT * bb + S * WT * d * bx)
                       + (gp.n // R) * R * d * 4)
            row = {
                "R": R, "WT": WT, "S": S, "kcap": int(kcap),
                "min_edges_per_tile": int(met), "G_slabs": int(G),
                "residual_frac": round(resid_frac, 5),
                "edges_per_s": round(eps_s, 1),
                "rel_err_single": rel1,
                "ms_per_spmm": round(dt * 1e3, 3),
                "bytes_per_edge": round(traffic / nnz, 1),
                "achieved_GBps": round(traffic / dt / 1e9, 1),
            }
            if isinstance(band, tuple):
                for b in band[:2]:
                    b.delete()
            else:
                band.delete()
        except Exception as e:
            row = {"R": R, "WT": WT, "S": S,
                   "min_edges_per_tile_mult": met_mult,
                   "kcap_max": kcap_max,
                   "error": f"{type(e).__name__}: {str(e)[:100]}"}
        print(json.dumps(row), flush=True)
        results.append(row)
        err_bar = 1e-2 if MODE == "bf16" else 5e-5
        if "edges_per_s" in row and row["rel_err_single"] < err_bar and (
                best is None or row["edges_per_s"] > best["edges_per_s"]):
            best = row

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        {"bf16x3": "exact_sweep_results.json",
         "bf16i8": "exact_i8_sweep_results.json",
         "rowq2": "exact_rowq_sweep_results.json"}.get(
             MODE, "bf16_sweep_results.json"))
    json.dump({"n": n, "k": k, "d": d, "nnz": int(nnz), "iters": iters,
               "results": results, "best": best},
              open(out_path, "w"), indent=1)
    print("# best:", json.dumps(best), flush=True)

    if best and not args.quick and MODE in ("bf16x3", "bf16i8", "rowq2"):
        tpath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "spmm_tuned.json")
        tuned = json.load(open(tpath))
        prev = tuned.get("best_packed_exact_hilbert", {})
        if best["edges_per_s"] > prev.get("edges_per_s", 0):
            tuned["best_packed_exact_hilbert"] = {
                "R": best["R"], "WT": best["WT"], "S": best["S"],
                "mode": MODE, "x_dtype": "f32",
                "kcap_max": best["kcap"],
                "min_edges_per_tile": best["min_edges_per_tile"],
                "edges_per_s": best["edges_per_s"],
                "bytes_per_edge": best["bytes_per_edge"],
                "note": ("exact-grade sweep over (R,S,min_edges_per_tile,"
                         "kcap) on the Hilbert ordering, round 5; "
                         f"rel_err_single {best['rel_err_single']:.1e}"),
            }
            json.dump(tuned, open(tpath, "w"), indent=1)
            print("# spmm_tuned.json best_packed_exact_hilbert updated",
                  flush=True)


if __name__ == "__main__":
    main()
