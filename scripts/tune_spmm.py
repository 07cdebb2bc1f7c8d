"""Autotune the banded Pallas SpMM kernel: sweep (R, WT) on the real
device over a representative RCM-reordered kNN graph, write the best
config to scripts/spmm_tuned.json (bench.py picks it up when present).

Usage: python scripts/tune_spmm.py [n_exp] [k] [d]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = 1 << int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 17
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    from scipy.spatial import cKDTree
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    from graphlearning_tpu.ops.pallas_spmm import plan_banded, banded_spmm

    rs = np.random.RandomState(0)
    pts = rs.rand(n, 2)
    dist, ind = cKDTree(pts).query(pts, k=k + 1, workers=-1)
    dist, ind = dist[:, 1:], ind[:, 1:]
    w = np.exp(-4 * dist**2 / np.maximum(dist[:, -1:] ** 2, 1e-12))
    rows = np.repeat(np.arange(n), k)
    W = sp.csr_matrix((w.ravel(), (rows, ind.ravel())), shape=(n, n))
    W = (W + W.T) / 2
    perm = np.asarray(reverse_cuthill_mckee(W, symmetric_mode=True))
    W = W[perm][:, perm].tocsr()
    deg = np.diff(W.indptr).astype(np.int32)
    kmax = int(deg.max())
    cols_np = np.repeat(np.arange(n, dtype=np.int32)[:, None], kmax, axis=1)
    vals_np = np.zeros((n, kmax), np.float32)
    r2 = np.repeat(np.arange(n), deg)
    slot = np.arange(W.indptr[-1]) - np.repeat(W.indptr[:-1], deg)
    cols_np[r2, slot] = W.indices
    vals_np[r2, slot] = W.data

    cols = jnp.asarray(cols_np)
    vals = jnp.asarray(vals_np)
    X = jnp.asarray(rs.randn(n, d).astype(np.float32))
    ref = W @ np.asarray(X, np.float64)

    results = []
    for R, WT in [(1024, 512), (512, 512), (512, 1024), (256, 512),
                  (256, 256), (128, 512), (128, 256)]:
        if n % max(R, WT):
            continue
        try:
            winstart, rr, _, Wwin = plan_banded(cols_np, R=R, WT=WT)
            f = jax.jit(lambda c, v, ws, X, R=R, WT=WT, Wwin=Wwin:
                        banded_spmm(c, v, ws, X, W=Wwin, R=R, WT=WT))
            ws = jnp.asarray(winstart)
            out = f(cols, vals, ws, X)
            out.block_until_ready()
            err = float(np.abs(np.asarray(out) - ref).max())
            iters = 30
            t0 = time.perf_counter()
            Y = X
            for _ in range(iters):
                Y = f(cols, vals, ws, Y)
            Y.block_until_ready()
            eps = W.nnz * iters / (time.perf_counter() - t0)
            results.append({"R": R, "WT": WT, "W": Wwin,
                            "residual": int(len(rr)),
                            "max_err": err, "edges_per_sec": eps})
            print(f"R={R} WT={WT} W={Wwin} resid={len(rr)} err={err:.1e} "
                  f"{eps:.3e} edges/s", flush=True)
        except Exception as e:
            print(f"R={R} WT={WT}: FAILED {type(e).__name__}: {e}",
                  flush=True)
    if not results:
        print("no config succeeded")
        return
    best = max(results, key=lambda r: r["edges_per_sec"])
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "spmm_tuned.json")
    with open(out_path, "w") as fh:
        json.dump({"best": best, "all": results,
                   "graph": {"n": n, "k": k, "d": d}}, fh, indent=1)
    print("best:", best, "->", out_path)


if __name__ == "__main__":
    main()
