"""Band-hostile graph analysis (VERDICT r3 item 1).

Builds the 30-d Gaussian-mixture kNN surrogate (the geometry every model
benchmark runs on) at bench scale and measures, on HOST, what each
format family would cost:

  - RCM band stats (window, occupancy)  [the round-3 loss diagnosis]
  - cluster-order stats: intra-window edge fraction vs window size
  - plan_tiles tile counts / bytes-per-edge under RCM and cluster order

Saves the graph to /tmp/highdim_graph.npz for the kernel benches.
"""
import os
import sys
import time

import numpy as np
import scipy.sparse as sp

n = int(os.environ.get("N", 1 << 18))
k = int(os.environ.get("K", 16))
dim = int(os.environ.get("DIM", 30))
ncls = 10

cache = f"/tmp/highdim_graph_n{n}_k{k}_d{dim}.npz"
if os.path.exists(cache):
    W = sp.load_npz(cache)
    print(f"loaded cached graph {cache}")
else:
    import graphlearning_tpu as gl

    rs = np.random.RandomState(0)
    centers = rs.randn(ncls, dim) * 1.0
    labels = rs.randint(0, ncls, n)
    pts = (centers[labels] + rs.randn(n, dim)).astype(np.float32)
    t0 = time.time()
    W = gl.weightmatrix.knn(pts, k)
    print(f"knn build {time.time()-t0:.1f}s  n={n} nnz={W.nnz}")
    sp.save_npz(cache, W.tocsr())

W = sp.csr_matrix(W)
n = W.shape[0]
nnz = W.nnz
print(f"n={n} nnz={nnz} avg deg={nnz/n:.1f}")

from scipy.sparse.csgraph import reverse_cuthill_mckee

t0 = time.time()
perm = np.asarray(reverse_cuthill_mckee(W, symmetric_mode=True))
inv_rcm = np.argsort(perm)
Wr = W[perm][:, perm].tocsr()
I, J = Wr.nonzero()
bw = np.abs(I - J)
print(f"RCM {time.time()-t0:.1f}s: bandwidth max={bw.max()} "
      f"p50={np.percentile(bw,50):.0f} p90={np.percentile(bw,90):.0f} "
      f"p99={np.percentile(bw,99):.0f}")
for Wwin in (2048, 4096, 8192, 16384):
    frac = float(np.mean(bw < Wwin))
    occ = frac * nnz / (n * Wwin)
    print(f"  RCM window {Wwin}: covers {frac*100:.1f}% of edges, "
          f"occupancy {occ*100:.2f}% -> bf16 {2/max(occ,1e-9):.0f} B/edge")

# cluster ordering (the existing _cluster_order)
sys.path.insert(0, "/root/repo")
from graphlearning_tpu.ops.accel import _cluster_order

for R in (256,):
    t0 = time.time()
    order, pos, n_pad = _cluster_order(W, R, inv_rcm)
    print(f"cluster_order {time.time()-t0:.1f}s: n_pad={n_pad} "
          f"(pad {100*(n_pad-n)/n:.1f}%)")
    Psel = sp.csr_matrix((np.ones(n), (pos, order)), shape=(n_pad, n))
    Wc = (Psel @ W @ Psel.T).tocsr()
    I, J = Wc.nonzero()
    bwc = np.abs(I - J)
    print(f"  cluster-order bandwidth p50={np.percentile(bwc,50):.0f} "
          f"p90={np.percentile(bwc,90):.0f} p99={np.percentile(bwc,99):.0f}")
    for Wwin in (1024, 2048, 4096, 8192):
        frac = float(np.mean(bwc < Wwin))
        occ = frac * nnz / (n_pad * Wwin)
        print(f"  cluster window {Wwin}: covers {frac*100:.1f}%, "
              f"occupancy {occ*100:.2f}% -> bf16 {2/max(occ,1e-9):.0f} B/edge")

    # tiles plan under cluster order
    from graphlearning_tpu.core.sparse import SparseGraph
    from graphlearning_tpu.ops.pallas_spmm import plan_tiles

    cols_np, vals_np, deg_np = SparseGraph.ell_from_scipy(Wc)
    for (Rt, WTt) in ((256, 128), (256, 256), (512, 512)):
        n_pad2 = ((n_pad + max(Rt, WTt) - 1) // max(Rt, WTt)) * max(Rt, WTt)
        if n_pad2 != cols_np.shape[0]:
            colsp = np.full((n_pad2, cols_np.shape[1]), -1, cols_np.dtype)
            colsp[:cols_np.shape[0]] = cols_np
            degp = np.zeros(n_pad2, deg_np.dtype)
            degp[:len(deg_np)] = deg_np
        else:
            colsp, degp = cols_np, deg_np
        try:
            t0 = time.time()
            tb, ts, bf, rrows, rslots, kcap = plan_tiles(
                colsp, R=Rt, WT=WTt, deg=degp, kcap_max=32,
                hbm_budget_bytes=6e9)
            cells = len(tb) * Rt * WTt
            resid_frac = len(rrows) / nnz
            in_tiles = nnz - len(rrows)
            print(f"  tiles({Rt},{WTt}): {len(tb)} tiles, "
                  f"bf16 {2*cells/max(in_tiles,1):.0f} B/edge, "
                  f"resid {resid_frac*100:.2f}% kcap={kcap} "
                  f"[{time.time()-t0:.0f}s]")
        except Exception as e:
            print(f"  tiles({Rt},{WTt}) FAILED: {e}")
