"""Real-TPU smoke for the partitioned tiled-band SpMM (round-2 verdict
item 7): run ``ShardedBandPlan`` NON-interpret on the real chip at
R=WT=512 and check against scipy, including a tile list with trailing
no-op padding tiles (the pattern every shard below Gmax uses on a
multi-device mesh) — this validates on hardware that the padded tiles'
repeat-last-block scheme accumulates zero instead of corrupting a
revisited output window (ADVICE r2 high).

Usage: python scripts/tpu_band_smoke.py   (on the TPU backend)
Appends one JSON line to stdout.
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
from jax.sharding import Mesh


def rcm_knn(n, k=10, seed=0):
    rs = np.random.RandomState(seed)
    pts = rs.rand(n, 2)
    dist, ind = cKDTree(pts).query(pts, k=k + 1)
    dist, ind = dist[:, 1:], ind[:, 1:]
    w = np.exp(-4 * dist**2 / np.maximum(dist[:, -1:] ** 2, 1e-12))
    rows = np.repeat(np.arange(n), k)
    W = sp.csr_matrix((w.ravel(), (rows, ind.ravel())), shape=(n, n))
    W = (W + W.T) / 2
    perm = np.asarray(reverse_cuthill_mckee(W, symmetric_mode=True))
    return W[perm, :][:, perm].tocsr()


def main():
    assert jax.default_backend() != "cpu", (
        "run on the TPU backend (no JAX_PLATFORMS override)")
    from graphlearning_tpu.parallel.band_shard import (
        ShardedBandPlan, build_band_partition)
    from graphlearning_tpu.ops.pallas_spmm import band_tiles_spmm

    n = 1 << 15
    W = rcm_knn(n)
    rs = np.random.RandomState(1)
    X = rs.randn(n, 128).astype(np.float32)
    ref = W @ X

    results = {}

    # 1) non-interpret ShardedBandPlan at R=WT=512 on a 1-device mesh
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("nodes",))
    t0 = time.perf_counter()
    plan = ShardedBandPlan(W, mesh, R=512, WT=512, mode="bf16x3",
                           interpret=False)
    out = np.asarray(plan.spmm(X))[:n, :128]
    dt = time.perf_counter() - t0
    err = float(np.abs(out - ref).max() / np.abs(ref).max())
    results["sharded_band_plan"] = {
        "rel_err": err, "build_plus_first_call_s": round(dt, 2),
        "G": plan.G, "H": plan.H, "B": plan.B,
        "residual_edges": int(len(plan.res_rows))}
    assert err < 5e-3, err

    # 2) padded tile list: append Gpad no-op tiles repeating the last
    #    (block, start) with zero band — the multi-shard padding pattern.
    #    On real TPU a revisit of block 0 here would corrupt the output.
    part = build_band_partition(W, Pn=1, R=512, WT=512,
                                band_dtype=np.float32)
    G = part.G
    Gpad = 8
    band = np.concatenate(
        [part.band, np.zeros((Gpad * 512, 512), np.float32)])
    tb = np.concatenate([part.tb, np.full(Gpad, part.tb[-1], np.int32)])
    ts = np.concatenate([part.ts, np.full(Gpad, part.ts[-1], np.int32)])
    bf = np.concatenate([part.bf, np.zeros(Gpad, np.int32)])
    Xp = np.zeros((part.B + 2 * part.H, 128), np.float32)
    Xp[part.H:part.H + n] = X
    fn = jax.jit(lambda band, tb, ts, bf, Xl: band_tiles_spmm(
        band, tb, ts, bf, Xl, n=part.B, R=512, WT=512, mode="bf16x3"))
    out2 = np.asarray(fn(jnp.asarray(band), jnp.asarray(tb),
                         jnp.asarray(ts), jnp.asarray(bf),
                         jnp.asarray(Xp)))[:n]
    # the partition's column space is halo-shifted by H
    err2 = float(np.abs(out2 - ref).max() / np.abs(ref).max())
    results["padded_tile_list"] = {"rel_err": err2, "G": G, "Gpad": Gpad}
    assert err2 < 5e-3, err2

    # 3) full MODEL fit through the banded sharded operator, non-interpret
    #    (Distributor auto-selects the band on TPU; agreement vs the
    #    unsharded fit and vs the f64 scipy gauge)
    import graphlearning_tpu as gl

    labels = (np.random.RandomState(2).rand(n) > 0.5).astype(int)
    train_ind = np.random.RandomState(3).choice(n, 40, replace=False)
    cfg = gl.GLTConfig(mesh_shape=(1,), mesh_axes=("nodes",),
                       sharded_kernel="banded")
    m_sh = gl.ssl.poisson(W, tol=1e-8).distribute(cfg)
    t0 = time.perf_counter()
    pred_sh = m_sh.fit_predict(train_ind, labels[train_ind])
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    pred_sh = m_sh.fit_predict(train_ind, labels[train_ind])
    warm = time.perf_counter() - t0
    pred_un = gl.ssl.poisson(W, tol=1e-8).fit_predict(train_ind,
                                                      labels[train_ind])
    agree = float(np.mean(pred_sh == pred_un))
    results["banded_model_fit"] = {"agree_vs_unsharded": agree,
                                   "cold_s": round(cold, 2),
                                   "warm_s": round(warm, 3)}
    assert agree > 0.99, agree

    print(json.dumps({"tpu_band_smoke": "ok", "backend": jax.default_backend(),
                      **results}))


if __name__ == "__main__":
    main()
