"""Worker for the simulated multi-host test (tests/test_multihost.py).

Run as: python scripts/multihost_worker.py <process_id> <num_processes> <port>

Each process gets 2 virtual CPU devices; the two processes connect over
the loopback "DCN" via ``jax.distributed`` (coordinator on process 0) —
exercising ``parallel.initialize_distributed`` plus a cross-process
sharded SpMM (SURVEY.md §4(d): simulated multi-host CPU tests)."""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_enable_x64", True)


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    from graphlearning_tpu.parallel import initialize_distributed

    initialize_distributed(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    ndev = jax.device_count()
    assert ndev == 2 * nproc, ndev

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from graphlearning_tpu.core.sparse import SparseGraph

    # deterministic graph, identical on every process
    rs = np.random.RandomState(0)
    n, k, d = 256, 6, 8
    X = rs.randn(n, d)
    D2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(D2, axis=1)[:, 1:k + 1].astype(np.int32)
    w = np.exp(-D2[np.arange(n)[:, None], idx])
    import scipy.sparse as sp

    rows = np.repeat(np.arange(n), k)
    W = sp.coo_matrix((w.ravel(), (rows, idx.ravel())), shape=(n, n)).tocsr()
    W = (W + W.T) / 2

    mesh = Mesh(np.asarray(jax.devices()).reshape(ndev, 1),
                axis_names=("nodes", "batch"))
    sh_row = NamedSharding(mesh, P("nodes", None))
    sh_vec = NamedSharding(mesh, P("nodes"))

    cols_np, vals_np, deg_np = SparseGraph.ell_from_scipy(W)

    lo, hi = pid * (n // nproc), (pid + 1) * (n // nproc)

    def put(a, sh):
        # global array assembled from each process's OWN row block
        return jax.make_array_from_process_local_data(
            sh, np.ascontiguousarray(a[lo:hi]), global_shape=a.shape)

    g = SparseGraph(cols=put(cols_np, sh_row),
                    vals=put(vals_np, sh_row),
                    deg=put(deg_np, sh_vec), n=n, k=k)
    F = put(X.astype(np.float64), sh_row)

    from graphlearning_tpu.ops import graphops as ops
    import functools

    # pin the output row-sharded so each process can check its own shards
    out = jax.jit(ops.spmm, out_shardings=sh_row)(g, F)
    ref = W @ X
    checked = 0
    for s in out.addressable_shards:
        rows = ref[s.index[0]]
        np.testing.assert_allclose(np.asarray(s.data), rows,
                                   rtol=1e-10, atol=1e-12)
        checked += rows.shape[0]
    assert checked == n // nproc, (checked, n, nproc)

    # cross-process psum through a sharded reduction
    total = float(jnp.sum(out))
    np.testing.assert_allclose(total, ref.sum(), rtol=1e-10)

    # partitioned tiled-band SpMM with ppermute halo exchange CROSSING the
    # process boundary (the pod-scale hot path, parallel/band_shard.py):
    # the partition is built host-side identically on every process; each
    # process contributes its own row block of every array
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    from graphlearning_tpu.parallel.band_shard import (ShardedOp,
                                                       build_band_partition)

    perm = np.asarray(reverse_cuthill_mckee(W, symmetric_mode=True))
    Wp = W[perm, :][:, perm].tocsr()
    part = build_band_partition(Wp, Pn=ndev, R=8, WT=8, interpret=True,
                                band_dtype=np.float64)
    mesh1 = Mesh(np.asarray(jax.devices()), ("nodes",))
    sh_r = NamedSharding(mesh1, P("nodes", None))
    sh_f = NamedSharding(mesh1, P("nodes"))
    sh_rep = NamedSharding(mesh1, P())

    def put_g(a, sh):
        if sh is sh_rep:
            return jax.make_array_from_process_local_data(
                sh, np.ascontiguousarray(a), global_shape=a.shape)
        per = a.shape[0] // nproc
        return jax.make_array_from_process_local_data(
            sh, np.ascontiguousarray(a[pid * per:(pid + 1) * per]),
            global_shape=a.shape)

    res = None
    if len(part.res_rows):
        res = (put_g(part.res_rows, sh_rep), put_g(part.res_cols, sh_rep),
               put_g(part.res_vals.astype(np.float64), sh_rep))
    op = ShardedOp(
        g=None,
        band=put_g(part.band, sh_r), tb=put_g(part.tb, sh_f),
        ts=put_g(part.ts, sh_f), bf=put_g(part.bf, sh_f), res=res,
        meta=(mesh1, "nodes", part.Pn, part.B, part.H, part.R, part.WT,
              part.G, "f64", True))
    Xb = np.zeros((part.n_pad, d))
    Xb[:n] = X[perm]
    Xs = put_g(Xb, sh_r)
    band_out = jax.jit(lambda op, X: op.spmm_(X),
                       out_shardings=sh_r)(op, Xs)
    ref_b = Wp @ X[perm]
    for s in band_out.addressable_shards:
        sl = s.index[0]
        rows = np.asarray(s.data)
        start = sl.start or 0
        expect = np.zeros((rows.shape[0], d))
        real = max(0, min(n - start, rows.shape[0]))
        if real > 0:
            expect[:real] = ref_b[start:start + real]
        np.testing.assert_allclose(rows, expect, rtol=1e-9, atol=1e-10)

    print(f"MULTIHOST_OK pid={pid} procs={jax.process_count()} "
          f"devices={ndev} banded_halo=ok", flush=True)


if __name__ == "__main__":
    main()
