"""End-to-end CG validation of the rowq2 exact-grade kernel.

Solves (I - 0.9 W) u = b on the headline Hilbert graph (n=262144 k=16,
row-stochastic W — the randomwalk-model system shape, reference
ssl.py:1765-1793) three ways:
  scipy f64 CG (ground truth), device CG with the bf16x3 matvec, and
  device CG with the rowq2 (2-plane int8) matvec,
and reports iterations + final solution error vs the f64 solve.  This
is the measured backing for calling a ~5e-5 matvec "exact-CG grade":
CG converges at the same rate and the solution error lands at the
matvec-error floor, far below any model-accuracy threshold.

Run: python scripts/rowq_cg_validation.py   (real TPU; ~2 min)
"""
import functools
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
    from graphlearning_tpu.parallel.shard import pad_graph_to
    from graphlearning_tpu.ops.pallas_spmm import (
        apply_residual, band_tiles_spmm_packed,
        band_tiles_spmm_packed_rowq, build_residual_ell,
        materialize_band_tiles, pack_band, pack_tiles, plan_tiles,
        quantize_band_rowq)

    n, k, d = 1 << 18, 16, 8      # 8 logical RHS; device pads to 128 lanes
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
    alpha = 0.9
    b_np = rs.randn(n, d)

    # ground truth: host f64 CG on (I - alpha W) u = b  (not symmetric
    # after row normalization, but diagonally dominant — plain CG on the
    # symmetrized operator semantics the models use; use direct-ish
    # tolerance via scipy gmres-free CG on the normal system is
    # overkill: the row-stochastic W here is similar to a symmetric one
    # (D^{-1}W_sym), so CG converges; we use it identically in all
    # three solvers so the comparison is apples-to-apples)
    def cg_host(matvec, b, tol, max_iter=400):
        u = np.zeros_like(b)
        r = b - matvec(u)
        p = r.copy()
        rs0 = (r * r).sum(0)
        it = 0
        while it < max_iter and np.sqrt(rs0.max()) > tol:
            Ap = matvec(p)
            a = rs0 / (p * Ap).sum(0)
            u += a * p
            r -= a * Ap
            rs1 = (r * r).sum(0)
            p = r + (rs1 / rs0) * p
            rs0 = rs1
            it += 1
        return u, it, float(np.sqrt(rs0.max()))

    A_host = lambda u: u - alpha * (W @ u)
    t0 = time.perf_counter()
    u_ref, it_ref, res_ref = cg_host(A_host, b_np, 1e-10)
    t_ref = time.perf_counter() - t0
    uscale = np.abs(u_ref).max()
    print(f"f64 host CG: {it_ref} iters, residual {res_ref:.1e}, "
          f"{t_ref:.2f}s", flush=True)

    # device operators at the tuned exact geometry
    R, WT, S = 256, 128, 12
    gp = pad_graph_to(SparseGraph.from_scipy(W, dtype=jnp.float32),
                      max(R, WT))
    met = max(8, int(R * WT * 4 / 700e9 / 40e-9))
    tb, ts, bf, rrows, rslots, kcap = plan_tiles(
        np.asarray(gp.cols), R=R, WT=WT, deg=np.asarray(gp.deg),
        min_edges_per_tile=met)
    resid = build_residual_ell(rrows, rslots, np.asarray(gp.cols),
                               np.asarray(gp.vals).astype(np.float32),
                               gp.n)
    sb, sts, sbf, src = pack_tiles(tb, ts, bf, S)
    b0 = materialize_band_tiles(gp.cols[:, :kcap], gp.vals[:, :kcap],
                                jnp.asarray(tb), jnp.asarray(ts), R=R,
                                WT=WT, out_dtype=jnp.float32)
    packed = pack_band(b0, src, R=R, WT=WT)
    b0.delete()
    slabs = (jnp.asarray(sb), jnp.asarray(sts.reshape(-1)),
             jnp.asarray(sbf))
    row_of = jnp.asarray(np.repeat(sb.astype(np.int64) * R, R)
                         + np.tile(np.arange(R), len(sb)))
    qband, srow = jax.jit(functools.partial(
        quantize_band_rowq, n=gp.n, planes=2))(packed, row_of)
    jax.block_until_ready(qband)

    # the packed kernels require d % 128 == 0 (lane width): pad the RHS
    # block with zero columns; the zero columns converge trivially
    b_dev = jnp.asarray(np.pad(b_np, ((0, gp.n - n), (0, 128 - d))
                               ).astype(np.float32))

    def make_cg(spmm):
        # operator arrays enter as jit ARGUMENTS: closed-over device
        # constants are serialized into the remote-compile payload
        # (HTTP 413 — same gotcha as bench.py)
        @jax.jit
        def cg_dev(bv, *op):
            def A(u):
                return u - alpha * spmm(u, *op)

            u = jnp.zeros_like(bv)
            r = bv - A(u)
            p = r
            rs0 = jnp.sum(r * r, axis=0)

            def cond(c):
                _, _, _, rs0, it = c
                return jnp.logical_and(it < 400,
                                       jnp.sqrt(jnp.max(rs0)) > 1e-6)

            def body(c):
                u, r, p, rs0, it = c
                Ap = A(p)
                den = jnp.sum(p * Ap, axis=0)
                # zero-padded RHS columns: rs0 = den = 0 -> step 0
                a = jnp.where(rs0 > 0,
                              rs0 / jnp.where(den != 0, den, 1.0), 0.0)
                u = u + a * p
                r = r - a * Ap
                rs1 = jnp.sum(r * r, axis=0)
                beta = jnp.where(rs0 > 0, rs1 / jnp.where(rs0 > 0, rs0, 1.0), 0.0)
                p = r + beta * p
                return u, r, p, rs1, it + 1

            u, r, p, rs0, it = jax.lax.while_loop(
                cond, body, (u, r, p, rs0, jnp.int32(0)))
            return u, it, jnp.sqrt(jnp.max(rs0))
        return cg_dev

    def spmm_rowq(u, qband, srow, sb_, sts_, sbf_, resid):
        out = band_tiles_spmm_packed_rowq(
            qband, srow, sb_, sts_, sbf_, u, n=gp.n, R=R, WT=WT, S=S,
            planes=2)
        return apply_residual(out, u, resid)

    def spmm_bf16x3(u, band, sb_, sts_, sbf_, resid):
        out = band_tiles_spmm_packed(
            band, sb_, sts_, sbf_, u, n=gp.n, R=R, WT=WT, S=S,
            mode="bf16x3")
        return apply_residual(out, u, resid)

    ops = {"bf16x3": (spmm_bf16x3, (packed, *slabs, resid)),
           "rowq2": (spmm_rowq, (qband, srow, *slabs, resid))}
    for name in ("bf16x3", "rowq2"):
        spmm, op = ops[name]
        cg = make_cg(spmm)
        u_d, it_d, res_d = cg(b_dev, *op)     # compile+run
        u_d, it_d, res_d = cg(b_dev, *op)     # warm repeat
        t0 = time.perf_counter()
        u_d, it_d, res_d = cg(b_dev, *op)
        u_h = np.asarray(u_d[:n, :d]).astype(np.float64)
        t_d = time.perf_counter() - t0
        err = np.abs(u_h - u_ref).max() / uscale
        print(f"{name} device CG: {int(it_d)} iters, residual "
              f"{float(res_d):.1e}, sol err vs f64 {err:.2e}, {t_d:.2f}s"
              f" ({t_ref/t_d:.1f}x vs host f64)", flush=True)


if __name__ == "__main__":
    main()
