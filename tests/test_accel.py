"""Tests for the RCM-accelerated SpMM context (ops/accel.py).

Run in Pallas interpret mode on CPU; on real TPUs the same code path is
engaged automatically by the CG solvers (poisson/laplace/randomwalk)."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

import graphlearning_tpu as gl
from graphlearning_tpu.ops.accel import AccelSpMM


@pytest.fixture(scope="module")
def knn_W():
    rs = np.random.RandomState(0)
    X = rs.rand(900, 2)
    return gl.weightmatrix.knn(X, 10), X


def test_accel_spmm_roundtrip(knn_W):
    W, _ = knn_W
    acc = AccelSpMM(W, interpret=True)
    rs = np.random.RandomState(1)
    X = rs.randn(W.shape[0], 8).astype(np.float32)
    out = acc.from_perm(acc.spmm(acc.to_perm(X)))
    ref = W @ X.astype(np.float64)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_accel_laplacian_matvec(knn_W):
    W, _ = knn_W
    acc = AccelSpMM(W, interpret=True)
    from graphlearning_tpu.core.sparse import SparseGraph
    from graphlearning_tpu.ops import graphops as ops

    g = SparseGraph.from_scipy(W)
    deg_p = acc.to_perm(ops.degree_vector(g).astype(jnp.float32))
    rs = np.random.RandomState(2)
    X = rs.randn(W.shape[0], 4).astype(np.float32)
    for norm in ("combinatorial", "randomwalk", "normalized"):
        mv = acc.laplacian_matvec(norm, deg_p)
        out = acc.from_perm(mv(acc.to_perm(X)))
        ref = np.asarray(ops.laplacian_matvec(g, jnp.asarray(X, jnp.float64),
                                              normalization=norm))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-4)


def test_poisson_accel_path_matches_plain(knn_W, monkeypatch):
    """Force the accel path on (interpret mode, low threshold): predictions
    must match the plain XLA path."""
    W, X = knn_W
    labels = (X[:, 0] > 0.5).astype(int)
    train_ind = gl.trainsets.generate(labels, rate=10, seed=0)

    from graphlearning_tpu.ops import accel as accel_mod

    monkeypatch.setattr(accel_mod, "_MIN_N", 1)
    monkeypatch.setattr(accel_mod, "enabled", lambda: True)
    monkeypatch.setenv("GLT_ACCEL_INTERPRET", "1")
    pred_acc = gl.ssl.poisson(W).fit_predict(train_ind, labels[train_ind])

    monkeypatch.setattr(accel_mod, "enabled", lambda: False)
    pred_plain = gl.ssl.poisson(W).fit_predict(train_ind, labels[train_ind])
    assert np.mean(pred_acc == pred_plain) > 0.995


def test_laplace_accel_path_matches_plain(knn_W, monkeypatch):
    W, X = knn_W
    labels = (X[:, 1] > 0.5).astype(int)
    train_ind = gl.trainsets.generate(labels, rate=10, seed=1)

    from graphlearning_tpu.ops import accel as accel_mod

    monkeypatch.setattr(accel_mod, "_MIN_N", 1)
    monkeypatch.setattr(accel_mod, "enabled", lambda: True)
    monkeypatch.setenv("GLT_ACCEL_INTERPRET", "1")
    for norm in ("combinatorial", "normalized"):
        pred_acc = gl.ssl.laplace(W, normalization=norm).fit_predict(
            train_ind, labels[train_ind])
        monkeypatch.setattr(accel_mod, "enabled", lambda: False)
        pred_plain = gl.ssl.laplace(W, normalization=norm).fit_predict(
            train_ind, labels[train_ind])
        monkeypatch.setattr(accel_mod, "enabled", lambda: True)
        assert np.mean(pred_acc == pred_plain) > 0.995


def test_randomwalk_accel_path_matches_plain(knn_W, monkeypatch):
    W, X = knn_W
    labels = (X[:, 0] + X[:, 1] > 1.0).astype(int)
    train_ind = gl.trainsets.generate(labels, rate=10, seed=2)

    from graphlearning_tpu.ops import accel as accel_mod

    monkeypatch.setattr(accel_mod, "_MIN_N", 1)
    monkeypatch.setattr(accel_mod, "enabled", lambda: True)
    monkeypatch.setenv("GLT_ACCEL_INTERPRET", "1")
    pred_acc = gl.ssl.randomwalk(W).fit_predict(train_ind, labels[train_ind])
    monkeypatch.setattr(accel_mod, "enabled", lambda: False)
    pred_plain = gl.ssl.randomwalk(W).fit_predict(train_ind,
                                                  labels[train_ind])
    assert np.mean(pred_acc == pred_plain) > 0.995


def test_residual_ell_matches_naive_scatter():
    """build_residual_ell + apply_residual must equal the per-edge
    scatter-add it replaces (including hub rows that spill)."""
    from graphlearning_tpu.ops.pallas_spmm import (
        apply_residual, build_residual_ell)

    rs = np.random.RandomState(3)
    n, k, d, m = 256, 12, 8, 500
    cols_np = rs.randint(0, n, (n, k))
    vals_np = rs.rand(n, k).astype(np.float32)
    rrows = rs.randint(0, n, m)
    rrows[:50] = 7          # hub row with many residual edges -> spill
    rslots = rs.randint(0, k, m)
    X = jnp.asarray(rs.randn(n, d).astype(np.float32))

    resid = build_residual_ell(rrows, rslots, cols_np, vals_np, n)
    out = apply_residual(jnp.zeros((n, d), jnp.float32), X, resid)

    ref = np.zeros((n, d))
    for r, s in zip(rrows, rslots):
        ref[r] += vals_np[r, s] * np.asarray(X)[cols_np[r, s]]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_cluster_ordering_on_cluster_graph():
    """A kNN graph of clustered embeddings (RCM-hostile) must still solve
    correctly through AccelSpMM — exercising the cluster-aligned ordering
    with interior padding rows."""
    rs = np.random.RandomState(1)
    n, ncls = 8192, 4
    centers = rs.randn(ncls, 8) * 4.0
    labels = rs.randint(0, ncls, n)
    pts = centers[labels] + rs.randn(n, 8)
    W, _ = gl.weightmatrix.knn(pts, 8), None
    acc = AccelSpMM(W, interpret=True, materialize=True)
    X = rs.randn(W.shape[0], 4).astype(np.float32)
    Y = acc.from_perm(acc.spmm(acc.to_perm(jnp.asarray(X))))
    ref = W @ X.astype(np.float64)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(Y) / scale, ref / scale,
                               atol=5e-5)
    # round-trip of the padded permutation maps
    Z = rs.randn(W.shape[0], 3).astype(np.float32)
    back = acc.from_perm(acc.to_perm(jnp.asarray(Z)))
    np.testing.assert_allclose(np.asarray(back), Z)


def test_heat_steps_accel_matches_plain(knn_W):
    """The fused heat-stepping entry point (PoissonMBO fast path) matches
    Ns explicit (I - dt L) u + Db steps."""
    W, _ = knn_W
    from graphlearning_tpu.core.sparse import SparseGraph
    from graphlearning_tpu.ops import graphops as ops

    acc = AccelSpMM(W, interpret=True, exact=False, fast=True)
    g = SparseGraph.from_scipy(W)
    deg = ops.degree_vector(g).astype(jnp.float32)
    n = W.shape[0]
    rs = np.random.RandomState(3)
    u = rs.rand(n, 4).astype(np.float32)
    Db = 0.01 * rs.rand(n, 4).astype(np.float32)
    dt = 1.0 / float(np.max(np.asarray(deg)))
    Ns = 5

    out = acc.from_perm(
        acc.heat_steps(acc.to_perm(deg), acc.to_perm(jnp.asarray(u)),
                       acc.to_perm(jnp.asarray(Db)), dt, Ns))

    ref = u.astype(np.float64)
    dv = np.asarray(deg, np.float64)
    for _ in range(Ns):
        Lu = dv[:, None] * ref - W @ ref
        ref = ref - dt * Lu + Db
    # bf16 band mode: ~0.4% relative tolerance
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2)


def test_poisson_mbo_accel_path_matches_plain(knn_W, monkeypatch):
    W, X = knn_W
    labels = (X[:, 0] > 0.5).astype(int)
    train_ind = gl.trainsets.generate(labels, rate=10, seed=4)
    priors = np.bincount(labels) / len(labels)

    from graphlearning_tpu.ops import accel as accel_mod

    monkeypatch.setattr(accel_mod, "_MIN_N", 1)
    monkeypatch.setattr(accel_mod, "enabled", lambda: True)
    monkeypatch.setenv("GLT_ACCEL_INTERPRET", "1")
    m = gl.ssl.poisson_mbo(W, class_priors=priors, T=3, Ns=10)
    pred_acc = m.fit_predict(train_ind, labels[train_ind])
    monkeypatch.setattr(accel_mod, "enabled", lambda: False)
    m2 = gl.ssl.poisson_mbo(W, class_priors=priors, T=3, Ns=10)
    pred_plain = m2.fit_predict(train_ind, labels[train_ind])
    assert np.mean(pred_acc == pred_plain) > 0.98


def test_poisson_gd_accel_path_matches_plain(knn_W, monkeypatch):
    W, X = knn_W
    labels = (X[:, 1] > 0.5).astype(int)
    train_ind = gl.trainsets.generate(labels, rate=10, seed=5)

    from graphlearning_tpu.ops import accel as accel_mod

    monkeypatch.setattr(accel_mod, "_MIN_N", 1)
    monkeypatch.setattr(accel_mod, "enabled", lambda: True)
    monkeypatch.setenv("GLT_ACCEL_INTERPRET", "1")
    m = gl.ssl.poisson(W, solver="gradient_descent")
    pred_acc = m.fit_predict(train_ind, labels[train_ind])
    monkeypatch.setattr(accel_mod, "enabled", lambda: False)
    m2 = gl.ssl.poisson(W, solver="gradient_descent")
    pred_plain = m2.fit_predict(train_ind, labels[train_ind])
    assert np.mean(pred_acc == pred_plain) > 0.99


def test_eigen_decomp_accel_matches_plain(knn_W, monkeypatch):
    W, _ = knn_W
    from graphlearning_tpu.ops import accel as accel_mod
    from graphlearning_tpu.core.graphclass import graph

    monkeypatch.setattr(accel_mod, "_MIN_N", 1)
    monkeypatch.setattr(accel_mod, "enabled", lambda: True)
    monkeypatch.setenv("GLT_ACCEL_INTERPRET", "1")
    vals_a, vecs_a = graph(W).eigen_decomp(normalization="normalized", k=4)
    monkeypatch.setattr(accel_mod, "enabled", lambda: False)
    vals_p, vecs_p = graph(W).eigen_decomp(normalization="normalized", k=4)
    np.testing.assert_allclose(vals_a, vals_p, atol=1e-5)
    # eigenvectors up to sign
    for j in range(4):
        d = min(np.abs(vecs_a[:, j] - vecs_p[:, j]).max(),
                np.abs(vecs_a[:, j] + vecs_p[:, j]).max())
        assert d < 5e-3


def test_volume_mbo_accel_path_matches_plain(knn_W, monkeypatch):
    W, X = knn_W
    labels = (X[:, 0] > 0.5).astype(int)
    train_ind = gl.trainsets.generate(labels, rate=10, seed=6)
    priors = np.bincount(labels) / len(labels)

    from graphlearning_tpu.ops import accel as accel_mod

    monkeypatch.setattr(accel_mod, "_MIN_N", 1)
    monkeypatch.setattr(accel_mod, "enabled", lambda: True)
    monkeypatch.setenv("GLT_ACCEL_INTERPRET", "1")
    m = gl.ssl.volume_mbo(W, priors, temperature=0.0)
    pred_acc = m.fit_predict(train_ind, labels[train_ind])
    monkeypatch.setattr(accel_mod, "enabled", lambda: False)
    m2 = gl.ssl.volume_mbo(W, priors, temperature=0.0)
    pred_plain = m2.fit_predict(train_ind, labels[train_ind])
    # bf16 convolution noise can flip ties near the decision boundary
    assert np.mean(pred_acc == pred_plain) > 0.97


def test_laplace_wnll_reweight_cache(knn_W, monkeypatch):
    """Repeated WNLL fits on the same split reuse the reweighted graph."""
    W, X = knn_W
    labels = (X[:, 1] > 0.5).astype(int)
    train_ind = gl.trainsets.generate(labels, rate=10, seed=7)
    m = gl.ssl.laplace(W, reweighting="wnll")
    p1 = m.fit_predict(train_ind, labels[train_ind])
    G_cached = m._reweight_G
    p2 = m.fit_predict(train_ind, labels[train_ind])
    assert m._reweight_G is G_cached
    assert np.array_equal(p1, p2)
    # a different split invalidates the cache
    train2 = gl.trainsets.generate(labels, rate=12, seed=8)
    m.fit_predict(train2, labels[train2])
    assert m._reweight_G is not G_cached


def test_accel_bellman_ford_matches_gather(knn_W):
    """Band min-plus Bellman-Ford (+ pointer-doubling closest point) must
    reproduce the gather-path distances and closest-point labels."""
    W, X = knn_W
    n = W.shape[0]
    from graphlearning_tpu.core.sparse import SparseGraph
    from graphlearning_tpu.solvers import eikonal as eik

    g = SparseGraph.from_scipy(W)
    acc = AccelSpMM(W, interpret=True, materialize=True)
    assert acc.materialize
    rs = np.random.RandomState(3)
    seeds = rs.choice(n, 7, replace=False)
    d_ref, cp_ref = eik.dijkstra(g, seeds, bdy_val=np.zeros(7),
                                 return_cp=True)
    d_acc, cp_acc = eik.dijkstra(g, seeds, bdy_val=np.zeros(7),
                                 return_cp=True, accel=acc)
    np.testing.assert_allclose(d_acc, d_ref, rtol=1e-5, atol=1e-6)
    # closest-point labels: ties between seeds can legitimately differ,
    # but the distance THROUGH the reported seed must be optimal
    assert np.all((cp_acc >= 0) == (cp_ref >= 0))
    mismatch = cp_acc != cp_ref
    if mismatch.any():
        # verify the alternative seed is equidistant
        dm = np.stack([eik.dijkstra(g, [s], bdy_val=np.zeros(1))
                       for s in seeds])
        pos = {s: i for i, s in enumerate(seeds)}
        for i in np.nonzero(mismatch)[0]:
            da = dm[pos[cp_acc[i]], i]
            dr = dm[pos[cp_ref[i]], i]
            np.testing.assert_allclose(da, dr, rtol=1e-5, atol=1e-5)


def test_accel_volume_mbo_feasible(knn_W):
    """Fused on-device VolumeMBO must return volume-feasible labels that
    match the class structure."""
    W, X = knn_W
    n = W.shape[0]
    labels = (X[:, 0] > 0.5).astype(int)

    from graphlearning_tpu.ops import accel as accel_mod

    rs = np.random.RandomState(4)
    train_ind = np.concatenate(
        [rs.choice(np.where(labels == c)[0], 3, replace=False)
         for c in (0, 1)])
    priors = np.bincount(labels, minlength=2) / n
    m = gl.ssl.volume_mbo(W, priors, temperature=0.0)
    pred = m.fit_predict(train_ind, labels[train_ind])
    counts = np.bincount(pred, minlength=2)
    target = (n * priors).astype(int)
    vc = m.volume_constraint
    assert np.all(counts >= np.floor(vc * target))
    assert np.all(counts <= np.ceil((2 - vc) * target))
    # x>0.5 split of uniform points is genuinely hard at 3 labels/class:
    # the fused loop reproduces the eager per-iteration loop exactly
    # (checked bit-identical), which scores ~80 here
    assert gl.ssl.ssl_accuracy(pred, labels, train_ind) > 75.0


def test_lip_iterate_tiled_band_matches_plain():
    """AccelSpMM.lip_iterate_mc (tiled-band sum/min/max reductions) must
    match the plain gather-path _lip_iterate_mc fixed point."""
    import jax.numpy as jnp
    import numpy as np
    from conftest import random_knn_csr
    from graphlearning_tpu.core.sparse import SparseGraph
    from graphlearning_tpu.ops.accel import AccelSpMM
    from graphlearning_tpu.solvers.plaplace import _lip_iterate_mc

    W = random_knn_csr(2560, 10, seed=7)
    n = W.shape[0]
    acc = AccelSpMM(W, interpret=True)
    assert acc._tiles is not None and acc.materialize

    rs = np.random.RandomState(0)
    bdy = np.sort(rs.choice(n, 20, replace=False))
    C = 3
    bdy_vals = rs.rand(20, C)
    bdy_mask = np.zeros(n, bool)
    bdy_mask[bdy] = True
    gvals = np.zeros((n, C))
    gvals[bdy] = bdy_vals

    p = 8.0
    alpha = 1.0 / (p - 1.0)
    u_acc = np.asarray(acc.lip_iterate_mc(
        np.zeros((n, C)), bdy_mask, gvals, alpha, 1.0 - alpha, 1e-6, 5000))
    g = SparseGraph.from_scipy(W, dtype=jnp.float32)
    u_ref = np.asarray(_lip_iterate_mc(
        g, jnp.zeros((n, C), jnp.float32), jnp.asarray(bdy_mask),
        jnp.asarray(gvals, jnp.float32), jnp.float32(alpha),
        jnp.float32(1.0 - alpha), jnp.float32(1e-6), 5000))
    np.testing.assert_allclose(u_acc, u_ref, rtol=2e-3, atol=2e-4)


def test_lip_gs_block_gauss_seidel_matches_plain():
    """AccelSpMM.lip_gs_mc (block-Gauss-Seidel sweeps over the rectangular
    RCM band) converges to the same fixed point as the plain gather-path
    Jacobi _lip_iterate_mc (GS and Jacobi share fixed points)."""
    import jax.numpy as jnp
    import numpy as np
    from conftest import random_knn_csr
    from graphlearning_tpu.core.sparse import SparseGraph
    from graphlearning_tpu.ops.accel import AccelSpMM
    from graphlearning_tpu.solvers.plaplace import _lip_iterate_mc

    W = random_knn_csr(2560, 10, seed=7)
    n = W.shape[0]
    acc = AccelSpMM(W, interpret=True)
    assert acc.materialize

    rs = np.random.RandomState(1)
    bdy = np.sort(rs.choice(n, 20, replace=False))
    C = 3
    bdy_vals = rs.rand(20, C)
    bdy_mask = np.zeros(n, bool)
    bdy_mask[bdy] = True
    gvals = np.zeros((n, C))
    gvals[bdy] = bdy_vals

    p = 8.0
    alpha = 1.0 / (p - 1.0)
    u_gs = np.asarray(acc.lip_gs_mc(
        np.zeros((n, C)), bdy_mask, gvals, alpha, 1.0 - alpha, 1e-6, 5000))
    g = SparseGraph.from_scipy(W, dtype=jnp.float32)
    u_ref = np.asarray(_lip_iterate_mc(
        g, jnp.zeros((n, C), jnp.float32), jnp.asarray(bdy_mask),
        jnp.asarray(gvals, jnp.float32), jnp.float32(alpha),
        jnp.float32(1.0 - alpha), jnp.float32(1e-6), 5000))
    np.testing.assert_allclose(u_gs, u_ref, rtol=2e-3, atol=2e-4)


def test_rect_band_gating_band_hostile(monkeypatch):
    """ADVICE r3 (medium): the block-Gauss-Seidel lip path must gate on
    the RECTANGULAR band's HBM cost — on band-hostile graphs the rect
    window can be ~n wide and would OOM.  rect_band_ok() must refuse,
    and the lip solvers must fall back without building it."""
    import numpy as np
    import graphlearning_tpu as gl
    from graphlearning_tpu.ops import accel as _accel
    from graphlearning_tpu.solvers.plaplace import amle_mc

    rs = np.random.RandomState(0)
    n = 1500
    X = rs.randn(n, 16)                       # high-dim: band-hostile
    W = gl.weightmatrix.knn(X, 8)
    monkeypatch.setattr(_accel, "enabled", lambda: True)
    monkeypatch.setattr(_accel, "_MIN_N", 1)
    monkeypatch.setattr(_accel, "_band_hostile", lambda W: False)
    monkeypatch.setenv("GLT_BAND_HBM_GB", "0.001")   # tiny budget
    acc = _accel.AccelSpMM(W, exact=False, fast=True)
    assert not acc.rect_band_ok()
    assert acc.rect_band_bytes() > _accel._band_budget_bytes()
    # model path: amle with this accel takes the fallback, not lip_gs
    g = gl.SparseGraph.from_scipy(W)
    bdy = rs.choice(n, 8, replace=False)
    vals = (np.arange(8) % 2).astype(float)[:, None]
    u = amle_mc(g, bdy, vals, tol=1e-3, max_num_it=200, weighted=False,
                accel=acc)
    assert np.all(np.isfinite(u))


def test_packed_matvec_plan_activates_and_matches():
    """Round-5 packed-slab matvec: on a banded materialized graph the
    packed plan must activate, spmm must match scipy at the exact mode,
    and the distance-family operands (bellman_ford path) must keep the
    unpacked tile layout."""
    import scipy.sparse as sp
    rs = np.random.RandomState(3)
    n, k = 4096, 8
    rows = np.repeat(np.arange(n), k)
    off = rs.randint(-60, 61, size=n * k)
    cols = np.clip(rows + off, 0, n - 1)
    W = sp.coo_matrix((rs.rand(n * k) + 0.1, (rows, cols)),
                      shape=(n, n)).tocsr()
    W.setdiag(0)
    W.eliminate_zeros()
    W = (W + W.T) / 2
    acc = AccelSpMM(W, interpret=True, materialize=True)
    assert acc._packed_meta is not None
    X = rs.randn(n, 4).astype(np.float32)
    Y = acc.from_perm(acc.spmm(acc.to_perm(jnp.asarray(X))))
    ref = W @ X.astype(np.float64)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(Y) / scale, ref / scale,
                               atol=5e-5)
    # packed band really is the slab layout; distance ops keep tiles
    pk = acc.packed_band()
    m = acc._packed_meta
    assert pk.shape[1] == m["S"] * m["WT"]
    assert acc._plan_dev[0] is acc._tiles or not isinstance(
        acc._plan_dev[0], tuple) or acc._plan_dev[0][0].shape != m[
            "slabs"][0].shape
    # opt-out env restores the unpacked path
    import os
    os.environ["GLT_NO_PACKED"] = "1"
    try:
        acc2 = AccelSpMM(W, interpret=True, materialize=True)
        assert acc2._packed_meta is None
        Y2 = acc2.from_perm(acc2.spmm(acc2.to_perm(jnp.asarray(X))))
        np.testing.assert_allclose(np.asarray(Y2) / scale, ref / scale,
                                   atol=5e-5)
    finally:
        del os.environ["GLT_NO_PACKED"]
