"""Distance/HJ solver tests: device Bellman-Ford & Jacobi iterations vs
scipy.csgraph and the host C++ oracle (SURVEY.md §2.2 'two implementations'
strategy)."""

import numpy as np
import scipy.sparse as sp
import pytest

import graphlearning_tpu as gl
from graphlearning_tpu.core.sparse import SparseGraph
from graphlearning_tpu.solvers import eikonal
from graphlearning_tpu import native


@pytest.fixture(scope="module")
def pointcloud_graph():
    rs = np.random.RandomState(0)
    X = rs.rand(400, 2)
    X[0] = [0.5, 0.5]
    W = gl.weightmatrix.knn(X, 12, kernel="distance")
    return X, W


def test_dijkstra_vs_scipy(pointcloud_graph):
    X, W = pointcloud_graph
    g = SparseGraph.from_scipy(W)
    d = eikonal.dijkstra(g, [0])
    from scipy.sparse.csgraph import dijkstra as scipy_dijkstra

    dref = scipy_dijkstra(W, indices=[0])[0]
    np.testing.assert_allclose(d, dref, rtol=1e-8, atol=1e-10)


def test_dijkstra_vs_host_oracle(pointcloud_graph):
    X, W = pointcloud_graph
    g = SparseGraph.from_scipy(W)
    bdy = [0, 7, 123]
    gvals = np.array([0.0, 0.1, 0.05])
    d, cp = eikonal.dijkstra(g, bdy, bdy_val=gvals, return_cp=True)
    dref, cpref = native.dijkstra_host(W, bdy, bdy_val=gvals)
    np.testing.assert_allclose(d, dref, rtol=1e-8, atol=1e-10)
    # closest points may differ on exact ties; require distance agreement
    assert np.mean(cp == cpref) > 0.99


def test_dijkstra_cone(pointcloud_graph):
    """Analytic oracle: distance to center approximates Euclidean cone
    (reference examples/dijkstra.py check)."""
    X, W = pointcloud_graph
    g = SparseGraph.from_scipy(W)
    d = eikonal.dijkstra(g, [0])
    true = np.linalg.norm(X - X[0], axis=1)
    err = np.max(np.abs(d - true))
    assert err < 0.15, err


def test_dijkstra_hl_vs_host(pointcloud_graph):
    X, W = pointcloud_graph
    g = SparseGraph.from_scipy(W)
    d = eikonal.dijkstra_hl(g, [0])
    dref, _ = native.dijkstra_host(W, [0], hopf_lax=True)
    np.testing.assert_allclose(d, dref, rtol=1e-7, atol=1e-9)


def test_dijkstra_max_dist(pointcloud_graph):
    X, W = pointcloud_graph
    g = SparseGraph.from_scipy(W)
    d, cp = eikonal.dijkstra(g, [0], max_dist=0.3, return_cp=True)
    assert np.all(np.isinf(d[d > 0.3]) | (d[d > 0.3] <= 0.3) | np.isinf(d[d > 0.3]))
    assert np.all(cp[np.isinf(d)] == -1)
    finite = np.isfinite(d)
    dfull = eikonal.dijkstra(g, [0])
    np.testing.assert_allclose(d[finite], dfull[finite], rtol=1e-8)


def test_peikonal_p1_vs_host(pointcloud_graph):
    X, W = pointcloud_graph
    g = SparseGraph.from_scipy(W)
    bdy = np.where((X[:, 0] < 0.05) | (X[:, 0] > 0.95)
                   | (X[:, 1] < 0.05) | (X[:, 1] > 0.95))[0]
    u = eikonal.peikonal(g, bdy, tol=1e-8)
    uref = native.peikonal_host(W, bdy, tol=1e-10)
    np.testing.assert_allclose(u, uref, rtol=1e-4, atol=1e-6)


def test_peikonal_p2_vs_host(pointcloud_graph):
    X, W = pointcloud_graph
    g = SparseGraph.from_scipy(W)
    bdy = np.where(X[:, 0] < 0.05)[0]
    # tolerances chosen for suite wall-time: the GS/Jacobi fixed points
    # converge geometrically but the last decades cost hundreds of sweeps
    # (tol 1e-8/1e-10 here measured 213s; 1e-6/1e-8 is 0.7s at relerr 2e-9)
    u = eikonal.peikonal(g, bdy, p=2, tol=1e-6)
    uref = native.peikonal_host(W, bdy, p=2.0, tol=1e-8)
    np.testing.assert_allclose(u, uref, rtol=1e-3, atol=1e-5)


def test_amle_harmonicity():
    """AMLE solution satisfies the infinity-Laplace equation at interior
    nodes (residual ~ 0) and the boundary conditions exactly."""
    rs = np.random.RandomState(2)
    X = rs.rand(300, 2)
    W = gl.weightmatrix.knn(X, 10)
    g = SparseGraph.from_scipy(W)
    bdy = np.array([0, 5, 50, 100, 250])
    gvals = np.array([0.0, 1.0, 0.5, -1.0, 2.0])
    from graphlearning_tpu.solvers import plaplace as pl

    u = pl.amle(g, bdy, gvals, tol=1e-7, max_num_it=10**5)
    np.testing.assert_allclose(u[bdy], gvals, atol=1e-12)
    from graphlearning_tpu import ops
    import jax.numpy as jnp

    res = np.asarray(ops.infinity_laplacian(g, jnp.asarray(u)))
    interior = np.ones(300, dtype=bool)
    interior[bdy] = False
    assert np.max(np.abs(res[interior])) < 1e-4


def test_plaplace_maximum_principle():
    rs = np.random.RandomState(3)
    X = rs.rand(300, 2)
    W = gl.weightmatrix.knn(X, 10)
    g = SparseGraph.from_scipy(W)
    bdy = np.arange(20)
    gvals = rs.rand(20)
    from graphlearning_tpu.solvers import plaplace as pl

    for fast in (True, False):
        u = pl.plaplace(g, bdy, gvals, p=5, fast=fast, tol=1e-3)
        assert u.min() >= gvals.min() - 1e-6 and u.max() <= gvals.max() + 1e-6
        np.testing.assert_allclose(u[bdy], gvals, atol=1e-10)


def test_graph_class_distance_api(pointcloud_graph):
    X, W = pointcloud_graph
    G = gl.graph(W)
    d = G.dijkstra([0])
    assert d[0] == 0 and np.isfinite(d).all()
    u = G.peikonal([0])
    assert u[0] == 0 and (u[1:] > 0).all()
    a = G.amle([0, 10], np.array([0.0, 1.0]))
    assert abs(a[0]) < 1e-12 and abs(a[10] - 1) < 1e-12
    p = G.plaplace([0, 10], np.array([0.0, 1.0]), p=4)
    assert abs(p[0]) < 1e-12


def test_distance_matrix_small():
    rs = np.random.RandomState(1)
    X = rs.rand(60, 2)
    W = gl.weightmatrix.knn(X, 8, kernel="distance")
    g = SparseGraph.from_scipy(W)
    D = eikonal.distance_matrix(g)
    from scipy.sparse.csgraph import dijkstra as scipy_dijkstra

    Dref = scipy_dijkstra(W)
    np.testing.assert_allclose(D, Dref, rtol=1e-8, atol=1e-10)


def test_peikonal_fmm_oracle_vs_gauss_seidel(pointcloud_graph):
    """FMM and Gauss-Seidel host oracles converge to the same viscosity
    solution (reference keeps both paths: hjsolvers.cpp:229-420)."""
    X, W = pointcloud_graph
    bdy = [0, 5]
    u_gs = native.peikonal_host(W, bdy, p=1.0, tol=1e-10)
    u_fmm = native.peikonal_fmm_host(W, bdy, p=1.0)
    np.testing.assert_allclose(u_fmm, u_gs, rtol=1e-6, atol=1e-8)


def test_peikonal_fmm_oracle_p2(pointcloud_graph):
    X, W = pointcloud_graph
    u_gs = native.peikonal_host(W, [0], p=2.0, tol=1e-8)
    u_fmm = native.peikonal_fmm_host(W, [0], p=2.0)
    np.testing.assert_allclose(u_fmm, u_gs, rtol=1e-3, atol=1e-4)


def test_amle_device_vs_host_oracle(pointcloud_graph):
    """Device Jacobi AMLE matches the serial Gauss-Seidel C++ oracle
    (same monotone fixed point)."""
    X, W = pointcloud_graph
    g = SparseGraph.from_scipy(W)
    bdy = np.array([0, 5, 50, 100])
    gvals = np.array([0.0, 1.0, 0.5, -1.0])
    from graphlearning_tpu.solvers import plaplace as pl

    for weighted in (False, True):
        u_dev = pl.amle(g, bdy, gvals, tol=1e-7, max_num_it=10**5,
                        weighted=weighted)
        u_host = native.lip_iterate_host(W, bdy, gvals, alpha=0.0, beta=1.0,
                                         weighted=weighted, tol=1e-9)
        np.testing.assert_allclose(u_dev, u_host, rtol=1e-3, atol=1e-4)


def test_plaplace_fast_device_vs_host_oracle(pointcloud_graph):
    X, W = pointcloud_graph
    g = SparseGraph.from_scipy(W)
    bdy = np.array([0, 5, 50, 100])
    gvals = np.array([0.0, 1.0, 0.5, -1.0])
    from graphlearning_tpu.solvers import plaplace as pl

    p = 6.0
    u_dev = pl.plaplace(g, bdy, gvals, p=p, fast=True)
    alpha = 1.0 / (p - 1.0)
    u_host = native.lip_iterate_host(W, bdy, gvals, alpha=alpha,
                                     beta=1.0 - alpha, tol=1e-12)
    np.testing.assert_allclose(u_dev, u_host, rtol=1e-3, atol=1e-4)


def test_auction_oracle_optimality():
    """The C++ auction oracle reaches the Hungarian optimum on expanded
    slots, respects exact class counts and pinned nodes."""
    rs = np.random.RandomState(4)
    n, k = 40, 4
    a = rs.rand(n, k)
    target = np.array([10, 10, 10, 10], dtype=np.int32)
    lab = native.auction_host(a, target, eps_min=1e-9)
    assert (np.bincount(lab, minlength=k) == target).all()
    from scipy.optimize import linear_sum_assignment

    cost = -np.concatenate(
        [np.tile(a[:, c:c + 1], (1, target[c])) for c in range(k)], axis=1)
    ri, ci = linear_sum_assignment(cost)
    opt = -cost[ri, ci].sum()
    got = a[np.arange(n), lab].sum()
    assert got >= opt - 1e-6

    fixed = np.full(n, -1, dtype=np.int32)
    fixed[:3] = 2
    lab2 = native.auction_host(a, target, fixed=fixed, eps_min=1e-9)
    assert (lab2[:3] == 2).all()
    assert (np.bincount(lab2, minlength=k) == target).all()


def test_device_volume_assignment_vs_auction_oracle():
    """The device Jacobi auction (ssl._volume_assignment) attains the same
    objective as the serial C++ auction oracle (within eps tolerance)."""
    rs = np.random.RandomState(5)
    n, k = 60, 3
    a = rs.rand(n, k)
    target = np.array([20, 20, 20], dtype=np.int32)
    from graphlearning_tpu.ssl import _volume_assignment
    import jax.numpy as jnp

    fixed_mask = np.zeros(n, dtype=bool)
    fixed_labels = np.zeros(n, dtype=np.int32)
    lab_dev = np.asarray(_volume_assignment(
        jnp.asarray(a), jnp.asarray(fixed_mask), jnp.asarray(fixed_labels),
        jnp.asarray(target), jnp.asarray(target), jnp.asarray(target),
    ))
    lab_host = native.auction_host(a, target, eps_min=1e-9)
    obj_dev = a[np.arange(n), lab_dev].sum()
    obj_host = a[np.arange(n), lab_host].sum()
    assert (np.bincount(lab_dev, minlength=k) == target).all()
    assert obj_dev >= obj_host - 0.05 * abs(obj_host)


def test_plaplace_amle_onevsrest_batched_matches_loop(pointcloud_graph):
    """The class-batched one-vs-rest fit (plaplace_mc/amle_mc) must match
    the sequential per-class loop."""
    import graphlearning_tpu as gl
    from graphlearning_tpu.solvers.plaplace import plaplace_mc, amle_mc

    X, W = pointcloud_graph
    g = SparseGraph.from_scipy(W)
    n = g.n
    rs = np.random.RandomState(0)
    labels = (X[:, 0] > 0.33).astype(int) + (X[:, 0] > 0.66).astype(int)
    train_ind = np.sort(rs.choice(n, 15, replace=False))
    uniq = np.unique(labels[train_ind])
    bdy_vals = (labels[train_ind][:, None] == uniq[None, :]).astype(float)

    from graphlearning_tpu.solvers.plaplace import plaplace as pl_single
    from graphlearning_tpu.solvers.plaplace import amle as amle_single

    # joint stopping truncates at a slightly different iterate than the
    # per-class loops — same fixed point, tolerance-level differences
    U = plaplace_mc(g, train_ind, bdy_vals, p=10)
    for c in range(len(uniq)):
        u = pl_single(g, train_ind, bdy_vals[:, c], p=10)
        np.testing.assert_allclose(U[:, c], u, atol=5e-4)

    U = amle_mc(g, train_ind, bdy_vals, weighted=True)
    for c in range(len(uniq)):
        u = amle_single(g, train_ind, bdy_vals[:, c], weighted=True)
        np.testing.assert_allclose(U[:, c], u, atol=5e-4)

    # end-to-end: model predictions identical through the hook
    m = gl.ssl.plaplace(W, p=10)
    pred_batched = m.fit_predict(train_ind, labels[train_ind])
    m2 = gl.ssl.plaplace(W, p=10)
    del type(m2)._fit_onevsrest   # force the per-class loop path
    try:
        pred_loop = m2.fit_predict(train_ind, labels[train_ind])
    finally:
        from graphlearning_tpu.solvers.plaplace import plaplace_mc as _r
    assert np.mean(pred_batched == pred_loop) > 0.995


def test_bucketed_lip_matches_plain():
    """ELL+COO hybrid lip iteration must match the plain padded-ELL one on
    a degree-skewed graph (hub star + kNN cloud)."""
    import scipy.sparse as sp
    from graphlearning_tpu.core.sparse import SparseGraph, BucketedELL
    from graphlearning_tpu.solvers.plaplace import (
        _lip_iterate_mc, _lip_iterate_mc_bucketed,
        _lip_iterate_weighted_mc, _lip_iterate_weighted_mc_bucketed)
    import jax.numpy as jnp
    import graphlearning_tpu as gl

    rs = np.random.RandomState(0)
    X = rs.rand(400, 2)
    W = gl.weightmatrix.knn(X, 8).tolil()
    # hub: node 0 connects to 100 extra nodes (degree ~100 vs ~12)
    for j in range(50, 150):
        W[0, j] = 0.3
        W[j, 0] = 0.3
    W = W.tocsr()
    g = SparseGraph.from_scipy(W)
    b = BucketedELL.from_scipy(W)
    assert b.kcap < g.k and b.m > 0

    n = W.shape[0]
    bdy = np.array([3, 77, 200, 350])
    bdy_vals = np.eye(4)[np.arange(4) % 4][:, :2]
    bdy_mask = np.zeros(n, bool)
    bdy_mask[bdy] = True
    gvals = np.zeros((n, 2))
    gvals[bdy] = bdy_vals
    args = lambda: (jnp.zeros((n, 2)), jnp.asarray(bdy_mask),
                    jnp.asarray(gvals), jnp.asarray(1.0 / 9),
                    jnp.asarray(8.0 / 9), jnp.asarray(1e-7), 2000)
    u_plain = np.asarray(_lip_iterate_mc(g, *args()))
    u_buck = np.asarray(_lip_iterate_mc_bucketed(b, *args()))
    np.testing.assert_allclose(u_buck, u_plain, rtol=1e-5, atol=1e-6)

    wargs = lambda: (jnp.zeros((n, 2)), jnp.asarray(bdy_mask),
                     jnp.asarray(gvals), jnp.asarray(1e-7), 500)
    uw_plain = np.asarray(_lip_iterate_weighted_mc(g, *wargs()))
    uw_buck = np.asarray(_lip_iterate_weighted_mc_bucketed(b, *wargs()))
    np.testing.assert_allclose(uw_buck, uw_plain, rtol=1e-5, atol=1e-6)


def test_peikonal_mc_matches_per_class():
    """Class-batched p-eikonal must match per-class solves."""
    from graphlearning_tpu.core.sparse import SparseGraph
    from graphlearning_tpu.solvers.eikonal import peikonal, peikonal_mc
    import graphlearning_tpu as gl

    rs = np.random.RandomState(1)
    X = rs.rand(400, 2)
    W = gl.weightmatrix.knn(X, 8)
    g = SparseGraph.from_scipy(W)
    labels = (X[:, 0] * 3).astype(int)
    sets = [np.where(labels == c)[0][:4] for c in range(3)]
    for p in (1, 2):
        u_mc = peikonal_mc(g, sets, p=p, tol=1e-6)
        for c in range(3):
            u_c = peikonal(g, sets[c], bdy_val=0, p=p, tol=1e-6)
            np.testing.assert_allclose(u_mc[:, c], u_c, rtol=1e-4, atol=1e-5)


def test_volume_assignment_adversarial_repair():
    """Exact repair handles a badly infeasible start (price ascent
    disabled) by moving top-margin batches, not one node per round."""
    from graphlearning_tpu.solvers.volume import assign_labels
    import jax.numpy as jnp

    rs = np.random.RandomState(0)
    n, k = 3000, 5
    a = rs.rand(n, k) * 0.01
    a[:, 0] += 10.0                    # everything wants class 0
    target = np.full(k, n // k, dtype=float)
    lab = np.asarray(assign_labels(
        jnp.asarray(a), jnp.zeros(n, bool), jnp.zeros(n, jnp.int32),
        jnp.asarray(target), jnp.asarray(target), max_price_it=0))
    assert (np.bincount(lab, minlength=k) == target).all()


def test_bellman_ford_mc_matches_per_class():
    """The class-batched (n, C) min-plus Bellman-Ford (the peikonal warm
    start) equals C independent dijkstra solves."""
    import jax.numpy as jnp
    from graphlearning_tpu.core.sparse import SparseGraph
    from graphlearning_tpu.solvers import eikonal as eik

    rs = np.random.RandomState(3)
    X = rs.rand(300, 2)
    W = gl.weightmatrix.knn(X, 8)
    g = SparseGraph.from_scipy(W)
    sets = [np.array([0, 5]), np.array([100]), np.array([200, 250, 299])]
    f = rs.rand(300) + 0.5

    D0 = np.full((300, len(sets)), 1e30)
    for c, s in enumerate(sets):
        D0[s, c] = 0.0
    D = np.asarray(eik._bellman_ford_mc(
        g, jnp.asarray(D0, dtype=g.vals.dtype),
        jnp.asarray(f, dtype=g.vals.dtype), recip=True, max_iter=10**5))
    for c, s in enumerate(sets):
        d_ref = eik.dijkstra(g, s, bdy_val=0.0, f=f,
                             reciprocal_weights=True)
        np.testing.assert_allclose(D[:, c], d_ref, atol=1e-6)
