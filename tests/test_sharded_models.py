"""Sharded model execution (parallel/execute.py): every benchmark model
fits on the virtual 8-device CPU mesh via ``model.distribute(mesh)`` and
reproduces the unsharded predictions (VERDICT round-1 item 1; SURVEY.md
§7.1 item 4 / §7.2 step 6)."""

import numpy as np
import jax
import pytest

import graphlearning_tpu as gl
from graphlearning_tpu import parallel
from graphlearning_tpu.config import GLTConfig


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return parallel.make_mesh()


@pytest.fixture(scope="module")
def clusters():
    """3-class Gaussian-mixture kNN graph, n deliberately NOT a multiple
    of 8 (exercises mesh padding).  Cluster scale keeps the graph
    CONNECTED — a disconnected graph makes the normalized Laplacian
    singular and the Poisson CG ill-posed (reference behaves the same)."""
    rs = np.random.RandomState(0)
    n, ncls = 603, 3
    centers = rs.randn(ncls, 5) * 1.8
    labels = rs.randint(0, ncls, n)
    X = centers[labels] + rs.randn(n, 5)
    W = gl.weightmatrix.knn(X, 10)
    from scipy.sparse.csgraph import connected_components

    assert connected_components(W, directed=False)[0] == 1
    train_ind = np.concatenate(
        [rs.choice(np.where(labels == c)[0], 5, replace=False)
         for c in range(ncls)])
    return W, labels, train_ind


def _check(model_sh, model_ref, train_ind, labels, min_agree=0.99):
    pred_ref = model_ref.fit_predict(train_ind, labels[train_ind])
    pred_sh = model_sh.fit_predict(train_ind, labels[train_ind])
    agree = np.mean(pred_sh == pred_ref)
    assert agree >= min_agree, agree
    acc = gl.ssl.ssl_accuracy(pred_sh, labels, train_ind)
    assert acc > 80.0, acc
    return pred_sh


def test_laplace_sharded(mesh, clusters):
    W, labels, train_ind = clusters
    _check(gl.ssl.laplace(W).distribute(mesh), gl.ssl.laplace(W),
           train_ind, labels)
    # prob parity too (same solver math up to reduction order)
    m_sh = gl.ssl.laplace(W, tol=1e-10).distribute(mesh)
    m_ref = gl.ssl.laplace(W, tol=1e-10)
    u_sh = m_sh.fit(train_ind, labels[train_ind])
    u_ref = m_ref.fit(train_ind, labels[train_ind])
    np.testing.assert_allclose(u_sh, u_ref, rtol=1e-5, atol=1e-7)


def test_laplace_sharded_normalized_and_reweighted(mesh, clusters):
    W, labels, train_ind = clusters
    _check(gl.ssl.laplace(W, normalization="normalized").distribute(mesh),
           gl.ssl.laplace(W, normalization="normalized"), train_ind, labels)
    _check(gl.ssl.laplace(W, reweighting="wnll").distribute(mesh),
           gl.ssl.laplace(W, reweighting="wnll"), train_ind, labels)


def test_poisson_cg_sharded(mesh, clusters):
    W, labels, train_ind = clusters
    m_sh = gl.ssl.poisson(W, tol=1e-8).distribute(mesh)
    m_ref = gl.ssl.poisson(W, tol=1e-8)
    _check(m_sh, m_ref, train_ind, labels)
    np.testing.assert_allclose(m_sh.prob, m_ref.prob, rtol=1e-4, atol=1e-6)


def test_poisson_gd_sharded(mesh, clusters):
    W, labels, train_ind = clusters
    m_sh = gl.ssl.poisson(W, solver="gradient_descent").distribute(mesh)
    m_ref = gl.ssl.poisson(W, solver="gradient_descent")
    _check(m_sh, m_ref, train_ind, labels)
    # identical iteration counts (same mixing-time stop on the true n)
    np.testing.assert_allclose(m_sh.prob, m_ref.prob, rtol=1e-6, atol=1e-9)


def test_poisson_mbo_sharded(mesh, clusters):
    W, labels, train_ind = clusters
    priors = gl.utils.class_priors(labels)
    m_sh = gl.ssl.poisson_mbo(W, class_priors=priors, T=5).distribute(mesh)
    m_ref = gl.ssl.poisson_mbo(W, class_priors=priors, T=5)
    _check(m_sh, m_ref, train_ind, labels)


def test_volume_mbo_sharded(mesh, clusters):
    W, labels, train_ind = clusters
    priors = gl.utils.class_priors(labels)
    m_sh = gl.ssl.volume_mbo(W, class_priors=priors,
                             seed=0).distribute(mesh)
    m_ref = gl.ssl.volume_mbo(W, class_priors=priors, seed=0)
    _check(m_sh, m_ref, train_ind, labels, min_agree=0.98)


def test_plaplace_amle_sharded(mesh, clusters):
    W, labels, train_ind = clusters
    _check(gl.ssl.plaplace(W, p=10).distribute(mesh),
           gl.ssl.plaplace(W, p=10), train_ind, labels)
    _check(gl.ssl.amle(W, weighted=True).distribute(mesh),
           gl.ssl.amle(W, weighted=True), train_ind, labels)


def test_distribute_via_config(mesh, clusters):
    """One GLTConfig drives the sharded path (SURVEY.md §5 config system)."""
    W, labels, train_ind = clusters
    cfg = GLTConfig(mesh_shape=(8,), mesh_axes=("nodes",))
    m = gl.ssl.poisson(W).distribute(cfg)
    assert m._dist.P == 8
    pred = m.fit_predict(train_ind, labels[train_ind])
    assert gl.ssl.ssl_accuracy(pred, labels, train_ind) > 80.0
    # distribute(None) disables
    m.distribute(None)
    assert m._dist is None


def test_sharded_trials_runner(mesh, clusters, tmp_path):
    """ssl_trials works end-to-end on a distributed model."""
    import graphlearning_tpu.ssl as sslm

    W, labels, train_ind = clusters
    old = sslm.results_dir
    sslm.results_dir = str(tmp_path)
    try:
        model = gl.ssl.poisson(W).distribute(mesh)
        res = model.ssl_trials([train_ind, np.roll(train_ind, 1)], labels,
                               overwrite=True)
        assert res.shape == (2, 2) and res[:, 1].min() > 80.0
    finally:
        sslm.results_dir = old


@pytest.mark.parametrize("method", ["NgJordanWeiss", "combinatorial"])
def test_spectral_clustering_sharded(mesh, clusters, method):
    """Sharded LOBPCG eigensolver (parallel/execute.eigen_decomp_sharded):
    spectral clustering over the mesh matches the unsharded clustering."""
    W, labels, train_ind = clusters
    ref = gl.clustering.spectral(W, num_clusters=3, method=method)
    sh = gl.clustering.spectral(W, num_clusters=3,
                                method=method).distribute(mesh)
    pred_ref = ref.fit_predict()
    pred_sh = sh.fit_predict()
    acc_ref = gl.clustering.clustering_accuracy(pred_ref, labels)
    acc_sh = gl.clustering.clustering_accuracy(pred_sh, labels)
    assert abs(acc_ref - acc_sh) < 2.0, (acc_ref, acc_sh)
    assert acc_sh > 85.0, acc_sh


def test_eigen_decomp_sharded_values(mesh, clusters):
    """Sharded eigenvalues match the single-device eigensolver."""
    from graphlearning_tpu.parallel import execute as _exec

    W, _, _ = clusters
    dist = _exec.Distributor(mesh)
    vals_sh, vecs_sh = _exec.eigen_decomp_sharded(
        dist, W, normalization="normalized", k=4)
    g = gl.graph(W)
    vals_ref, vecs_ref = g.eigen_decomp(normalization="normalized", k=4)
    assert np.allclose(np.asarray(vals_sh), np.asarray(vals_ref)[:4],
                       atol=1e-4), (vals_sh, vals_ref)
    assert vecs_sh.shape[0] == W.shape[0]


# -- round-3 additions: banded sharded kernel + new model families ---------


@pytest.fixture(scope="module")
def band_cfg():
    """Config forcing the partitioned tiled-band Pallas kernel (interpret
    mode on the CPU mesh) — the sharded fast path (round-2 verdict item 1)."""
    return GLTConfig(mesh_shape=(8,), mesh_axes=("nodes",),
                     sharded_kernel="banded", band_R=16, band_WT=16)


def test_banded_operator_spmm_parity(band_cfg, clusters):
    """The Distributor's banded operator (RCM + halo exchange + residual)
    matches scipy exactly through ops.spmm dispatch."""
    from graphlearning_tpu.parallel import execute as _exec
    from graphlearning_tpu.parallel.band_shard import ShardedOp
    from graphlearning_tpu.ops import graphops as _ops

    W, _, _ = clusters
    dist = _exec.Distributor(band_cfg)
    op, n = dist.operator(W)
    assert isinstance(op, ShardedOp)
    rs = np.random.RandomState(7)
    Xf = rs.randn(n, 5)
    out = _ops.spmm(op, dist.put_rows(Xf, op=op))
    np.testing.assert_allclose(dist.gather(out, n, op=op), W @ Xf,
                               atol=1e-9)


def test_banded_sharded_models_parity(band_cfg, clusters):
    """Model fits through the banded operator reproduce the unsharded
    predictions: the halo-exchange Pallas kernel IS the sharded hot path."""
    W, labels, train_ind = clusters
    m_sh = gl.ssl.poisson(W, tol=1e-8).distribute(band_cfg)
    m_ref = gl.ssl.poisson(W, tol=1e-8)
    _check(m_sh, m_ref, train_ind, labels)
    np.testing.assert_allclose(m_sh.prob, m_ref.prob, rtol=1e-4, atol=1e-6)
    _check(gl.ssl.laplace(W).distribute(band_cfg), gl.ssl.laplace(W),
           train_ind, labels)
    _check(gl.ssl.poisson(W, solver="gradient_descent").distribute(band_cfg),
           gl.ssl.poisson(W, solver="gradient_descent"), train_ind, labels)
    priors = gl.utils.class_priors(labels)
    _check(gl.ssl.volume_mbo(W, class_priors=priors,
                             seed=0).distribute(band_cfg),
           gl.ssl.volume_mbo(W, class_priors=priors, seed=0), train_ind,
           labels, min_agree=0.98)


def test_banded_eigensolver_parity(band_cfg, clusters):
    from graphlearning_tpu.parallel import execute as _exec

    W, _, _ = clusters
    dist = _exec.Distributor(band_cfg)
    vals_sh, vecs_sh = _exec.eigen_decomp_sharded(
        dist, W, normalization="normalized", k=4)
    vals_ref, _ = gl.graph(W).eigen_decomp(normalization="normalized", k=4)
    assert np.allclose(np.asarray(vals_sh), np.asarray(vals_ref)[:4],
                       atol=1e-4)
    assert vecs_sh.shape[0] == W.shape[0]


def test_sharded_new_families(mesh, clusters):
    """Round-2 verdict item 5: randomwalk, centered_kernel, multiclass /
    modularity MBO, sparse LP, peikonal, graph NN and the Poisson spectral
    solver all consume distribute()."""
    W, labels, train_ind = clusters
    for cls, min_agree in ((gl.ssl.randomwalk, 0.99),
                           (gl.ssl.centered_kernel, 0.99),
                           (gl.ssl.peikonal, 0.99),
                           (gl.ssl.graph_nearest_neighbor, 0.99)):
        m_sh = cls(W).distribute(mesh)
        m_ref = cls(W)
        pred_ref = m_ref.fit_predict(train_ind, labels[train_ind])
        pred_sh = m_sh.fit_predict(train_ind, labels[train_ind])
        agree = np.mean(pred_sh == pred_ref)
        assert agree >= min_agree, (cls.__name__, agree)
    _check(gl.ssl.poisson(W, solver="spectral").distribute(mesh),
           gl.ssl.poisson(W, solver="spectral"), train_ind, labels,
           min_agree=0.95)


def test_sharded_mbo_and_slp_families(mesh, clusters):
    W, labels, train_ind = clusters
    # weak models: check sharded==unsharded agreement, not accuracy
    for cls in (gl.ssl.multiclass_mbo, gl.ssl.modularity_mbo):
        kw = {"seed": 0} if cls is gl.ssl.multiclass_mbo else {}
        m_sh = cls(W, **kw).distribute(mesh)
        m_ref = cls(W, **kw)
        pred_ref = m_ref.fit_predict(train_ind, labels[train_ind])
        pred_sh = m_sh.fit_predict(train_ind, labels[train_ind])
        assert np.mean(pred_sh == pred_ref) > 0.9
    m_sh = gl.ssl.sparse_label_propagation(W, T=30).distribute(mesh)
    m_ref = gl.ssl.sparse_label_propagation(W, T=30)
    pred_ref = m_ref.fit_predict(train_ind, labels[train_ind])
    pred_sh = m_sh.fit_predict(train_ind, labels[train_ind])
    assert np.mean(pred_sh == pred_ref) > 0.95


def test_distribute_warns_on_unsupported(mesh, clusters):
    """No model silently ignores _dist (round-2 verdict item 5)."""
    import warnings

    W, _, _ = clusters
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        gl.ssl.dynamic_label_propagation(W).distribute(mesh)
    assert any("no sharded execution path" in str(w.message) for w in rec)
    with pytest.raises(NotImplementedError):
        gl.ssl.dynamic_label_propagation(W).distribute(mesh, strict=True)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        gl.clustering.fokker_planck(W, num_clusters=3).distribute(mesh)
    assert any("no sharded execution path" in str(w.message) for w in rec)


def test_sharded_gd_directed_semantics(mesh):
    """Round-2 verdict item 6: directed W + distribute() + GD must match
    the reference W^T iteration, not silently use W."""
    rs = np.random.RandomState(3)
    n, ncls = 240, 2
    centers = rs.randn(ncls, 4) * 2.0
    labels = rs.randint(0, ncls, n)
    X = centers[labels] + rs.randn(n, 4)
    W = gl.weightmatrix.knn(X, 8, symmetrize=False)   # directed kNN graph
    assert (W != W.T).nnz > 0
    train_ind = np.concatenate(
        [rs.choice(np.where(labels == c)[0], 4, replace=False)
         for c in range(ncls)])
    m_sh = gl.ssl.poisson(W, solver="gradient_descent").distribute(mesh)
    m_ref = gl.ssl.poisson(W, solver="gradient_descent")
    pred_ref = m_ref.fit_predict(train_ind, labels[train_ind])
    pred_sh = m_sh.fit_predict(train_ind, labels[train_ind])
    assert np.mean(pred_sh == pred_ref) >= 0.99
    np.testing.assert_allclose(m_sh.prob, m_ref.prob, rtol=1e-6, atol=1e-9)


def test_warmup_api(clusters):
    """gl.warmup pre-compiles at the real shapes and resets model state."""
    W, labels, train_ind = clusters
    m = gl.warmup(gl.ssl.poisson(W), num_classes=3)
    assert not m.fitted and m.prob is None
    pred = m.fit_predict(train_ind, labels[train_ind])
    assert gl.ssl.ssl_accuracy(pred, labels, train_ind) > 80.0


def test_sharded_distance_solvers(mesh, clusters):
    """Sharded Bellman-Ford dijkstra / Hopf-Lax match the single-device
    solvers (reference graph.py:808-1332 family)."""
    from graphlearning_tpu.parallel import execute as _exec
    from graphlearning_tpu.solvers import eikonal as _eik

    W, _, train_ind = clusters
    dist = _exec.Distributor(mesh)
    g = gl.SparseGraph.from_scipy(W)
    d_sh = _exec.dijkstra_fit_sharded(dist, W, train_ind[:5], 0.0, 1.0)
    d_ref = _eik.dijkstra(g, train_ind[:5], bdy_val=0.0, f=1.0)
    np.testing.assert_allclose(d_sh, d_ref, atol=1e-8)
    h_sh = _exec.dijkstra_fit_sharded(dist, W, train_ind[:5], 0.0, 1.0,
                                      hopf_lax=True)
    h_ref = _eik.dijkstra_hl(g, train_ind[:5], bdy_val=0.0, f=1.0)
    np.testing.assert_allclose(h_sh, h_ref, atol=1e-8)


def test_active_learning_with_distributed_model(mesh, clusters):
    """Active learning drives a distributed model: every refit (init +
    per-query update) runs sharded (reference active_learning.py:56-117)."""
    W, labels, train_ind = clusters
    model = gl.ssl.laplace(W).distribute(mesh)
    al = gl.active_learning.active_learner(
        model, gl.active_learning.unc_sampling(), train_ind,
        labels[train_ind])
    for _ in range(2):
        q = al.select_queries(batch_size=1)
        al.update(q, labels[q])
    assert len(al.labeled_ind) == len(train_ind) + 2


def test_incres_clustering_sharded(mesh, clusters):
    """Sharded INCRES: padding-aware plant/grow/harvest loop reaches
    comparable clustering accuracy over the mesh (stochastic model —
    compare accuracy bands, not labels)."""
    W, labels, _ = clusters
    acc_sh = gl.clustering.clustering_accuracy(
        gl.clustering.incres(W, num_clusters=3, T=40,
                             seed=0).distribute(mesh).fit_predict(),
        labels)
    acc_ref = gl.clustering.clustering_accuracy(
        gl.clustering.incres(W, num_clusters=3, T=40, seed=0).fit_predict(),
        labels)
    assert acc_sh > 75.0 and abs(acc_sh - acc_ref) < 15.0, (acc_sh, acc_ref)


def test_banded_distance_and_lip_families(band_cfg, clusters):
    """Round-3 verdict item 2: the sharded distance/HJ family rides the
    banded operator — dijkstra/HL through the tropical band kernel
    (``ShardedOp.minplus_``), peikonal/weighted-AMLE through the halo
    neighbor gather (``neighbor_take_``), unweighted lip through the band
    lip reductions (``lip_reduce_``) — and matches the single-device
    solvers."""
    from graphlearning_tpu.parallel import execute as _exec
    from graphlearning_tpu.parallel.band_shard import ShardedOp
    from graphlearning_tpu.solvers import eikonal as _eik

    W, labels, train_ind = clusters
    dist = _exec.Distributor(band_cfg)
    op, n = dist.operator(W)
    assert isinstance(op, ShardedOp) and hasattr(op, "minplus_")
    g = gl.SparseGraph.from_scipy(W)

    d_sh, cp_sh = _exec.dijkstra_fit_sharded(
        dist, W, train_ind[:5], 0.0, 1.0, return_cp=True)
    d_ref, cp_ref = _eik.dijkstra(g, train_ind[:5], bdy_val=0.0, f=1.0,
                                  return_cp=True)
    np.testing.assert_allclose(d_sh, d_ref, atol=1e-6)
    assert np.mean(cp_sh == cp_ref) > 0.99      # ties may break differently

    h_sh = _exec.dijkstra_fit_sharded(dist, W, train_ind[:5], 0.0, 1.0,
                                      hopf_lax=True)
    h_ref = _eik.dijkstra_hl(g, train_ind[:5], bdy_val=0.0, f=1.0)
    np.testing.assert_allclose(h_sh, h_ref, atol=1e-6)

    r_sh = _exec.dijkstra_fit_sharded(dist, W, train_ind[:5], 0.0, 1.0,
                                      reciprocal_weights=True)
    r_ref = _eik.dijkstra(g, train_ind[:5], bdy_val=0.0, f=1.0,
                          reciprocal_weights=True)
    np.testing.assert_allclose(r_sh, r_ref, atol=1e-6)

    # model-level fits through the banded operator (amle/plaplace ->
    # lip_fit_sharded, peikonal -> peikonal_fit_sharded)
    for cls, min_agree in ((gl.ssl.amle, 0.99), (gl.ssl.plaplace, 0.99),
                           (gl.ssl.peikonal, 0.99)):
        m_sh = cls(W).distribute(band_cfg)
        m_ref = cls(W)
        pred_ref = m_ref.fit_predict(train_ind, labels[train_ind])
        pred_sh = m_sh.fit_predict(train_ind, labels[train_ind])
        agree = np.mean(pred_sh == pred_ref)
        assert agree >= min_agree, (cls.__name__, agree)


def test_sharded_hub_graph_bucketed(mesh):
    """Degree-skewed (band-hostile) graphs shard through the capped-ELL +
    spill hybrid (round-4: the full padded ELL would pad every gather to
    the hub degree, and the auto band build OOM'd on the real chip).
    Parity for the spmm family; distance solvers keep full-ELL slots."""
    from graphlearning_tpu.parallel import execute as _exec
    from graphlearning_tpu.parallel.shard import ShardedBucketedGraph
    from graphlearning_tpu.solvers import eikonal as _eik

    rs = np.random.RandomState(4)
    n, ncls, dim = 1500, 3, 30
    centers = rs.randn(ncls, dim) * 1.0     # CONNECTED (disconnection
    labels = rs.randint(0, ncls, n)         # makes the normalized
    X = centers[labels] + rs.randn(n, dim)  # Laplacian CG ill-posed)
    W = gl.weightmatrix.knn(X, 12)
    from scipy.sparse.csgraph import connected_components

    assert connected_components(W, directed=False)[0] == 1
    deg = np.diff(W.tocsr().indptr)
    assert deg.max() > 1.5 * np.percentile(deg, 95)   # genuinely skewed
    train_ind = np.concatenate(
        [rs.choice(np.where(labels == c)[0], 5, replace=False)
         for c in range(ncls)])

    dist = _exec.Distributor(mesh)
    op, _ = dist.operator(W)
    assert isinstance(op, ShardedBucketedGraph)
    # slot economy: capped ELL + spill ≪ full-ELL slots
    assert op.k < 0.7 * deg.max()

    # spmm parity through the hybrid
    from graphlearning_tpu.ops import graphops as _ops

    Xf = rs.randn(op.n, 4)
    Xs = dist.put_rows(Xf[: W.shape[0]], op=op)
    out = _ops.spmm(op, Xs)
    np.testing.assert_allclose(dist.gather(out, W.shape[0], op=op),
                               W @ Xf[: W.shape[0]], atol=1e-9)

    # model parity (laplace + poisson + volume_mbo through the hybrid)
    for mk in (lambda: gl.ssl.laplace(W, tol=1e-9),
               lambda: gl.ssl.poisson(W, tol=1e-9)):
        m_sh = mk().distribute(mesh)
        m_ref = mk()
        pred_sh = m_sh.fit_predict(train_ind, labels[train_ind])
        pred_ref = m_ref.fit_predict(train_ind, labels[train_ind])
        assert np.mean(pred_sh == pred_ref) >= 0.99

    # distance solver keeps full-ELL slots and stays correct
    g = gl.SparseGraph.from_scipy(W)
    d_sh = _exec.dijkstra_fit_sharded(dist, W, train_ind[:4], 0.0, 1.0)
    d_ref = _eik.dijkstra(g, train_ind[:4], bdy_val=0.0, f=1.0)
    np.testing.assert_allclose(d_sh, d_ref, atol=1e-8)
