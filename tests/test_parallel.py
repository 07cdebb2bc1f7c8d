"""Sharding tests on the virtual 8-device CPU mesh: sharded SpMM (GSPMD
and explicit ring halo exchange) must match the single-device op; a full
sharded Poisson solve must match the unsharded one."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphlearning_tpu.core.sparse import SparseGraph
from graphlearning_tpu import ops, parallel
from tests.conftest import random_knn_csr


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return parallel.make_mesh()


@pytest.fixture(scope="module")
def graph_and_features():
    W = random_knn_csr(1000, 10, seed=5)
    g = SparseGraph.from_scipy(W)
    rs = np.random.RandomState(0)
    X = rs.randn(1000, 16)
    return g, X


def test_sharded_spmm_gspmd(mesh, graph_and_features):
    g, X = graph_and_features
    gs = parallel.shard_graph(g, mesh)
    Xs = parallel.put_features(X, mesh)
    out = parallel.sharded_spmm(gs, Xs, mesh)
    ref = np.asarray(ops.spmm(g, jnp.asarray(X)))
    np.testing.assert_allclose(np.asarray(out)[: g.n], ref, rtol=1e-12)


def test_sharded_spmm_ring(mesh, graph_and_features):
    g, X = graph_and_features
    gs = parallel.shard_graph(g, mesh)
    Xs = parallel.put_features(X, mesh)
    out = parallel.sharded_spmm_ring(gs, Xs, mesh)
    ref = np.asarray(ops.spmm(g, jnp.asarray(X)))
    # ring accumulation reorders the k-sum: identical up to fp reordering
    np.testing.assert_allclose(np.asarray(out)[: g.n], ref, rtol=1e-9, atol=1e-12)


def test_sharded_poisson_solve(mesh, graph_and_features):
    """Full CG Poisson solve with sharded graph == unsharded solve."""
    g, X = graph_and_features
    n = g.n
    rs = np.random.RandomState(1)
    b = rs.randn(n, 3)
    b -= b.mean(axis=0)

    from graphlearning_tpu.solvers.cg import conjgrad

    deg = ops.degree_vector(g)
    s_single = 1.0 / jnp.sqrt(deg)

    def Lnorm(Xv):
        return Xv - s_single[:, None] * ops.spmm(g, s_single[:, None] * Xv)

    x_ref, _, _ = conjgrad(Lnorm, jnp.asarray(s_single[:, None] * b), tol=1e-10)

    gs = parallel.shard_graph(g, mesh)
    bs = parallel.put_features(b, mesh)
    deg_s = ops.degree_vector(gs)
    deg_s = jnp.where(deg_s == 0, 1.0, deg_s)
    s_sh = 1.0 / jnp.sqrt(deg_s)

    def Lnorm_sh(Xv):
        return Xv - s_sh[:, None] * ops.spmm(gs, s_sh[:, None] * Xv)

    x_sh, _, _ = conjgrad(Lnorm_sh, s_sh[:, None] * bs, tol=1e-10)
    np.testing.assert_allclose(
        np.asarray(x_sh)[:n], np.asarray(x_ref), rtol=1e-6, atol=1e-8
    )


def test_pad_graph(graph_and_features):
    g, X = graph_and_features
    gp = parallel.pad_graph_to(g, 8)
    assert gp.n % 8 == 0
    ref = np.asarray(ops.spmm(g, jnp.asarray(X)))
    Xp = np.concatenate([X, np.zeros((gp.n - g.n, X.shape[1]))])
    out = np.asarray(ops.spmm(gp, jnp.asarray(Xp)))
    np.testing.assert_allclose(out[: g.n], ref, rtol=1e-12)
