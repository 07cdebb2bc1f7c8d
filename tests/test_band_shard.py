"""Partitioned tiled-band SpMM (parallel/band_shard.py): the Pallas fast
path sharded over the virtual 8-device CPU mesh (interpret mode) matches
scipy, including halo exchange across block boundaries and the residual
path for out-of-halo edges."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.sparse as sp

import graphlearning_tpu as gl
from graphlearning_tpu import parallel
from graphlearning_tpu.parallel.band_shard import ShardedBandPlan


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return parallel.make_mesh()


def _rcm_knn(n, k=6, seed=0):
    from scipy.spatial import cKDTree
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    rs = np.random.RandomState(seed)
    pts = rs.rand(n, 2)
    dist, ind = cKDTree(pts).query(pts, k=k + 1)
    dist, ind = dist[:, 1:], ind[:, 1:]
    w = np.exp(-(dist / np.maximum(dist[:, -1:], 1e-12)) ** 2)
    rows = np.repeat(np.arange(n), k)
    W = sp.csr_matrix((w.ravel(), (rows, ind.ravel())), shape=(n, n))
    W = (W + W.T) / 2
    perm = np.asarray(reverse_cuthill_mckee(W, symmetric_mode=True))
    return W[perm][:, perm].tocsr()


@pytest.mark.parametrize("mode", ["f32", "bf16x3"])
def test_sharded_band_matches_scipy(mesh, mode):
    n = 1024
    W = _rcm_knn(n)
    plan = ShardedBandPlan(W, mesh, R=64, WT=64, mode=mode, interpret=True)
    rs = np.random.RandomState(1)
    X = rs.randn(n, 128).astype(np.float32)
    out = np.asarray(plan.spmm(X))[:n]
    ref = W @ X
    tol = 1e-4 if mode == "f32" else 5e-3
    assert np.allclose(out, ref, atol=tol * np.abs(ref).max()), (
        np.abs(out - ref).max())


def test_sharded_band_residual_path(mesh):
    """A long-range edge (far outside any halo) exercises the residual."""
    n = 1024
    W = _rcm_knn(n).tolil()
    W[0, n - 1] = 0.7
    W[n - 1, 0] = 0.7
    W = W.tocsr()
    plan = ShardedBandPlan(W, mesh, R=64, WT=64, mode="f32",
                           interpret=True, max_halo_frac=0.5)
    assert len(plan.res_rows) >= 2        # the long edge went to residual
    rs = np.random.RandomState(2)
    X = rs.randn(n, 128).astype(np.float32)
    out = np.asarray(plan.spmm(X))[:n]
    ref = W @ X
    assert np.allclose(out, ref, atol=1e-4 * np.abs(ref).max())


def test_sharded_band_uneven_n(mesh):
    """n not a multiple of the block unit: padding rows stay zero."""
    n = 777
    W = _rcm_knn(n, k=5, seed=3)
    plan = ShardedBandPlan(W, mesh, R=64, WT=64, mode="f32", interpret=True)
    rs = np.random.RandomState(3)
    X = rs.randn(n, 128).astype(np.float32)
    full = np.asarray(plan.spmm(X))
    assert np.allclose(full[:n], W @ X, atol=1e-4)
    assert np.allclose(full[n:], 0.0)
