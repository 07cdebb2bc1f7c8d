"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

Parity tests compare against float64 scipy (the reference implementation's
numerics, SURVEY.md §7.3), so tests force the CPU backend with x64 on.
Multi-device sharding tests use the 8 virtual host devices
(``--xla_force_host_platform_device_count=8``).
"""

import os

# The axon sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon, so env vars set here are too late for platform
# selection — use jax.config instead (backend init is still lazy, so
# XLA_FLAGS set before the first computation still takes effect).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import scipy.sparse as sp  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(42)


def random_knn_csr(n, k, seed=0, symmetrize=True):
    """Random kNN-like sparse matrix with positive weights (float64)."""
    rs = np.random.RandomState(seed)
    rows = np.repeat(np.arange(n), k)
    cols = rs.randint(0, n, size=n * k)
    vals = rs.rand(n * k) + 0.1
    W = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    W.setdiag(0)
    W.eliminate_zeros()
    if symmetrize:
        W = (W + W.T) / 2
    return W.tocsr()


@pytest.fixture(scope="session")
def W_small():
    return random_knn_csr(200, 8, seed=1)


@pytest.fixture(scope="session")
def W_medium():
    return random_knn_csr(1500, 10, seed=2)
