"""Graph-Laplacian ridge regression (reference examples/regression.py):
yhat = argmin_u ||B(u-y)||^2 + lam * u^T L u, solved matrix-free with the
device CG."""
import numpy as np
import jax.numpy as jnp
import graphlearning_tpu as gl
from graphlearning_tpu.solvers import cg

n, m, lam, k = 1000, 40, 0.1, 20
rs = np.random.RandomState(0)
X = rs.rand(n, m)
y = X.sum(axis=1)
train_ind = rs.choice(n, size=int(0.75 * n), replace=False)
mask = np.zeros(n, bool)
mask[train_ind] = True

W = gl.weightmatrix.knn(X, k)
G = gl.graph(W)
matvec, diag = G.laplacian_op("combinatorial")
Bv = jnp.asarray(mask.astype(float))

def A(u):
    return Bv[:, None] * u + lam * matvec(u)

rhs = jnp.asarray((mask * y))[:, None]
yhat, iters, res = cg.conjgrad(A, rhs, tol=1e-8)
yhat = np.asarray(yhat)[:, 0]
err = np.sqrt(np.mean((yhat[~mask] - y[~mask]) ** 2))
print(f"test RMSE: {err:.4f} (CG iters {int(iters)})")
