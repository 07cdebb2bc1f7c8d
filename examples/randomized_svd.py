"""Randomized SVD vs exact spectrum (reference examples/randomized_svd.py)."""
import numpy as np
import scipy.sparse as sp
import graphlearning_tpu as gl

rs = np.random.RandomState(0)
n = 500
rows = np.repeat(np.arange(n), 8)
cols = rs.randint(0, n, n * 8)
W = sp.coo_matrix((rs.rand(n * 8), (rows, cols)), shape=(n, n)).tocsr()
W = (W + W.T) / 2
G = gl.graph(W)
vals_e, vecs_e = G.eigen_decomp(normalization="normalized", k=6, method="exact")
vals_l, vecs_l = G.eigen_decomp(normalization="normalized", k=6,
                                method="lowrank", c=50, q=3)
print("eigenvalue error:", np.abs(vals_e - vals_l).max())
