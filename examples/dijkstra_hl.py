"""Hopf-Lax Hamilton-Jacobi distance (reference examples/dijkstra_hl.py)."""
import numpy as np
import graphlearning_tpu as gl

n = 3000
rs = np.random.RandomState(1)
X = rs.rand(n, 2)
X[0] = [0.5, 0.5]
W = gl.weightmatrix.knn(X, 12, kernel="distance")
G = gl.graph(W)
u = G.dijkstra_hl([0])
print("max HL distance:", float(np.max(u)))
