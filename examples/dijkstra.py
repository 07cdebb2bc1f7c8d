"""Graph eikonal distance vs the exact cone (reference examples/dijkstra.py)."""
import numpy as np
import graphlearning_tpu as gl

n = 3000
rs = np.random.RandomState(0)
X = rs.rand(n, 2)
X[0] = [0.5, 0.5]
W = gl.weightmatrix.epsilon_ball(X, 0.05)
G = gl.graph(W)
u = G.dijkstra([0])
err = np.abs(u - np.linalg.norm(X - X[0], axis=1)).max()
print("sup-norm error vs exact cone:", err)
