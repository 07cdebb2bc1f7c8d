"""p-eikonal equation on a point cloud (reference examples/peikonal.py)."""
import numpy as np
import graphlearning_tpu as gl

rs = np.random.RandomState(0)
X = rs.rand(2000, 2)
W = gl.weightmatrix.knn(X, 10)
G = gl.graph(W)
for p in (1, 2):
    u = G.peikonal([0], p=p)
    print(f"p={p}: max distance {float(np.max(u)):.3f}")
