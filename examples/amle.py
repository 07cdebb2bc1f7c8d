"""AMLE (absolutely minimal Lipschitz extension) interpolation on a grid
graph (reference graph.amle, graph.py:1281-1332; the reference exercises it
through the docs rather than a standalone example)."""
import numpy as np
import graphlearning_tpu as gl

# 2-D grid graph with two boundary points at opposite corners
m = 40
W = gl.weightmatrix.grid_graph(m, m)
n = W.shape[0]
g = gl.graph(W)

bdy_set = np.array([0, n - 1])
bdy_val = np.array([0.0, 1.0])
u = g.amle(bdy_set, bdy_val, tol=1e-4)

# AMLE of two points on a grid: values stay within the boundary range and
# interpolate monotonically along the diagonal
assert u.min() >= -1e-3 and u.max() <= 1 + 1e-3
print("corner values:", u[0], u[-1])
print("midpoint value:", u[(m // 2) * m + m // 2])
