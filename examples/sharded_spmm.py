"""TPU-specific: mesh-sharded SpMM with ring halo exchange.
Run with XLA_FLAGS=--xla_force_host_platform_device_count=8 on CPU, or on
a real multi-chip TPU slice."""
import numpy as np
import jax
import graphlearning_tpu as gl
from graphlearning_tpu import parallel

devices = jax.devices()
mesh = jax.sharding.Mesh(np.asarray(devices).reshape(len(devices), 1),
                         axis_names=("nodes", "batch"))
rs = np.random.RandomState(0)
X = rs.rand(1024, 2)
W = gl.weightmatrix.knn(X, 8)
g = parallel.shard_graph(gl.SparseGraph.from_scipy(W), mesh)
F = parallel.put_features(rs.randn(g.n, 16), mesh)
out = parallel.sharded_spmm_ring(g, F, mesh)
print("sharded SpMM ok:", out.shape, "on", len(devices), "devices")
