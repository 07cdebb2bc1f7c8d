"""Distributed model fitting over a device mesh.

Any supported model runs SPMD over the mesh's node axis via
``model.distribute(...)`` — on real multi-chip hardware the SpMMs ride
the partitioned tiled-band Pallas kernel with ppermute halo exchange
(``parallel/band_shard.py``); this example uses the virtual 8-device CPU
mesh so it runs anywhere.  (The reference has no distributed runtime —
SURVEY.md §2.3; this is the framework's pod-scale extension.)
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import sklearn.datasets as datasets

import graphlearning_tpu as gl

X, labels = datasets.make_moons(n_samples=2000, noise=0.1, random_state=0)
W = gl.weightmatrix.knn(X, 10)
train_ind = gl.trainsets.generate(labels, rate=5, seed=0)

# one config drives mesh shape + sharded kernel choice
cfg = gl.GLTConfig(mesh_shape=(8,), mesh_axes=("nodes",))

for model in (gl.ssl.poisson(W), gl.ssl.laplace(W),
              gl.ssl.randomwalk(W)):
    pred = model.distribute(cfg).fit_predict(train_ind, labels[train_ind])
    acc = gl.ssl.ssl_accuracy(pred, labels, train_ind)
    print(f"{model.name:16s} sharded 8-way: accuracy {acc:.1f}%")

cpred = gl.clustering.spectral(W, num_clusters=2).distribute(cfg).fit_predict()
print(f"spectral         sharded 8-way: accuracy "
      f"{gl.clustering.clustering_accuracy(cpred, labels):.1f}%")
