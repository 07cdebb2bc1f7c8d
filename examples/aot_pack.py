"""AOT warmup pack: compile the Poisson-learning fit once, serialize the
executable, and skip tracing + compilation entirely in later processes
(graphlearning_tpu.aot; no reference equivalent — scipy needs no
compilation).

Typical production split: a one-time `save_poisson_pack` right after the
kNN graph is built (labels need not exist yet), then every serving /
experiment process does `load_poisson_pack` and fits immediately.
"""
import numpy as np
import sklearn.datasets as datasets

import graphlearning_tpu as gl

X, labels = datasets.make_moons(n_samples=2000, noise=0.1, random_state=0)
W = gl.weightmatrix.knn(X, 10)
train_ind = gl.trainsets.generate(labels, rate=5, seed=0)

# one-time (per graph geometry + class count): compile + serialize
gl.aot.save_poisson_pack(W, num_classes=2, path="/tmp/moons_poisson.pack",
                         tol=1e-8)

# any later process: load (deserialize, no compile) and fit
fit = gl.aot.load_poisson_pack(W, "/tmp/moons_poisson.pack")
pred = fit(train_ind, labels[train_ind])
print("AOT-pack poisson accuracy:",
      gl.ssl.ssl_accuracy(pred, labels, train_ind))

# matches the regular model path exactly
ref = gl.ssl.poisson(W, tol=1e-8).fit_predict(train_ind, labels[train_ind])
print("agreement with gl.ssl.poisson:", float(np.mean(pred == ref)))

# the same mechanism covers Laplace learning and spectral clustering
gl.aot.save_laplace_pack(W, num_classes=2, path="/tmp/moons_laplace.pack")
lpred = gl.aot.load_laplace_pack(W, "/tmp/moons_laplace.pack")(
    train_ind, labels[train_ind])
print("AOT-pack laplace accuracy:",
      gl.ssl.ssl_accuracy(lpred, labels, train_ind))

gl.aot.save_spectral_pack(W, num_clusters=2, path="/tmp/moons_spectral.pack")
cpred = gl.aot.load_spectral_pack(W, "/tmp/moons_spectral.pack")()
print("AOT-pack spectral accuracy:",
      gl.clustering.clustering_accuracy(cpred, labels))
