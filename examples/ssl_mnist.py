"""SSL at MNIST scale (reference examples/ssl_mnist.py).

The reference downloads the MNIST vae-metric kNN cache; in an offline
environment this script falls back to a synthetic MNIST-scale clustered
point cloud (same n, k, class count — the graph statistics the solvers
see).  Set GLT_MNIST=1 to use ``gl.datasets.load('mnist')`` when the data
files are available under ``./data``.
"""
import os
import numpy as np
import graphlearning_tpu as gl

if os.environ.get("GLT_MNIST"):
    data, labels = gl.datasets.load("mnist", metric="vae")
    W = gl.weightmatrix.knn(data, 10)
else:
    n, ncls = 70000, 10
    rs = np.random.RandomState(0)
    centers = rs.randn(ncls, 20)
    labels = rs.randint(0, ncls, n)
    data = centers[labels] + rs.randn(n, 20)
    W = gl.weightmatrix.knn(data, 10)          # on-device kNN

num_train_per_class = 1
train_ind = gl.trainsets.generate(labels, rate=num_train_per_class, seed=0)
train_labels = labels[train_ind]

models = [gl.ssl.laplace(W), gl.ssl.poisson(W)]
for model in models:
    pred_labels = model.fit_predict(train_ind, train_labels)
    accuracy = gl.ssl.ssl_accuracy(pred_labels, labels, train_ind)
    print(f"{model.name}: {accuracy:.2f}%")
