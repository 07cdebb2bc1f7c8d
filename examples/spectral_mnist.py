"""Spectral clustering at MNIST scale (reference examples/spectral_mnist.py).

Offline fallback: synthetic MNIST-scale clustered point cloud (see
examples/ssl_mnist.py).  Set GLT_MNIST=1 to use the real dataset when the
data files are available.
"""
import os
import numpy as np
import graphlearning_tpu as gl

if os.environ.get("GLT_MNIST"):
    data, labels = gl.datasets.load("mnist", metric="vae")
else:
    n, ncls = 70000, 10
    rs = np.random.RandomState(0)
    centers = rs.randn(ncls, 20) * 1.5
    labels = rs.randint(0, ncls, n)
    data = centers[labels] + rs.randn(n, 20)

W = gl.weightmatrix.knn(data, 10)
model = gl.clustering.spectral(W, num_clusters=10, method="NgJordanWeiss")
pred_labels = model.fit_predict()
accuracy = gl.clustering.clustering_accuracy(pred_labels, labels)
print(f"spectral clustering accuracy: {accuracy:.2f}%")
