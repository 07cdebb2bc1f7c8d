"""Spectral clustering on two moons (reference examples/spectral_twomoons.py)."""
import sklearn.datasets as datasets
import graphlearning_tpu as gl

X, labels = datasets.make_moons(n_samples=500, noise=0.1, random_state=0)
W = gl.weightmatrix.knn(X, 10)
for method in ("combinatorial", "ShiMalik", "NgJordanWeiss"):
    pred = gl.clustering.spectral(W, num_clusters=2, method=method).fit_predict()
    print(method, "%.1f%%" % gl.clustering.clustering_accuracy(pred, labels))
