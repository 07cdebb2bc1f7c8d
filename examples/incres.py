"""INCRES incremental-reseeding clustering (reference examples/incres_mnist.py,
on two moons to stay offline-friendly)."""
import sklearn.datasets as datasets
import graphlearning_tpu as gl

X, labels = datasets.make_moons(n_samples=400, noise=0.08, random_state=0)
W = gl.weightmatrix.knn(X, 10)
pred = gl.clustering.incres(W, num_clusters=2, T=60, seed=0).fit_predict()
print("accuracy: %.1f%%" % gl.clustering.clustering_accuracy(pred, labels))
