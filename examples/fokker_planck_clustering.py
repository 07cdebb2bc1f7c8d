"""Fokker-Planck clustering (reference examples/fokker_planck_clustering.py)."""
import sklearn.datasets as datasets
import graphlearning_tpu as gl

X, labels = datasets.make_moons(n_samples=300, noise=0.08, random_state=0)
W = gl.weightmatrix.knn(X, 10)
pred = gl.clustering.fokker_planck(W, num_clusters=2, beta=0.3, t=10).fit_predict()
print("accuracy: %.1f%%" % gl.clustering.clustering_accuracy(pred, labels))
