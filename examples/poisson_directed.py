"""Poisson learning on a directed (non-symmetrized) graph
(reference examples/poisson_directed.py)."""
import sklearn.datasets as datasets
import graphlearning_tpu as gl

X, labels = datasets.make_moons(n_samples=500, noise=0.1, random_state=0)
W = gl.weightmatrix.knn(X, 10, symmetrize=False)
train_ind = gl.trainsets.generate(labels, rate=5, seed=0)
model = gl.ssl.poisson(W, solver="gradient_descent")
pred = model.fit_predict(train_ind, labels[train_ind])
print("Accuracy: %.2f%%" % gl.ssl.ssl_accuracy(pred, labels, train_ind))
