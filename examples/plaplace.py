"""p-Laplace / AMLE interpolation (reference examples/plaplace.py)."""
import numpy as np
import sklearn.datasets as datasets
import graphlearning_tpu as gl

X, labels = datasets.make_moons(n_samples=400, noise=0.1, random_state=0)
W = gl.weightmatrix.knn(X, 10)
train_ind = gl.trainsets.generate(labels, rate=3, seed=0)

for model in (gl.ssl.plaplace(W, p=8), gl.ssl.amle(W)):
    pred = model.fit_predict(train_ind, labels[train_ind])
    print(f"{model.name}: {gl.ssl.ssl_accuracy(pred, labels, train_ind):.2f}%")
