"""Laplace + Poisson learning on two moons (reference examples/ssl_twomoons.py)."""
import numpy as np
import sklearn.datasets as datasets
import graphlearning_tpu as gl

X, labels = datasets.make_moons(n_samples=500, noise=0.1, random_state=0)
W = gl.weightmatrix.knn(X, 10)
train_ind = gl.trainsets.generate(labels, rate=5, seed=0)
train_labels = labels[train_ind]

for model in (gl.ssl.laplace(W), gl.ssl.poisson(W)):
    pred = model.fit_predict(train_ind, train_labels)
    acc = gl.ssl.ssl_accuracy(pred, labels, train_ind)
    print(f"{model.name}: {acc:.2f}%")
