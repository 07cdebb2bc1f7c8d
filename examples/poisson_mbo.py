"""PoissonMBO / volumeMBO on two moons (reference examples/poisson_mbo.py)."""
import numpy as np
import sklearn.datasets as datasets
import graphlearning_tpu as gl

X, labels = datasets.make_moons(n_samples=500, noise=0.1, random_state=0)
W = gl.weightmatrix.knn(X, 10)
train_ind = gl.trainsets.generate(labels, rate=3, seed=0)
class_priors = gl.utils.class_priors(labels)

for model in (gl.ssl.poisson_mbo(W, class_priors),
              gl.ssl.volume_mbo(W, class_priors)):
    pred = model.fit_predict(train_ind, labels[train_ind])
    print(f"{model.name}: {gl.ssl.ssl_accuracy(pred, labels, train_ind):.2f}%")
