"""SSL with class-prior volume projection (reference examples/ssl_classpriors.py)."""
import numpy as np
import sklearn.datasets as datasets
import graphlearning_tpu as gl

X, labels = datasets.make_moons(n_samples=500, noise=0.1, random_state=1)
W = gl.weightmatrix.knn(X, 10)
class_priors = gl.utils.class_priors(labels)
train_ind = gl.trainsets.generate(labels, rate=1, seed=0)

model = gl.ssl.laplace(W, class_priors=class_priors)
pred = model.fit_predict(train_ind, labels[train_ind])
print("accuracy: %.2f%%" % gl.ssl.ssl_accuracy(pred, labels, train_ind))
