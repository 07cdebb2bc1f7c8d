"""Active learning with V-optimality (reference examples/al_test.py, fixed
to the current API)."""
import numpy as np
import sklearn.datasets as datasets
import graphlearning_tpu as gl
from graphlearning_tpu import active_learning as al

X, labels = datasets.make_moons(n_samples=300, noise=0.1, random_state=0)
W = gl.weightmatrix.knn(X, 8)
G = gl.graph(W)
vals, vecs = G.eigen_decomp(normalization="normalized", k=20)
model = gl.ssl.laplace(W)
train_ind = gl.trainsets.generate(labels, rate=1, seed=0)

learner = al.active_learner(
    model, al.var_opt(np.diag(1.0 / (vals + 0.11)), V=vecs),
    train_ind, labels[train_ind])
for step in range(10):
    q = learner.select_queries(batch_size=1)
    learner.update(q, labels[q])
    acc = gl.ssl.ssl_accuracy(model.predict(), labels, learner.labeled_ind)
    print(f"step {step}: {len(learner.labeled_ind)} labels, {acc:.2f}%")
