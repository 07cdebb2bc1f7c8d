"""Warm-started (and optionally distributed) active learning.

`active_learner(warm_start=True)` seeds every refit's CG with the
previous round's solution — same predictions, measurably fewer CG
iterations (81 -> 68 at the n=70k benchmark config; the reference
refits cold, active_learning.py:108-117).  `spectral_covariance` builds
the acquisition covariance from the model — through the SHARDED
eigensolver when the model is distributed, so the whole loop runs on
the mesh.
"""
import numpy as np
import sklearn.datasets as datasets

import graphlearning_tpu as gl
from graphlearning_tpu import active_learning as al

X, labels = datasets.make_moons(n_samples=800, noise=0.12, random_state=0)
W = gl.weightmatrix.knn(X, 8)
train_ind = gl.trainsets.generate(labels, rate=2, seed=1)

model = gl.ssl.laplace(W)
# model = gl.ssl.laplace(W).distribute("auto")   # sharded variant
C0, V = al.spectral_covariance(model, k=12, tau=0.11)
learner = al.active_learner(model, al.var_opt(C0, V=V),
                            train_ind, labels[train_ind],
                            warm_start=True)

for step in range(8):
    q = learner.select_queries(batch_size=1)
    learner.update(q, labels[q])          # warm-started refit
    acc = gl.ssl.ssl_accuracy(model.predict(), labels, learner.labeled_ind)
    print(f"query {step}: node {int(q[0])}  accuracy {acc:.2f}")
