"""AOT warm-up: pre-compile a model's solver programs before labels exist.

XLA compiles per shape; on a remote-TPU tunnel the first fit of a large
model can cost minutes of compilation.  ``gl.warmup(model, num_classes)``
runs one synthetic fit at the REAL (n, k, num_classes) shapes, so the
first real ``fit_predict`` executes at warm speed (measured at n=70k:
first real fit 0.39s after warmup vs 100s+ cold — BASELINE_MEASURED.md).
Pairs with the persistent compilation cache for cross-process reuse.
"""

import time

import numpy as np
import sklearn.datasets as datasets

import graphlearning_tpu as gl

X, labels = datasets.make_moons(n_samples=2000, noise=0.1, random_state=0)
W = gl.weightmatrix.knn(X, 10)

model = gl.ssl.poisson(W)
t0 = time.perf_counter()
gl.warmup(model, num_classes=2)            # before labels are available
print(f"warmup: {time.perf_counter() - t0:.2f}s (all compiles absorbed)")

train_ind = gl.trainsets.generate(labels, rate=5, seed=0)
t0 = time.perf_counter()
pred = model.fit_predict(train_ind, labels[train_ind])
print(f"first real fit: {time.perf_counter() - t0:.3f}s, "
      f"accuracy {gl.ssl.ssl_accuracy(pred, labels, train_ind):.1f}%")
