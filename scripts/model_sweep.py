"""Full model sweep (the BASELINE_MEASURED 'Full model sweep' table):
every SSL/clustering family, warm fit time + accuracy on the n=10k
10-class Gaussian-mixture kNN graph at 2 labels/class.  Re-run each
round as a broad dispatch-regression check (round 4: the operator
choice changed for every band-hostile graph)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import graphlearning_tpu as gl

n = int(os.environ.get("N", 10000))
rs = np.random.RandomState(0)
ncls, dim = 10, 30
centers = rs.randn(ncls, dim) * 1.0
labels = rs.randint(0, ncls, n)
pts = (centers[labels] + rs.randn(n, dim)).astype(np.float32)
W = gl.weightmatrix.knn(pts, 10)
train_ind = gl.trainsets.generate(labels, rate=2, seed=0)
priors = gl.utils.class_priors(labels)

models = [
    ("laplace", lambda: gl.ssl.laplace(W)),
    ("poisson (cg)", lambda: gl.ssl.poisson(W)),
    ("poisson (gd)", lambda: gl.ssl.poisson(W, solver="gradient_descent")),
    ("poisson (spectral)", lambda: gl.ssl.poisson(W, solver="spectral")),
    ("randomwalk", lambda: gl.ssl.randomwalk(W)),
    ("laplace + wnll", lambda: gl.ssl.laplace(W, reweighting="wnll")),
    ("plaplace p=10", lambda: gl.ssl.plaplace(W, p=10)),
    ("amle", lambda: gl.ssl.amle(W)),
    ("peikonal", lambda: gl.ssl.peikonal(W)),
    ("graph_nearest_neighbor", lambda: gl.ssl.graph_nearest_neighbor(W)),
    ("poisson_mbo", lambda: gl.ssl.poisson_mbo(W, class_priors=priors)),
    ("volume_mbo", lambda: gl.ssl.volume_mbo(W, class_priors=priors)),
    ("multiclass_mbo", lambda: gl.ssl.multiclass_mbo(W)),
    ("modularity_mbo", lambda: gl.ssl.modularity_mbo(W)),
    ("centered_kernel", lambda: gl.ssl.centered_kernel(W)),
    ("sparse_label_propagation",
     lambda: gl.ssl.sparse_label_propagation(W)),
]

print(f"| Model | warm s | acc % |  (n={n}, 2 labels/class, round-4 "
      "dispatch)", flush=True)
print("|---|---|---|", flush=True)
for name, mk in models:
    try:
        m = mk()
        m.fit_predict(train_ind, labels[train_ind])       # cold
        t0 = time.time()
        pred = m.fit_predict(train_ind, labels[train_ind])
        dt = time.time() - t0
        a = gl.ssl.ssl_accuracy(pred, labels, train_ind)
        print(f"| {name} | {dt:.2f} | {a:.1f} |", flush=True)
    except Exception as e:
        print(f"| {name} | FAIL {type(e).__name__}: {str(e)[:120]} | |",
              flush=True)

for name, mk in (
    ("spectral clustering",
     lambda: gl.clustering.spectral(W, num_clusters=ncls)),
    ("incres clustering",
     lambda: gl.clustering.incres(W, num_clusters=ncls, seed=0)),
):
    try:
        m = mk()
        m.fit_predict()
        t0 = time.time()
        pred = m.fit_predict()
        dt = time.time() - t0
        a = gl.clustering.clustering_accuracy(pred, labels)
        print(f"| {name} | {dt:.2f} | {a:.1f} |", flush=True)
    except Exception as e:
        print(f"| {name} | FAIL {type(e).__name__}: {str(e)[:120]} | |",
              flush=True)
