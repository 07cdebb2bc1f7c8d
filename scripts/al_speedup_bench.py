"""Measured per-query active-learning speedup from warm-started refits
(VERDICT r3 item 5 'Done' criterion): laplace + poisson on the config-2
scale surrogate, cold vs warm update() times."""
import os
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, "/root/repo")

import graphlearning_tpu as gl
from graphlearning_tpu import active_learning as al

n = int(os.environ.get("N", 70000))
W = sp.load_npz(f"/tmp/calib_graph_n{n}_k10_d30.npz")
rs = np.random.RandomState(0)
centers = rs.randn(10, 30) * 1.0
labels = rs.randint(0, 10, n)
train_ind = gl.trainsets.generate(labels, rate=3, seed=0)

for name, mk in (("laplace", lambda: gl.ssl.laplace(W, tol=1e-8)),
                 ("poisson", lambda: gl.ssl.poisson(W, tol=1e-8))):
    for warm in (False, True):
        m = mk()
        learner = al.active_learner(m, al.unc_sampling(), train_ind,
                                    labels[train_ind], warm_start=warm)
        # one throwaway query to absorb compiles
        q = learner.select_queries(batch_size=1)
        learner.update(q, labels[q])
        # time the whole query ROUND (select + update): the device-
        # resident warm loop dispatches the refit asynchronously, so its
        # `update` returns in ms and the solve completes inside the next
        # `select` — only the round total is meaningful
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            q = learner.select_queries(batch_size=1)
            learner.update(q, labels[q])
            times.append(time.perf_counter() - t0)
        acc = gl.ssl.ssl_accuracy(m.predict(), labels, learner.labeled_ind)
        print(f"{name:8s} warm_start={warm}: round "
              f"median {np.median(times):.3f}s min {min(times):.3f}s "
              f"acc {acc:.2f}", flush=True)
