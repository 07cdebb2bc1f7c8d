"""Model-level dispatch A/B on the 30-d config-2 surrogate (n=70k):
poisson + laplace warm fit times through (a) the new GatherAccel path,
(b) the old band path (pre-gate bypassed), (c) the plain full-ELL path.
"""
import os
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, "/root/repo")

import graphlearning_tpu as gl
from graphlearning_tpu.ops import accel as _accel

n = int(os.environ.get("N", 70000))
W0 = sp.load_npz(f"/tmp/calib_graph_n{n}_k10_d30.npz")
rs = np.random.RandomState(0)
labels = rs.randint(0, 10, n)     # same labels as calib builder (seed 0,
centers = rs.randn(10, 30)        # order differs but any labels work for
labels = rs.randint(0, 10, n)     # timing; accuracy is vs these labels)
# rebuild the ACTUAL labels used to build the graph: calib built
# centers -> labels -> pts with one RandomState(0) stream
rs = np.random.RandomState(0)
centers = rs.randn(10, 30) * 1.0
labels = rs.randint(0, 10, n)
train_ind = gl.trainsets.generate(labels, rate=1, seed=0)

real_hostile = _accel._band_hostile
real_enabled = _accel.enabled


def fit_time(mk, reps=3):
    m = mk()
    t0 = time.time()
    pred = m.fit_predict(train_ind, labels[train_ind])   # cold (compile)
    cold = time.time() - t0
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        pred = m.fit_predict(train_ind, labels[train_ind])
        best = min(best, time.time() - t0)
    acc = gl.ssl.ssl_accuracy(pred, labels, train_ind)
    return cold, best, acc, m


for name in ("gather", "band", "plain"):
    _accel._band_hostile = real_hostile
    _accel.enabled = real_enabled
    if name == "band":
        _accel._band_hostile = lambda W: False
    elif name == "plain":
        _accel.enabled = lambda: False

    W = W0.copy()
    for model_name, mk in (
        ("poisson", lambda: gl.ssl.poisson(W)),
        ("laplace", lambda: gl.ssl.laplace(W)),
    ):
        t0 = time.time()
        cold, warm, acc, m = fit_time(mk)
        which = type(getattr(m, "_accel_cache", None)).__name__
        print(f"{name:7s} {model_name:8s} cold {cold:7.2f}s "
              f"warm {warm:6.3f}s acc {acc:5.2f} accel={which}",
              flush=True)

_accel._band_hostile = real_hostile
_accel.enabled = real_enabled
