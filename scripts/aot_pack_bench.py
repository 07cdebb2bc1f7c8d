"""AOT pack fresh-process measurement (VERDICT r3 item 9 'Done'
criterion): process A builds + saves the config-2-shape Poisson pack;
process B (FRESH) loads it and runs the first fit — target < 5 s.

Run:  python scripts/aot_pack_bench.py save
      python scripts/aot_pack_bench.py load      # in a fresh process
"""
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, "/root/repo")
t_start = time.time()
import graphlearning_tpu as gl

W = sp.load_npz("/tmp/calib_graph_n70000_k10_d30.npz")
rs = np.random.RandomState(0)
centers = rs.randn(10, 30) * 1.0
labels = rs.randint(0, 10, 70000)
train_ind = gl.trainsets.generate(labels, rate=1, seed=0)
PACK = "/tmp/poisson_n70000.pack"

if sys.argv[1] == "save":
    t0 = time.time()
    gl.aot.save_poisson_pack(W, 10, PACK, tol=1e-3)
    print(f"pack saved in {time.time()-t0:.1f}s", flush=True)
    fit = gl.aot.load_poisson_pack(W, PACK)
    pred = fit(train_ind, labels[train_ind])
    ref = gl.ssl.poisson(W).fit_predict(train_ind, labels[train_ind])
    print(f"same-process parity: agree {np.mean(pred == ref):.4f} "
          f"acc {gl.ssl.ssl_accuracy(pred, labels, train_ind):.2f}",
          flush=True)
else:
    t0 = time.time()
    fit = gl.aot.load_poisson_pack(W, PACK)
    t_load = time.time() - t0
    t0 = time.time()
    pred = fit(train_ind, labels[train_ind])
    t_fit = time.time() - t0
    acc = gl.ssl.ssl_accuracy(pred, labels, train_ind)
    total = time.time() - t_start
    print(f"FRESH process: load {t_load:.2f}s first-fit {t_fit:.2f}s "
          f"total-from-import {total:.2f}s acc {acc:.2f}", flush=True)
    t0 = time.time()
    fit(train_ind, labels[train_ind])
    print(f"second fit {time.time()-t0:.2f}s", flush=True)
