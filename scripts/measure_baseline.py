"""Head-to-head measurement of the five BASELINE.json configs:
reference (jwcalder/GraphLearning, scipy/C on host CPU) vs this framework
(graphlearning_tpu on the TPU backend).

The reference's real datasets (MNIST/FashionMNIST/CIFAR vae/aet kNN caches)
are download-only and unavailable offline, so configs 2-5 run on
locally-constructible surrogates at the same scale: an n-point, 10-class
Gaussian-mixture point cloud in latent dimension d (mimicking the VAE/AET
embeddings the reference graphs are built from), with identical k=10 kNN
graphs fed to BOTH implementations.  Accuracy numbers are therefore
comparable head-to-head (same graph, same splits) though not to the
ICML'20 tables.

Usage:  python scripts/measure_baseline.py [--scale small|full] [--configs 1,2,3,4,5]
Writes markdown rows to stdout and appends a results table to
BASELINE_MEASURED.md when --write is passed.
"""

import argparse
import sys
import time

import numpy as np
import scipy.sparse as sp


def _timer(fn, *a, **kw):
    t0 = time.perf_counter()
    out = fn(*a, **kw)
    return out, time.perf_counter() - t0


def _maybe_build_reference_ext():
    """Compile the reference C extension into /tmp/refo1 if absent
    (/tmp is wiped between rounds).  -O1: the reference mbo C code has
    optimization-sensitive UB beyond the shimmed OOB read."""
    import glob
    import os
    import subprocess

    if glob.glob("/tmp/refo1/cextensions*.so"):
        return
    os.makedirs("/tmp/refo1", exist_ok=True)
    setup_src = """
from setuptools import setup, Extension
import numpy
src = ["cextensions.cpp", "lp_iterate.cpp", "hjsolvers.cpp",
       "memory_allocation.cpp", "mbo_convolution.cpp", "mnist_benchmark.cpp",
       "tsne.cpp", "sptree.cpp"]
setup(name="cextensions", ext_modules=[Extension(
    "cextensions", ["/root/reference/c_code/" + s for s in src],
    include_dirs=[numpy.get_include(), "/root/reference/c_code"],
    extra_compile_args=["-O1"])], script_args=["build_ext", "--inplace"])
"""
    with open("/tmp/refo1/setup_ref.py", "w") as fh:
        fh.write(setup_src)
    try:
        subprocess.run([sys.executable, "setup_ref.py"], cwd="/tmp/refo1",
                       capture_output=True, timeout=600, check=True)
    except Exception as e:   # the import-failure warning will fire below
        print(f"warning: reference cextensions build failed: {e}",
              file=sys.stderr)


def load_reference():
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    sys.path.insert(0, "/tmp/refo1")  # compiled cextensions (-O1: the reference mbo C code has optimization-sensitive UB beyond the shimmed OOB read)
    sys.path.insert(0, "/root/reference")
    _maybe_build_reference_ext()
    try:
        import cextensions

        # Upstream OOB-read workaround: mbo_main's CSR row-count loop
        # `while((J[j]==i) & (j < M))` (mnist_benchmark.cpp:151) reads J[M]
        # past the buffer before the bounds check fires (non-short-circuit
        # `&`, operands in the wrong order).  This environment's allocator
        # faults on it (ASan: heap-buffer-overflow READ of size 4 at
        # mnist_benchmark.cpp:151).  Shim: hand the C code views into
        # over-allocated buffers whose one extra slot holds a sentinel that
        # terminates the loop — logical length (PyArray_DIMS) unchanged.
        _orig_volume_mbo = cextensions.volume_mbo

        def _pad_view(a, sentinel):
            b = np.empty(len(a) + 1, a.dtype)
            b[: len(a)] = a
            b[len(a)] = sentinel
            return b[: len(a)]

        def _safe_volume_mbo(u, WJ, WI, WV, *rest):
            return _orig_volume_mbo(
                u, _pad_view(WJ, -1), _pad_view(WI, -1),
                _pad_view(WV, 0.0), *rest)

        cextensions.volume_mbo = _safe_volume_mbo
        sys.modules["graphlearning.cextensions"] = cextensions
    except ImportError:
        print("warning: reference cextensions unavailable; configs 4b/5a skipped",
              file=sys.stderr)
    import graphlearning as rgl
    return rgl


def make_blobs(n, d, num_classes, seed=0, spread=1.0):
    """Gaussian-mixture surrogate for a VAE/AET latent embedding."""
    rs = np.random.RandomState(seed)
    means = rs.randn(num_classes, d) * spread
    labels = rs.randint(0, num_classes, n)
    X = means[labels] + rs.randn(n, d)
    return X.astype(np.float64), labels


def knn_graph(X, k):
    """Exact kNN gaussian graph built once on host; fed to both sides."""
    from scipy.spatial import cKDTree

    n = X.shape[0]
    dist, ind = cKDTree(X).query(X, k=k + 1, workers=-1)
    dist, ind = dist[:, 1:], ind[:, 1:]
    eps = np.maximum(dist[:, -1:] ** 2, 1e-12)
    w = np.exp(-4 * dist ** 2 / eps)
    rows = np.repeat(np.arange(n), k)
    W = sp.coo_matrix((w.ravel(), (rows, ind.ravel())), shape=(n, n)).tocsr()
    W = W.maximum(W.T)   # reference gaussian-kernel symmetrization (max)
    W.setdiag(0)
    W.eliminate_zeros()
    return W


def pick_train(labels, per_class, seed=0):
    rs = np.random.RandomState(seed)
    idx = []
    for c in np.unique(labels):
        members = np.where(labels == c)[0]
        idx.extend(rs.choice(members, per_class, replace=False))
    return np.array(sorted(idx))


def acc(pred, labels, train_ind):
    mask = np.ones(len(labels), bool)
    mask[train_ind] = False
    return 100.0 * float(np.mean(pred[mask] == labels[mask]))


def run_config(name, ref_fit, tpu_fit, labels, train_ind, rows):
    """``ref_fit``/``tpu_fit`` are zero-arg callables returning predictions.
    Each is called twice on the SAME model instance (construct the model in
    the enclosing scope): the warm second call amortizes one-time
    graph-dependent setup (RCM/band build, jit compile) exactly the way
    repeated fits in ``ssl_trials`` do."""
    ref_pred, t_ref = (None, float("nan"))
    if ref_fit is not None:
        ref_pred, t_ref = _timer(ref_fit)
        ref_pred, t_ref2 = _timer(ref_fit)
        t_ref = min(t_ref, t_ref2)
    tpu_pred, t_tpu = _timer(tpu_fit)     # includes compile
    tpu_pred, t_tpu2 = _timer(tpu_fit)    # warm
    a_ref = acc(np.asarray(ref_pred), labels, train_ind) if ref_pred is not None else float("nan")
    a_tpu = acc(np.asarray(tpu_pred), labels, train_ind)
    speed = t_ref / t_tpu2 if ref_pred is not None else float("nan")
    row = (f"| {name} | {t_ref:.2f} | {t_tpu:.2f} | {t_tpu2:.2f} | "
           f"{speed:.1f}x | {a_ref:.2f} | {a_tpu:.2f} |")
    print(row, flush=True)
    rows.append(row)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", default="full", choices=["small", "full"])
    p.add_argument("--configs", default="1,2,3,4,5")
    p.add_argument("--write", action="store_true")
    args = p.parse_args()
    cfgs = {int(c) for c in args.configs.split(",")}
    full = args.scale == "full"

    rgl = load_reference()
    import graphlearning_tpu as gl

    rows = []
    hdr = ("| Config | ref CPU s | TPU s (cold) | TPU s (warm) | speedup | "
           "ref acc % | TPU acc % |")
    print(hdr, flush=True)
    print("|---|---|---|---|---|---|---|", flush=True)
    rows.append(hdr)
    rows.append("|---|---|---|---|---|---|---|")

    if 1 in cfgs:
        import sklearn.datasets as skd
        n = 2000 if full else 500
        X, labels = skd.make_moons(n_samples=n, noise=0.1, random_state=0)
        W = knn_graph(X, 10)
        train_ind = pick_train(labels, 5)
        y = labels[train_ind]
        m_ref, m_tpu = rgl.ssl.laplace(W), gl.ssl.laplace(W)
        run_config(
            f"1 laplace two-moons n={n}",
            lambda: m_ref.fit_predict(train_ind, y),
            lambda: m_tpu.fit_predict(train_ind, y),
            labels, train_ind, rows)

    if cfgs & {2, 3, 4}:
        n = 70000 if full else 5000
        X, labels = make_blobs(n, 30, 10, seed=1)  # spread=1.0: connected, ~98% 1-NN ceiling
        W = knn_graph(X, 10)
        train_ind = pick_train(labels, 1, seed=1)
        y = labels[train_ind]

    if 2 in cfgs:
        m_ref = rgl.ssl.poisson(W, solver="conjugate_gradient")
        m_tpu = gl.ssl.poisson(W, solver="conjugate_gradient")
        run_config(
            f"2 poisson n={n} 1/class",
            lambda: m_ref.fit_predict(train_ind, y),
            lambda: m_tpu.fit_predict(train_ind, y),
            labels, train_ind, rows)

    if 3 in cfgs:
        def ref_spec():
            return rgl.clustering.spectral(W, num_clusters=10, method="NgJordanWeiss").fit_predict()
        def tpu_spec():
            return gl.clustering.spectral(W, num_clusters=10, method="NgJordanWeiss").fit_predict()
        c_ref, t_ref = _timer(ref_spec)
        c_tpu, t_tpu = _timer(tpu_spec)
        _, t_tpu2 = _timer(tpu_spec)
        a_ref = rgl.clustering.clustering_accuracy(np.asarray(c_ref), labels)
        a_tpu = gl.clustering.clustering_accuracy(np.asarray(c_tpu), labels)
        row = (f"| 3 spectral n={n} k=10cl | {t_ref:.2f} | {t_tpu:.2f} | {t_tpu2:.2f} | "
               f"{t_ref/t_tpu2:.1f}x | {a_ref:.2f} | {a_tpu:.2f} |")
        print(row, flush=True)
        rows.append(row)

    if 4 in cfgs:
        priors = np.bincount(labels, minlength=10) / len(labels)
        m_ref = rgl.ssl.poisson_mbo(W, class_priors=priors)
        m_tpu = gl.ssl.poisson_mbo(W, class_priors=priors)
        run_config(
            f"4a poisson_mbo n={n}",
            lambda: m_ref.fit_predict(train_ind, y),
            lambda: m_tpu.fit_predict(train_ind, y),
            labels, train_ind, rows)
        if "graphlearning.cextensions" in sys.modules:
            # class PRIORS (fractions) — the reference derives counts as
            # n*priors with no normalization (ssl.py:870); raw counts there
            # explode the C auction's volume bounds
            m_ref = rgl.ssl.volume_mbo(W, priors)
            m_tpu = gl.ssl.volume_mbo(W, priors)
            run_config(
                f"4b volume_mbo n={n}",
                lambda: m_ref.fit_predict(train_ind, y),
                lambda: m_tpu.fit_predict(train_ind, y),
                labels, train_ind, rows)

    if 5 in cfgs:
        n5 = 50000 if full else 5000
        X5, labels5 = make_blobs(n5, 30, 10, seed=2, spread=1.0)
        W5 = knn_graph(X5, 10)
        train5 = pick_train(labels5, 1, seed=2)
        y5 = labels5[train5]
        if "graphlearning.cextensions" in sys.modules:
            m_ref = rgl.ssl.plaplace(W5, p=10)
            m_tpu = gl.ssl.plaplace(W5, p=10)
            run_config(
                f"5a plaplace p=10 n={n5}",
                lambda: m_ref.fit_predict(train5, y5),
                lambda: m_tpu.fit_predict(train5, y5),
                labels5, train5, rows)
        m_ref = rgl.ssl.laplace(W5, reweighting="wnll")
        m_tpu = gl.ssl.laplace(W5, reweighting="wnll")
        run_config(
            f"5b laplace+WNLL n={n5}",
            lambda: m_ref.fit_predict(train5, y5),
            lambda: m_tpu.fit_predict(train5, y5),
            labels5, train5, rows)

    if args.write:
        with open("BASELINE_MEASURED.md", "a") as f:
            f.write(f"\n## Measured {time.strftime('%Y-%m-%d %H:%M')} "
                    f"(scale={args.scale})\n\n")
            f.write("\n".join(rows) + "\n")


if __name__ == "__main__":
    main()
