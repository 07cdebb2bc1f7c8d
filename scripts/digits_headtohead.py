"""Head-to-head of ALL model families on a REAL offline dataset:
sklearn.datasets.load_digits (1,797 handwritten 8x8 digit images, 64-d
raw pixel features, 10 classes) — the one genuine image dataset
importable with zero egress.

Both sides get the IDENTICAL k=10 kNN gaussian graph and the identical
5-labels/class training split, so prediction agreement is a direct
implementation-correctness check (not a dataset benchmark):

- deterministic families: pass = agreement >= 0.99 on the full point set
- stochastic families (random init / random sampling — classified by
  reading the reference source: multiclass_mbo ssl.py:978 np.random.rand,
  volume_mbo ssl.py:897 np.random.randint + srand-driven C auction,
  incres clustering.py:337,355, fokker_planck clustering.py:278 sklearn
  KMeans(random_state=None)): pass = TPU mean accuracy over 5
  shared-seed repeats within 2 points of (or above) the reference mean.

Notes
-----
- modularity_mbo: the reference has an upstream bug — ssl.py:1062 reads
  an undefined global ``k`` (should be ``num_classes``).  The harness
  shims it by setting the module global to the class count, which is the
  only value that makes the adjacent code (``u = np.zeros((n,
  num_classes))``) consistent.
- amle runs at tol=1e-6 on BOTH sides: at the default tol=1e-3 the two
  fixed-point iterations stop inside different tolerance balls and
  disagree on ~1% boundary nodes (measured agree 0.98998 at 1e-3,
  1.0000 at 1e-6).

Reference harness matched: /root/reference/graphlearning/ssl.py:292-396
(fit_predict), ssl.py:912-1005 (multiclass_mbo), ssl.py:1429-1508
(sparse_label_propagation), clustering.py:282-371 (incres).

Usage: python scripts/digits_headtohead.py [--write] [--families a,b,...]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo/scripts")
sys.path.insert(0, "/root/repo")

from measure_baseline import load_reference, knn_graph, pick_train, _timer

N_SEEDS = 5   # repeats for stochastic families


def acc(pred, labels, train_ind):
    mask = np.ones(len(labels), bool)
    mask[train_ind] = False
    return 100.0 * float(np.mean(np.asarray(pred)[mask] == labels[mask]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--write", action="store_true")
    p.add_argument("--families", default="all")
    args = p.parse_args()

    rgl = load_reference()
    import graphlearning_tpu as gl
    import sklearn.datasets as skd

    ds = skd.load_digits()
    X, labels = ds.data.astype(np.float64), ds.target
    n = len(labels)
    W = knn_graph(X, 10)
    train_ind = pick_train(labels, 5, seed=0)
    y = labels[train_ind]
    priors = np.bincount(labels, minlength=10) / n
    have_c = "graphlearning.cextensions" in sys.modules
    # upstream-bug shim: reference ssl.py:1062 (modularity_mbo._fit) reads
    # the undefined module global ``k`` where num_classes is meant
    rgl.ssl.k = 10

    # (name, kind, ref ctor, tpu ctor); kind: det | stoch | cluster
    fams = [
        ("laplace", "det",
         lambda: rgl.ssl.laplace(W), lambda: gl.ssl.laplace(W)),
        ("laplace_wnll", "det",
         lambda: rgl.ssl.laplace(W, reweighting="wnll"),
         lambda: gl.ssl.laplace(W, reweighting="wnll")),
        ("randomwalk", "det",
         lambda: rgl.ssl.randomwalk(W), lambda: gl.ssl.randomwalk(W)),
        ("poisson_cg", "det",
         lambda: rgl.ssl.poisson(W), lambda: gl.ssl.poisson(W)),
        ("poisson_gd", "det",
         lambda: rgl.ssl.poisson(W, solver="gradient_descent"),
         lambda: gl.ssl.poisson(W, solver="gradient_descent")),
        ("poisson_spectral", "det",
         lambda: rgl.ssl.poisson(W, solver="spectral"),
         lambda: gl.ssl.poisson(W, solver="spectral")),
        ("poisson_mbo", "det",
         lambda: rgl.ssl.poisson_mbo(W, class_priors=priors),
         lambda: gl.ssl.poisson_mbo(W, class_priors=priors)),
        ("volume_mbo", "stoch",
         lambda: rgl.ssl.volume_mbo(W, priors),
         lambda: gl.ssl.volume_mbo(W, priors)) if have_c else None,
        ("multiclass_mbo", "stoch",
         lambda: rgl.ssl.multiclass_mbo(W),
         lambda: gl.ssl.multiclass_mbo(W)),
        ("modularity_mbo", "det",
         lambda: rgl.ssl.modularity_mbo(W),
         lambda: gl.ssl.modularity_mbo(W)),
        ("dynamic_label_propagation", "det",
         lambda: rgl.ssl.dynamic_label_propagation(W),
         lambda: gl.ssl.dynamic_label_propagation(W)),
        ("centered_kernel", "det",
         lambda: rgl.ssl.centered_kernel(W),
         lambda: gl.ssl.centered_kernel(W)),
        ("sparse_label_propagation", "det",
         lambda: rgl.ssl.sparse_label_propagation(W),
         lambda: gl.ssl.sparse_label_propagation(W)),
        ("graph_nearest_neighbor", "det",
         lambda: rgl.ssl.graph_nearest_neighbor(W),
         lambda: gl.ssl.graph_nearest_neighbor(W)) if have_c else None,
        ("amle_tol1e-6", "det",
         lambda: rgl.ssl.amle(W, tol=1e-6),
         lambda: gl.ssl.amle(W, tol=1e-6)) if have_c else None,
        ("peikonal", "det",
         lambda: rgl.ssl.peikonal(W),
         lambda: gl.ssl.peikonal(W)) if have_c else None,
        ("plaplace_p10", "det",
         lambda: rgl.ssl.plaplace(W, p=10),
         lambda: gl.ssl.plaplace(W, p=10)) if have_c else None,
        # stoch: the reference's k-means is sklearn
        # KMeans(random_state=None) (clustering.py:196) — label basins
        # vary run to run even though the embedding is deterministic
        ("spectral_clustering", "stoch-cluster",
         lambda: rgl.clustering.spectral(W, num_clusters=10,
                                         method="NgJordanWeiss"),
         lambda: gl.clustering.spectral(W, num_clusters=10,
                                        method="NgJordanWeiss",
                                        seed=None)),
        ("fokker_planck_clustering", "stoch-cluster",
         lambda: rgl.clustering.fokker_planck(W, num_clusters=10),
         lambda: gl.clustering.fokker_planck(W, num_clusters=10)),
        ("incres_clustering", "stoch-cluster",
         lambda: rgl.clustering.incres(W, num_clusters=10),
         lambda: gl.clustering.incres(W, num_clusters=10)),
    ]
    fams = [f for f in fams if f is not None]
    if args.families != "all":
        keep = set(args.families.split(","))
        fams = [f for f in fams if f[0] in keep]

    rows = []
    hdr = ("| Family | kind | agree | ref acc % | TPU acc % | ref warm s | "
           "TPU warm s | pass |")
    print(hdr, flush=True)
    print("|---|---|---|---|---|---|---|---|", flush=True)
    rows += [hdr, "|---|---|---|---|---|---|---|---|"]
    n_pass = n_total = 0

    def one_fit(model, is_cluster):
        if is_cluster:
            return model.fit_predict()
        return model.fit_predict(train_ind, y)

    def acc_of(pred, is_cluster):
        if is_cluster:
            return rgl.clustering.clustering_accuracy(np.asarray(pred),
                                                      labels)
        return acc(pred, labels, train_ind)

    for name, kind, mk_ref, mk_tpu in fams:
        try:
            is_cluster = "cluster" in kind
            if kind.startswith("stoch"):
                # stochastic: 5 repeats per side, fresh global RNG per
                # repeat on both sides; compare mean accuracy
                a_r, a_t, t_r, t_t = [], [], [], []
                for s in range(N_SEEDS):
                    np.random.seed(s)
                    pr, tr = _timer(lambda: one_fit(mk_ref(), is_cluster))
                    np.random.seed(s)
                    pt, tt = _timer(lambda: one_fit(mk_tpu(), is_cluster))
                    a_r.append(acc_of(pr, is_cluster))
                    a_t.append(acc_of(pt, is_cluster))
                    t_r.append(tr)
                    t_t.append(tt)
                m_r, m_t = float(np.mean(a_r)), float(np.mean(a_t))
                ok = m_t >= m_r - 2.0
                n_pass += ok
                n_total += 1
                row = (f"| {name} | {kind} x{N_SEEDS} | n/a | "
                       f"{m_r:.2f}±{np.std(a_r):.1f} | "
                       f"{m_t:.2f}±{np.std(a_t):.1f} | "
                       f"{min(t_r):.3f} | {min(t_t):.3f} | "
                       f"{'PASS' if ok else 'FAIL'} |")
            else:
                m_ref, m_tpu = mk_ref(), mk_tpu()
                pred_ref, t_ref = _timer(lambda: one_fit(m_ref, is_cluster))
                pred_ref, t_ref2 = _timer(lambda: one_fit(m_ref, is_cluster))
                t_ref = min(t_ref, t_ref2)
                pred_tpu, _ = _timer(lambda: one_fit(m_tpu, is_cluster))
                pred_tpu, t_tpu = _timer(lambda: one_fit(m_tpu, is_cluster))
                pred_ref = np.asarray(pred_ref)
                pred_tpu = np.asarray(pred_tpu)
                a_ref = acc_of(pred_ref, is_cluster)
                a_tpu = acc_of(pred_tpu, is_cluster)
                if is_cluster:
                    # clusterings are defined up to label permutation:
                    # Hungarian-align before agreement
                    from scipy.optimize import linear_sum_assignment
                    C = np.zeros((10, 10))
                    for i in range(10):
                        for j in range(10):
                            C[i, j] = np.sum((pred_tpu == i)
                                             & (pred_ref == j))
                    ri, ci = linear_sum_assignment(-C)
                    remap = dict(zip(ri, ci))
                    pred_tpu_al = np.array([remap[v] for v in pred_tpu])
                    agree = float(np.mean(pred_tpu_al == pred_ref))
                else:
                    agree = float(np.mean(pred_ref == pred_tpu))
                ok = agree >= 0.99
                n_pass += ok
                n_total += 1
                row = (f"| {name} | {kind} | {agree:.4f} | {a_ref:.2f} | "
                       f"{a_tpu:.2f} | {t_ref:.3f} | {t_tpu:.3f} | "
                       f"{'PASS' if ok else 'FAIL'} |")
        except Exception as e:
            n_total += 1
            row = (f"| {name} | {kind} | ERROR {type(e).__name__}: "
                   f"{str(e)[:90]} |")
        print(row, flush=True)
        rows.append(row)

    summary = (f"\n{n_pass}/{n_total} families pass "
               f"(digits n={n}, k=10 kNN, 5 labels/class)")
    print(summary, flush=True)
    rows.append(summary)

    if args.write:
        with open("DIGITS_HEADTOHEAD.md", "w") as f:
            f.write("# Real-data head-to-head: sklearn digits\n\n"
                    "All model families, reference (compiled C + scipy, "
                    "host CPU) vs graphlearning_tpu (TPU backend), "
                    f"identical k=10 kNN graph on the raw 64-d digit "
                    f"images (n={n}), identical 5-labels/class split.\n\n"
                    "Pass criteria: deterministic families prediction-"
                    "agreement >= 0.99; stochastic families (random "
                    "init, classified from the reference source — see "
                    "scripts/digits_headtohead.py docstring) mean "
                    f"accuracy over {N_SEEDS} shared-seed repeats within "
                    "2 points of (or above) the reference mean.\n\n")
            f.write("\n".join(rows) + "\n")
            f.write(f"\nMeasured {time.strftime('%Y-%m-%d %H:%M')}\n")


if __name__ == "__main__":
    main()
