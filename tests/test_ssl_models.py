"""End-to-end SSL model tests: two-moons accuracy + parity of the device
solvers against independent scipy re-implementations of the reference math
(SURVEY.md §4 test strategy)."""

import numpy as np
import scipy.sparse as sp
import pytest

import graphlearning_tpu as gl


@pytest.fixture(scope="module")
def moons():
    import sklearn.datasets as datasets

    X, labels = datasets.make_moons(n_samples=500, noise=0.1, random_state=0)
    W = gl.weightmatrix.knn(X, 10)
    rs = np.random.RandomState(1)
    train_ind = np.concatenate(
        [rs.choice(np.where(labels == c)[0], 5, replace=False) for c in (0, 1)]
    )
    return W, X, labels, train_ind


def test_laplace_twomoons_accuracy(moons):
    W, X, labels, train_ind = moons
    model = gl.ssl.laplace(W)
    pred = model.fit_predict(train_ind, labels[train_ind])
    acc = gl.ssl.ssl_accuracy(pred, labels, train_ind)
    assert acc > 90.0, acc


def test_laplace_parity_scipy(moons):
    """Device masked-CG Laplace solve == scipy submatrix solve."""
    W, X, labels, train_ind = moons
    n = W.shape[0]
    model = gl.ssl.laplace(W, tol=1e-12)
    u = model.fit(train_ind, labels[train_ind])

    d = np.asarray(W.sum(1)).ravel()
    L = sp.spdiags(d, 0, n, n) - W
    idx = np.full(n, True)
    idx[train_ind] = False
    F = np.zeros((n, 2))
    F[np.arange(len(train_ind)) * 0 + train_ind, labels[train_ind]] = 1
    from scipy.sparse.linalg import spsolve

    A = L[idx, :][:, idx]
    b = -L[idx, :][:, train_ind] @ F[train_ind]
    uref = F.copy()
    uref[idx] = spsolve(A.tocsc(), b)
    np.testing.assert_allclose(u, uref, rtol=1e-5, atol=1e-7)


def test_poisson_twomoons_accuracy(moons):
    W, X, labels, train_ind = moons
    pred = gl.ssl.poisson(W).fit_predict(train_ind, labels[train_ind])
    acc = gl.ssl.ssl_accuracy(pred, labels, train_ind)
    assert acc > 90.0, acc


def test_poisson_cg_parity(moons):
    """Poisson CG solution satisfies L u = source (projected)."""
    W, X, labels, train_ind = moons
    n = W.shape[0]
    model = gl.ssl.poisson(W, tol=1e-10)
    u = model.fit(train_ind, labels[train_ind])
    d = np.asarray(W.sum(1)).ravel()
    L = sp.spdiags(d, 0, n, n) - W
    onehot = np.zeros((len(train_ind), 2))
    onehot[np.arange(len(train_ind)), labels[train_ind]] = 1
    source = np.zeros((n, 2))
    source[train_ind] = onehot - onehot.mean(axis=0)
    resid = L @ u - source
    # residual should be (numerically) in the nullspace-orthogonal sense small
    assert np.abs(resid).max() < 1e-4, np.abs(resid).max()


def test_poisson_gradient_descent(moons):
    W, X, labels, train_ind = moons
    pred = gl.ssl.poisson(W, solver="gradient_descent").fit_predict(
        train_ind, labels[train_ind]
    )
    acc = gl.ssl.ssl_accuracy(pred, labels, train_ind)
    assert acc > 85.0, acc


def test_randomwalk_model(moons):
    W, X, labels, train_ind = moons
    pred = gl.ssl.randomwalk(W).fit_predict(train_ind, labels[train_ind])
    acc = gl.ssl.ssl_accuracy(pred, labels, train_ind)
    assert acc > 85.0, acc


def test_laplace_normalizations(moons):
    W, X, labels, train_ind = moons
    for norm in ("randomwalk", "normalized"):
        pred = gl.ssl.laplace(W, normalization=norm).fit_predict(
            train_ind, labels[train_ind]
        )
        acc = gl.ssl.ssl_accuracy(pred, labels, train_ind)
        assert acc > 85.0, (norm, acc)


def test_laplace_reweighting_poisson(moons):
    W, X, labels, train_ind = moons
    pred = gl.ssl.laplace(W, reweighting="poisson").fit_predict(
        train_ind, labels[train_ind]
    )
    acc = gl.ssl.ssl_accuracy(pred, labels, train_ind)
    assert acc > 85.0, acc


def test_laplace_wnll(moons):
    W, X, labels, train_ind = moons
    pred = gl.ssl.laplace(W, reweighting="wnll").fit_predict(
        train_ind, labels[train_ind]
    )
    acc = gl.ssl.ssl_accuracy(pred, labels, train_ind)
    assert acc > 85.0, acc


def test_class_priors_projection(moons):
    W, X, labels, train_ind = moons
    priors = gl.utils.class_priors(labels)
    model = gl.ssl.laplace(W, class_priors=priors)
    pred = model.fit_predict(train_ind, labels[train_ind])
    acc = gl.ssl.ssl_accuracy(pred, labels, train_ind)
    assert acc > 90.0
    # predicted class sizes should approximately match priors
    sizes = np.bincount(pred, minlength=2) / len(pred)
    assert np.abs(sizes - priors).max() < 0.05


def test_ssl_trials_runner(moons, tmp_path):
    W, X, labels, train_ind = moons
    gl.ssl.results_dir = str(tmp_path)
    model = gl.ssl.laplace(W)
    trainsets = [train_ind, np.roll(train_ind, 1)]
    res = model.ssl_trials(trainsets, labels, overwrite=True)
    assert res.shape == (2, 2)
    assert res[:, 1].min() > 80.0


def test_ssl_trials_class_priors_csv(moons, tmp_path):
    """Priors models record the reference's 4-column CSV (num_train,
    acc without priors, acc with priors, priors error — reference
    ssl.py:366-395) and trials_statistics returns the (m, 3) block."""
    W, X, labels, train_ind = moons
    import graphlearning_tpu.ssl as sslm
    old = sslm.results_dir
    sslm.results_dir = str(tmp_path)
    try:
        priors = gl.utils.class_priors(labels)
        model = gl.ssl.laplace(W, class_priors=priors)
        trainsets = [train_ind, np.roll(train_ind, 1)]
        res = model.ssl_trials(trainsets, labels, overwrite=True)
        assert res.shape == (2, 4)
        import os
        outfile = os.path.join(str(tmp_path), model.get_accuracy_filename())
        with open(outfile) as fh:
            header = fh.readline().strip()
            rows = [ln.strip().split(",") for ln in fh if ln.strip()]
        assert header == ("Number of labels,Accuracy,"
                          "Accuracy with class priors,Class priors error")
        assert all(len(r) == 4 for r in rows) and len(rows) == 2

        num_train, acc_mean, acc_std, num_trials = model.trials_statistics()
        assert acc_mean.shape == (1, 3) and acc_std.shape == (1, 3)
        assert num_trials == 2
        assert acc_mean[0, 1] > 80.0         # accuracy with priors

        # accuracy_table must emit a '+CP' row for the priors model
        tex = str(tmp_path / "t.tex")
        gl.ssl.accuracy_table([model], savefile=tex, title="m")
        text = open(tex).read()
        assert "+CP" in text
        # plain runs still give the (m, 1) block
        plain = gl.ssl.laplace(W)
        plain.ssl_trials(trainsets, labels, overwrite=True)
        _, am, _, nt = plain.trials_statistics()
        assert am.shape == (1, 1) and nt == 2
        gl.ssl.accuracy_table([plain, model], savefile=tex, title="m")
    finally:
        sslm.results_dir = old


def test_batched_trials_match_sequential(moons):
    """fit_predict_batched (vmap trial batching, the joblib replacement)
    must reproduce the per-trial sequential solves."""
    W, X, labels, _ = moons
    for model_cls in (gl.ssl.laplace, gl.ssl.poisson):
        model = model_cls(W)
        trainsets = [gl.trainsets.generate(labels, rate=3, seed=s)
                     for s in range(4)]
        batched = model.fit_predict_batched(trainsets, labels)
        for t, pred in zip(trainsets, batched):
            seq = model.fit_predict(np.asarray(t), labels[np.asarray(t)])
            agree = np.mean(pred == seq)
            assert agree > 0.99, agree


def test_ssl_trials_mixed_sizes(moons, tmp_path):
    """ssl_trials groups same-size trials for batching but must still emit
    one CSV row per trial in order."""
    W, X, labels, _ = moons
    import graphlearning_tpu.ssl as sslm
    old = sslm.results_dir
    sslm.results_dir = str(tmp_path)
    try:
        ts = [gl.trainsets.generate(labels, rate=r, seed=s)
              for s in range(3) for r in (2, 5)]
        model = gl.ssl.laplace(W)
        res = model.ssl_trials(ts, labels, overwrite=True)
        assert res.shape == (6, 2)
        assert np.array_equal(res[:, 0], [len(t) for t in ts])
        assert np.all(res[:, 1] > 60)
    finally:
        sslm.results_dir = old


def test_warmup_api(moons):
    """warmup() precompiles via a throwaway fit and leaves the model
    unfitted; the next real fit is unaffected."""
    W, X, labels, train_ind = moons
    m = gl.ssl.poisson(W).warmup(num_classes=2)
    assert m.fitted is False and m.prob is None
    pred = m.fit_predict(train_ind, labels[train_ind])
    assert gl.ssl.ssl_accuracy(pred, labels, train_ind) > 90.0


def test_poisson_cg_kernel_gauge(W_medium):
    """The Poisson CG solution must carry no component along the
    normalized Laplacian's kernel D^{1/2} 1 — equivalently the
    degree-weighted column sums of u vanish.  float32 CG drifts a
    different kernel multiple into each class column (measured on the
    real chip: 35% of predictions flipped vs the f64 scipy solution
    before the gauge projection, ssl._project_out_nlap_kernel)."""
    import scipy.sparse as sp

    rs = np.random.RandomState(5)
    n = W_medium.shape[0]
    labels = rs.randint(0, 3, n)
    train_ind = rs.choice(n, 30, replace=False)
    m = gl.ssl.poisson(W_medium, tol=1e-8)
    u = m.fit(train_ind, labels[train_ind])
    W0 = W_medium.copy()
    W0.setdiag(0)
    W0.eliminate_zeros()
    deg = np.asarray(W0.sum(1)).ravel()
    gauge = np.abs(deg @ np.asarray(u)) / (np.abs(u).max() * deg.sum())
    assert gauge.max() < 1e-6, gauge
