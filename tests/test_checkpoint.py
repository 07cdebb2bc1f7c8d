"""Checkpoint/resume reaching the models (VERDICT r3 item 4): a killed
``fit(..., checkpoint_path=)`` resumed from the same path produces the
identical prediction to the uninterrupted fit, and ``ssl_trials`` resumes
a killed sweep at the trial level.  (SURVEY.md §5 checkpoint row; the
reference's only persistence is whole-graph pickling,
graph.py:1335-1368.)"""

import numpy as np
import pytest

import graphlearning_tpu as gl
from graphlearning_tpu import checkpoint as ckpt


@pytest.fixture(scope="module")
def clusters():
    rs = np.random.RandomState(3)
    n, ncls = 500, 3
    centers = rs.randn(ncls, 5) * 1.8
    labels = rs.randint(0, ncls, n)
    X = centers[labels] + rs.randn(n, 5)
    W = gl.weightmatrix.knn(X, 10)
    train_ind = np.concatenate(
        [rs.choice(np.where(labels == c)[0], 5, replace=False)
         for c in range(ncls)])
    return W, labels, train_ind


class _KillAfter:
    """Monkeypatch hook: let `n` checkpoint saves through, then raise —
    simulates the process dying mid-fit (after some state hit disk)."""

    def __init__(self, n, real):
        self.left = n
        self.real = real

    def __call__(self, path, state, step=0):
        self.real(path, state, step)
        self.left -= 1
        if self.left <= 0:
            raise RuntimeError("simulated kill")


def test_poisson_mbo_checkpoint_resume(clusters, tmp_path, monkeypatch):
    W, labels, train_ind = clusters
    path = str(tmp_path / "pmbo_ckpt")
    priors = gl.utils.class_priors(labels)

    m0 = gl.ssl.poisson_mbo(W, class_priors=priors, T=8)
    pred0 = m0.fit_predict(train_ind, labels[train_ind])

    # killed run: dies after the 2nd checkpoint save (mid-fit)
    m1 = gl.ssl.poisson_mbo(W, class_priors=priors, T=8)
    killer = _KillAfter(2, ckpt.save)
    monkeypatch.setattr(ckpt, "save", killer)
    with pytest.raises(RuntimeError, match="simulated kill"):
        m1.fit(train_ind, labels[train_ind], checkpoint_path=path,
               checkpoint_every=2)
    monkeypatch.setattr(ckpt, "save", killer.real)
    saved = ckpt.load(path)
    assert saved is not None and 0 < saved[1] < 8

    # resumed run continues from the checkpoint and matches the
    # uninterrupted prediction
    m2 = gl.ssl.poisson_mbo(W, class_priors=priors, T=8)
    pred2 = m2.fit_predict(train_ind, labels[train_ind],
                           checkpoint_path=path, checkpoint_every=2)
    assert np.array_equal(pred2, pred0)
    assert gl.ssl.ssl_accuracy(pred2, labels, train_ind) > 85.0


def test_volume_mbo_checkpoint_resume(clusters, tmp_path, monkeypatch):
    W, labels, train_ind = clusters
    path = str(tmp_path / "vmbo_ckpt")
    priors = gl.utils.class_priors(labels)

    m0 = gl.ssl.volume_mbo(W, class_priors=priors, temperature=0.1,
                           max_iters=60, seed=0)
    pred0 = m0.fit_predict(train_ind, labels[train_ind],
                           checkpoint_path=str(tmp_path / "vmbo_ref"),
                           checkpoint_every=5)

    m1 = gl.ssl.volume_mbo(W, class_priors=priors, temperature=0.1,
                           max_iters=60, seed=0)
    killer = _KillAfter(1, ckpt.save)
    monkeypatch.setattr(ckpt, "save", killer)
    with pytest.raises(RuntimeError, match="simulated kill"):
        m1.fit(train_ind, labels[train_ind], checkpoint_path=path,
               checkpoint_every=5)
    monkeypatch.setattr(ckpt, "save", killer.real)

    # resume replays the identical annealing-noise sequence (the PRNG key
    # is part of the checkpointed state) -> identical labels
    m2 = gl.ssl.volume_mbo(W, class_priors=priors, temperature=0.1,
                           max_iters=60, seed=0)
    pred2 = m2.fit_predict(train_ind, labels[train_ind],
                           checkpoint_path=path, checkpoint_every=5)
    assert np.array_equal(pred2, pred0)


def test_volume_mbo_checkpointed_matches_fused(clusters, tmp_path):
    """The segmented checkpointed loop computes the same fixed point as
    the fused single-program loop."""
    W, labels, train_ind = clusters
    priors = gl.utils.class_priors(labels)
    m_fused = gl.ssl.volume_mbo(W, class_priors=priors, temperature=0.0,
                                max_iters=60)
    pred_fused = m_fused.fit_predict(train_ind, labels[train_ind])
    m_ck = gl.ssl.volume_mbo(W, class_priors=priors, temperature=0.0,
                             max_iters=60)
    pred_ck = m_ck.fit_predict(train_ind, labels[train_ind],
                               checkpoint_path=str(tmp_path / "v0"),
                               checkpoint_every=7)
    agree = np.mean(pred_fused == pred_ck)
    assert agree > 0.99, agree


def test_ssl_trials_resume(clusters, tmp_path):
    import graphlearning_tpu.ssl as sslm

    W, labels, train_ind = clusters
    rs = np.random.RandomState(0)
    trainsets = [rs.permutation(train_ind) for _ in range(4)]
    old = sslm.results_dir
    sslm.results_dir = str(tmp_path)
    try:
        model = gl.ssl.laplace(W)
        full = model.ssl_trials(trainsets, labels, tag="full_",
                                overwrite=True)
        assert full.shape == (4, 2)

        # killed sweep: only 2 trials completed, then resume the rest
        model.ssl_trials(trainsets, labels, tag="part_", overwrite=True,
                         num_trials=2)
        rest = model.ssl_trials(trainsets, labels, tag="part_",
                                resume=True)
        assert rest.shape == (2, 2)
        # aggregated stats over the resumed file match the fresh full run
        nt_f, mean_f, _, trials_f = model.trials_statistics(tag="full_")
        nt_p, mean_p, _, trials_p = model.trials_statistics(tag="part_")
        assert trials_f == trials_p == 4
        np.testing.assert_allclose(mean_f, mean_p)

        # resume on a complete file is a no-op
        again = model.ssl_trials(trainsets, labels, tag="part_",
                                 resume=True)
        assert again.shape[0] == 0
    finally:
        sslm.results_dir = old
