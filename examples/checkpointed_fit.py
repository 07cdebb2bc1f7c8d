"""Checkpointed long fits: `fit(..., checkpoint_path=)` saves the MBO
outer-loop state every few rounds; a killed run re-invoked with the same
path RESUMES and produces the identical prediction (the PRNG key and
projection weights live in the checkpointed state).  The reference can
only pickle whole graphs (graph.py:1335-1368); solver state is lost on a
kill there.
"""
import numpy as np
import sklearn.datasets as datasets

import graphlearning_tpu as gl

X, labels = datasets.make_moons(n_samples=1500, noise=0.12, random_state=1)
W = gl.weightmatrix.knn(X, 10)
train_ind = gl.trainsets.generate(labels, rate=10, seed=0)
priors = gl.utils.class_priors(labels)

model = gl.ssl.poisson_mbo(W, class_priors=priors, T=20)
pred = model.fit_predict(train_ind, labels[train_ind],
                         checkpoint_path="/tmp/pmbo_ckpt",
                         checkpoint_every=5)
print("poisson_mbo (checkpointed) accuracy:",
      gl.ssl.ssl_accuracy(pred, labels, train_ind))

# re-running with the same path resumes from the last saved round —
# here the fit is already complete, so it just replays the final state
pred2 = gl.ssl.poisson_mbo(W, class_priors=priors, T=20).fit_predict(
    train_ind, labels[train_ind], checkpoint_path="/tmp/pmbo_ckpt",
    checkpoint_every=5)
print("resumed prediction identical:", bool(np.array_equal(pred, pred2)))

# trial sweeps resume at the trial level: ssl_trials(resume=True)
# continues a killed sweep from its results CSV (see ssl.ssl_trials).
