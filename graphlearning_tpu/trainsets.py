"""Reproducible train-set generation (reference ``graphlearning/trainsets.py``).

Format-compatible with the reference's ``LabelPermutations/*.npz`` fixtures
(object-array of permutation lists), so the ICML'20 bit-reproducible splits
can be loaded directly (reference ``trainsets.py:17-45,135-155``).
"""

from __future__ import annotations

import os

import numpy as np

from graphlearning_tpu import utils

trainset_dir = os.path.abspath(os.path.join(os.getcwd(), "label_permutations"))


def generate(labels, rate=1, num_trials=1, mask=None, seed=None, dataset=None, trainset_name='', name=None, overwrite=False):
    """Generate train sets by per-class sampling (reference
    ``trainsets.py:47-156``).  ``rate``: int = count per class, float in
    (0,1) = fraction per class, or array of per-class counts/fractions."""
    labels = np.asarray(labels)
    rs = np.random.RandomState(seed)
    classes = np.unique(labels)
    classes = classes[classes >= 0]
    perm_list = []
    for _ in range(num_trials):
        train_ind = []
        for i, c in enumerate(classes):
            ind = np.where(labels == c)[0]
            if mask is not None:
                ind = ind[np.asarray(mask)[ind]]
            if np.isscalar(rate):
                r = rate
            else:
                r = np.asarray(rate)[i]
            if isinstance(r, (float, np.floating)) and 0 < r < 1:
                m = int(np.ceil(r * len(ind)))
            else:
                m = int(r)
            train_ind.append(rs.choice(ind, size=min(m, len(ind)), replace=False))
        perm_list.append(np.concatenate(train_ind))

    if dataset is not None or name is not None:
        os.makedirs(trainset_dir, exist_ok=True)
        fname = ((dataset or name).lower() + trainset_name.lower()
                 + "_permutations.npz")
        path = os.path.join(trainset_dir, fname)
        if not os.path.exists(path) or overwrite:
            np.savez_compressed(
                path, perm=np.array(perm_list, dtype=object)
            )
    return perm_list if num_trials > 1 else perm_list[0]


def load(dataset, trainset_name='', overwrite=False):
    """Load label permutations, checking the local dir, then the reference's
    bundled fixtures at ``/root/reference/LabelPermutations`` (offline),
    then the GitHub URL (reference ``trainsets.py:17-45``)."""
    # try the exact-case name first (the reference's bundled fixtures are
    # CamelCase, e.g. MNIST_permutations.npz) then the reference code's
    # lowercased convention (trainsets.py:31)
    fnames = [dataset + trainset_name + "_permutations.npz",
              dataset.lower() + trainset_name.lower() + "_permutations.npz"]
    for fname in fnames:
        for d in (trainset_dir, "/root/reference/LabelPermutations"):
            path = os.path.join(d, fname)
            if os.path.exists(path) and not overwrite:
                return utils.numpy_load(path, "perm")
    fname = fnames[1]
    os.makedirs(trainset_dir, exist_ok=True)
    path = os.path.join(trainset_dir, fname)
    url = (
        "https://github.com/jwcalder/GraphLearning/raw/master/LabelPermutations/"
        + fname
    )
    utils.download_file(url, path)
    return utils.numpy_load(path, "perm")
