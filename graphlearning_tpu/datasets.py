"""Dataset store (reference ``graphlearning/datasets.py``): npz-based with
lazy download; label files are format-compatible with the reference's
``Data/*.npz`` (field ``labels``) and graph pickles.  In offline
environments, falls back to the reference's bundled ``Data/`` directory."""

from __future__ import annotations

import os
import pickle

import numpy as np

from graphlearning_tpu import utils


class _RefShim:
    """Stand-in for reference ``graphlearning`` classes inside pickles:
    captures the pickled ``__dict__`` (weight_matrix etc.) without needing
    the reference package importable."""

    def __setstate__(self, state):
        self.__dict__.update(state)


class _RefUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.split(".")[0] == "graphlearning":
            return _RefShim
        return super().find_class(module, name)

data_dir = os.path.abspath(os.path.join(os.getcwd(), "data"))

_REFERENCE_DATA = "/root/reference/Data"

_GITHUB = "https://github.com/jwcalder/GraphLearning/raw/master/Data/"
_UMN = "http://www-users.math.umn.edu/~jwcalder/Data/"


def _find(fname):
    for d in (data_dir, _REFERENCE_DATA):
        path = os.path.join(d, fname)
        if os.path.exists(path):
            return path
    return None


def load(dataset, metric="raw", labels_only=False):
    """Load dataset features + labels (reference ``datasets.py:19-93``).
    ``metric`` in {'raw','vae','vae_old','simclr','aet'} selects the
    embedding npz."""
    dataset = dataset.lower()
    labels = None
    # labels npz — check offline copies first
    for cand in (dataset + "_labels.npz", dataset.upper() + "_labels.npz",
                 dataset.capitalize() + "_labels.npz"):
        path = _find(cand)
        if path is not None:
            labels = utils.numpy_load(path, "labels")
            break
    if labels is None:
        fname = dataset + "_labels.npz"
        os.makedirs(data_dir, exist_ok=True)
        path = os.path.join(data_dir, fname)
        utils.download_file(_GITHUB + fname, path)
        labels = utils.numpy_load(path, "labels")
    if labels_only:
        return labels

    fname = dataset + "_" + metric.lower() + ".npz"
    path = _find(fname)
    if path is None:
        os.makedirs(data_dir, exist_ok=True)
        path = os.path.join(data_dir, fname)
        utils.download_file(_UMN + fname, path)
    data = utils.numpy_load(path, "data")
    return data, labels


def save(data, labels, dataset, metric="raw", overwrite=False):
    dataset = dataset.lower()
    os.makedirs(data_dir, exist_ok=True)
    dpath = os.path.join(data_dir, dataset + "_" + metric.lower() + ".npz")
    lpath = os.path.join(data_dir, dataset + "_labels.npz")
    if overwrite or not os.path.exists(dpath):
        np.savez_compressed(dpath, data=data)
    if overwrite or not os.path.exists(lpath):
        np.savez_compressed(lpath, labels=labels)


def load_graph(name):
    """Load a pickled graph (karate, cora, citeseer, pubmed, webkb*, ...;
    reference ``datasets.py:96-160``)."""
    from graphlearning_tpu.core.graphclass import graph

    fname = name.lower() + ".pkl"
    path = _find(fname)
    if path is None:
        os.makedirs(data_dir, exist_ok=True)
        path = os.path.join(data_dir, fname)
        utils.download_file(_GITHUB + fname, path)
    with open(path, "rb") as fh:
        obj = _RefUnpickler(fh).load()
    if hasattr(obj, "weight_matrix"):
        return graph(obj.weight_matrix)
    if isinstance(obj, dict) and "W" in obj:
        return graph(obj["W"])
    return graph(obj)


def load_image(name):
    """Load a demo image npz (reference ``datasets.py:200-240``)."""
    fname = name.lower() + ".npz"
    path = _find(fname)
    if path is None:
        os.makedirs(data_dir, exist_ok=True)
        path = os.path.join(data_dir, fname)
        utils.download_file(_GITHUB + "Images/" + fname, path)
    return utils.numpy_load(path, "image")


def two_skies(n, sigma=0.15, sep=0.64, seed=None, noise=None):
    """Synthetic two-skies dataset (reference ``datasets.py:19-45``
    signature: ``sigma`` is the sky standard deviation; ``noise`` kept as
    a deprecated alias)."""
    if noise is not None:
        sigma = noise
    rs = np.random.RandomState(seed)
    m = n // 2
    X1 = np.vstack((rs.rand(m), sigma * rs.randn(m) - sep / 2)).T
    X2 = np.vstack((rs.rand(n - m), sigma * rs.randn(n - m) + sep / 2)).T
    X = np.vstack((X1, X2))
    labels = np.hstack((np.zeros(m, dtype=int), np.ones(n - m, dtype=int)))
    return X, labels
