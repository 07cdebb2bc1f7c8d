"""ctypes loader for the host C++ oracle library.

Compiles ``oracles.cpp`` with g++ on first use (cached next to the source);
exposes numpy-friendly wrappers.  SURVEY.md §7.1 item 7: exact serial
oracles used by tests and as a low-latency path for tiny graphs.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_dir = os.path.dirname(os.path.abspath(__file__))
_src = os.path.join(_dir, "oracles.cpp")
_so = os.path.join(_dir, "liboracles.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_so) or os.path.getmtime(_so) < os.path.getmtime(_src):
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _src, "-o", _so]
        )
    lib = ctypes.CDLL(_so)
    lib.dijkstra_oracle.restype = None
    lib.peikonal_oracle.restype = None
    lib.peikonal_fmm_oracle.restype = None
    lib.lip_iterate_oracle.restype = None
    lib.auction_oracle.restype = None
    _lib = lib
    return lib


def _csr_parts(W):
    import scipy.sparse as sp

    W = sp.csr_matrix(W)
    return (
        np.ascontiguousarray(W.indptr, dtype=np.int64),
        np.ascontiguousarray(W.indices, dtype=np.int32),
        np.ascontiguousarray(W.data, dtype=np.float64),
        W.shape[0],
    )


def dijkstra_host(W, bdy_set, bdy_val=None, f=1, max_dist=np.inf, hopf_lax=False):
    """Exact serial Dijkstra on the host (oracle for the device
    Bellman-Ford iteration).  Returns (dist, cp)."""
    indptr, indices, data, n = _csr_parts(W)
    bdy_set = np.ascontiguousarray(np.asarray(bdy_set), dtype=np.int32)
    m = len(bdy_set)
    if bdy_val is None or np.isscalar(bdy_val):
        bdy_val = np.full(m, 0.0 if bdy_val is None else float(bdy_val))
    bdy_val = np.ascontiguousarray(bdy_val, dtype=np.float64)
    if np.isscalar(f) or np.ndim(f) == 0:
        f = np.full(n, float(f))
    f = np.ascontiguousarray(f, dtype=np.float64)
    dist = np.full(n, np.inf)
    cp = np.full(n, -1, dtype=np.int32)
    lib = _load()
    lib.dijkstra_oracle(
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int32(n),
        bdy_set.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        bdy_val.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int32(m),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_double(max_dist),
        ctypes.c_int32(1 if hopf_lax else 0),
        dist.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return dist, cp


def peikonal_host(W, bdy_set, bdy_val=0, f=1, p=1.0, max_num_it=10**5,
                  tol=1e-3, num_bisection_it=30):
    """Exact serial Gauss-Seidel p-eikonal oracle."""
    indptr, indices, data, n = _csr_parts(W)
    bdy_set = np.ascontiguousarray(np.asarray(bdy_set), dtype=np.int32)
    m = len(bdy_set)
    if np.isscalar(bdy_val) or np.ndim(bdy_val) == 0:
        bdy_val = np.full(m, float(bdy_val))
    bdy_val = np.ascontiguousarray(bdy_val, dtype=np.float64)
    if np.isscalar(f) or np.ndim(f) == 0:
        f = np.full(n, float(f))
    f = np.ascontiguousarray(f, dtype=np.float64)
    u = np.zeros(n)
    lib = _load()
    lib.peikonal_oracle(
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int32(n),
        bdy_set.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        bdy_val.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int32(m),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_double(p),
        ctypes.c_int32(int(max_num_it)),
        ctypes.c_double(tol),
        ctypes.c_int32(num_bisection_it),
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return u


def peikonal_fmm_host(W, bdy_set, bdy_val=0, f=1, p=1.0,
                      num_bisection_it=30):
    """Exact serial fast-marching p-eikonal oracle (heap-ordered
    single-pass; reference intent ``c_code/hjsolvers.cpp:342-420``)."""
    indptr, indices, data, n = _csr_parts(W)
    bdy_set = np.ascontiguousarray(np.asarray(bdy_set), dtype=np.int32)
    m = len(bdy_set)
    if np.isscalar(bdy_val) or np.ndim(bdy_val) == 0:
        bdy_val = np.full(m, float(bdy_val))
    bdy_val = np.ascontiguousarray(bdy_val, dtype=np.float64)
    if np.isscalar(f) or np.ndim(f) == 0:
        f = np.full(n, float(f))
    f = np.ascontiguousarray(f, dtype=np.float64)
    u = np.full(n, np.inf)
    lib = _load()
    lib.peikonal_fmm_oracle(
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int32(n),
        bdy_set.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        bdy_val.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int32(m),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_double(p),
        ctypes.c_int32(num_bisection_it),
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return u


def lip_iterate_host_mc(W, bdy_set, bdy_vals, alpha=0.0, beta=1.0,
                        weighted=False, max_num_it=10**5, tol=1e-6,
                        num_bisection_it=30):
    """One-vs-rest host Gauss-Seidel lip iteration with the C classes
    solved in PARALLEL threads (ctypes releases the GIL during the C
    call).  The reference runs its one-vs-rest loop serially
    (reference ssl.py:1710-1727 + graph.py:1232-1279); class-parallel
    sweeps are the host-native speedup the serial C design left on the
    table.  ``bdy_vals``: (m, C); returns (n, C)."""
    from concurrent.futures import ThreadPoolExecutor

    bdy_vals = np.asarray(bdy_vals, dtype=float)
    C = bdy_vals.shape[1]
    _load()                       # build once before the threads race
    with ThreadPoolExecutor(max_workers=min(C, os.cpu_count() or 1)) as ex:
        cols = list(ex.map(
            lambda c: lip_iterate_host(
                W, bdy_set, bdy_vals[:, c], alpha=alpha, beta=beta,
                weighted=weighted, max_num_it=max_num_it, tol=tol,
                num_bisection_it=num_bisection_it),
            range(C)))
    return np.stack(cols, axis=1)


def lip_iterate_host(W, bdy_set, bdy_val, alpha=0.0, beta=1.0,
                     weighted=False, max_num_it=10**5, tol=1e-6,
                     num_bisection_it=30):
    """Exact serial Gauss-Seidel AMLE / game-theoretic p-Laplace oracle
    (reference intent ``c_code/lp_iterate.cpp:129-259``).  weighted=True
    solves ``min_j w(t-u_j) + max_j w(t-u_j) = 0`` per node by bisection;
    otherwise ``u = alpha*avg + beta*(min+max)/2``."""
    indptr, indices, data, n = _csr_parts(W)
    bdy_set = np.ascontiguousarray(np.asarray(bdy_set), dtype=np.int32)
    m = len(bdy_set)
    if np.isscalar(bdy_val) or np.ndim(bdy_val) == 0:
        bdy_val = np.full(m, float(bdy_val))
    bdy_val = np.ascontiguousarray(np.asarray(bdy_val), dtype=np.float64)
    u = np.zeros(n)
    lib = _load()
    lib.lip_iterate_oracle(
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int32(n),
        bdy_set.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        bdy_val.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int32(m),
        ctypes.c_double(alpha),
        ctypes.c_double(beta),
        ctypes.c_int32(1 if weighted else 0),
        ctypes.c_int32(int(max_num_it)),
        ctypes.c_double(tol),
        ctypes.c_int32(num_bisection_it),
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return u


def auction_host(a, target, fixed=None, eps0=None, eps_min=1e-6, scale=4.0):
    """Volume-constrained assignment oracle: Bertsekas forward auction with
    eps-scaling and per-class capacities (reference intent
    ``c_code/mbo_convolution.cpp:248-316``).  Maximizes ``sum_i a[i, c_i]``
    subject to exact class counts ``target`` (must sum to n).  ``fixed``
    pins nodes (-1 = free).  Returns int32 labels."""
    a = np.ascontiguousarray(np.asarray(a, dtype=np.float64))
    n, kcls = a.shape
    target = np.ascontiguousarray(np.asarray(target), dtype=np.int32)
    assert target.sum() == n, (target.sum(), n)
    if fixed is None:
        fixed = np.full(n, -1, dtype=np.int32)
    fixed = np.ascontiguousarray(np.asarray(fixed), dtype=np.int32)
    if eps0 is None:
        spread = float(a.max() - a.min()) if n else 1.0
        eps0 = max(spread / 4.0, eps_min)
    labels = np.full(n, -1, dtype=np.int32)
    lib = _load()
    lib.auction_oracle(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int32(n),
        ctypes.c_int32(kcls),
        target.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        fixed.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_double(eps0),
        ctypes.c_double(eps_min),
        ctypes.c_double(scale),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return labels
