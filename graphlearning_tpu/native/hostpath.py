"""Cost-gated host fast path for tiny graphs.

Through the remote-TPU tunnel every dispatch costs milliseconds, so a
two-moons-sized fit (n~2000) pays a dispatch floor the math never
amortizes (round-1 BASELINE_MEASURED config 1: 0.07s warm vs the
reference's 0.06s on host).  Below ``small_n_threshold()`` nodes — and
only when the default backend is a (remote) TPU — the distance solvers
route to the serial C++ oracles (``native/oracles.cpp``) and Laplace
learning to a direct sparse factorization, both strictly faster than the
reference's scipy CG / C heap path on the same hardware (one LU solve
replaces an iterative solve; reference ``ssl.py:1236-1255``,
``graph.py:910-912,1168-1170``).

Disable with ``GLT_NO_HOSTPATH=1``; threshold via ``GLT_HOST_SMALL_N``.
"""

from __future__ import annotations

import os

import numpy as np

from graphlearning_tpu import config as _config


def small_n_threshold() -> int:
    return int(os.environ.get("GLT_HOST_SMALL_N", 4096))


def use_host(n: int) -> bool:
    """True when the host path wins: tiny graph + remote-TPU backend
    (on a CPU backend the device path already runs on the host)."""
    if os.environ.get("GLT_NO_HOSTPATH"):
        return False
    if n > small_n_threshold():
        return False
    if not _config.is_tpu():
        return False
    try:
        from graphlearning_tpu import native

        native._load()
        return True
    except Exception:  # oracle lib unavailable — stay on device
        return False


def use_host_lip(n: int, nnz: int, accel=None) -> bool:
    """Host-vs-device choice for the lip (p-Laplace/AMLE) fixed point.

    The device band kernels stream dense (R, WT) tiles; on graphs whose
    RCM/cluster band is almost empty (high-dimensional kNN — no 1-D
    locality) >98% of the streamed bytes are zeros and the class-parallel
    host Gauss-Seidel (``native.lip_iterate_host_mc``) wins: it touches
    only real edges and converges in reference-like sweep counts
    (measured at the CIFAR-surrogate config 5a: device tiled-Jacobi 1.97s
    vs reference C 0.94s vs class-parallel host ~0.2s).  Band-friendly
    graphs (2-D/low-dim kNN, occupancy >= ~2%) stay on device."""
    if os.environ.get("GLT_NO_HOSTPATH"):
        return False
    if not _config.is_tpu():
        return False
    if n <= small_n_threshold():
        return _native_ok()
    if nnz > 5e7:                 # host sweeps no longer feasible
        return False
    if accel is None or not getattr(accel, "materialize", False):
        return _native_ok()       # device would pay the raw-gather path
    # cost model (both sides measured at the 5a config, 2026-08-21):
    # host GS touches only real edges, ~35 sweeps x ~3 ns/edge; the
    # device block-GS streams the RECTANGULAR band (accel.rect_band_bytes
    # — NOT the tiles-overwritten Wwin) ~35 sweeps at ~819 GB/s, and is
    # only viable at all when that band fits the HBM budget.
    host_s = nnz * 35 * 3e-9
    if hasattr(accel, "rect_band_bytes"):
        if not accel.rect_band_ok():
            return _native_ok()   # device GS path unavailable
        device_s = 35 * accel.rect_band_bytes() / 819e9
    else:
        bpc = 2 if getattr(accel, "_band_dtype", None) == jnp_bf16() else 4
        device_s = 700 * accel.n_pad * accel.Wwin * bpc / 819e9
    if host_s >= device_s:
        return False
    return _native_ok()


def _native_ok() -> bool:
    """True only when the host oracle library loads (ADVICE r3: every
    host-path True must be guarded, or fits raise inside the compile
    step on hosts without a toolchain)."""
    try:
        from graphlearning_tpu import native

        native._load()
        return True
    except Exception:  # oracle lib unavailable — stay on device
        return False


def jnp_bf16():
    import jax.numpy as jnp

    return jnp.bfloat16


def _laplacian(W, normalization: str):
    import scipy.sparse as sp

    n = W.shape[0]
    deg = np.asarray(W.sum(1)).ravel()
    if normalization == "combinatorial":
        return sp.spdiags(deg, 0, n, n) - W
    if normalization == "randomwalk":
        return sp.eye(n) - sp.spdiags(1.0 / deg, 0, n, n) @ W
    if normalization == "normalized":
        s = 1.0 / np.sqrt(deg)
        return sp.eye(n) - sp.spdiags(s, 0, n, n) @ W @ sp.spdiags(s, 0, n, n)
    raise ValueError(f"unsupported normalization {normalization!r}")


def laplace_host(W, mask, bdy_values, tau, normalization="combinatorial",
                 order: int = 1):
    """Direct host solve of ``(tau + L)^order u = 0`` with ``u = bdy`` on
    ``mask`` (reference ``ssl.py:1236-1255`` semantics): one sparse LU of
    the unlabeled block serves every class column — exact, and faster than
    both the reference's CG and the device round-trips at tiny n."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    n = W.shape[0]
    M = _laplacian(W.astype(np.float64), normalization)
    tau = np.broadcast_to(np.atleast_1d(tau), (n,)).astype(float)
    if tau.max() > 0:
        M = M + sp.spdiags(tau, 0, n, n)
    if order > 1:
        M0 = M.tocsr()
        for _ in range(order - 1):
            M = M @ M0
    M = M.tocsr()
    idx = ~np.asarray(mask, dtype=bool)
    A = M[idx][:, idx].tocsc()
    b = -M[idx][:, ~idx] @ np.asarray(bdy_values, dtype=np.float64)[~idx]
    u = np.array(bdy_values, dtype=np.float64)
    u[idx] = spla.splu(A).solve(np.asarray(b))
    return u
