"""Device-resident sparse graph container (padded ELL layout).

TPU-first design (SURVEY.md §7.1): instead of the reference's scipy CSR +
``I,J,V,K`` int32/float64 C-marshalling copies (reference ``graph.py:69-84``),
the graph lives on device as a pair of dense ``(n, k)`` arrays:

  * ``cols[i, j]`` — column index of the j-th stored entry of row i
    (padded entries point at row ``i`` itself, a always-valid gather target),
  * ``vals[i, j]`` — the weight (padded entries are exactly ``0``),
  * ``deg[i]``     — number of valid entries in row i (valid entries first).

This is a perfectly regular layout: every neighborhood aggregation is a
dense gather + a reduction over the fixed ``k`` axis, which XLA tiles onto
the VPU/MXU without dynamic shapes.  The padding mask is never materialised;
it is recomputed as ``iota(k) < deg[:, None]`` (free on the VPU).

Rows with degree skew beyond ``k`` are handled at construction time by
choosing ``k = max_degree`` (optionally rounded up); a bucketed ELL+COO
hybrid is a planned optimisation (SURVEY.md §7.3 "Padded CSR load balance").
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from graphlearning_tpu import config


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["cols", "vals", "deg"],
    meta_fields=["n", "k"],
)
class SparseGraph:
    """Padded-ELL sparse matrix / weighted graph, a JAX pytree.

    Semantically equivalent to a scipy CSR matrix ``W`` of shape ``(n, n)``
    (reference ``graph.graph``'s ``weight_matrix``), but laid out for TPU.
    """

    def __init__(self, cols, vals, deg, n: int, k: int):
        self.cols = cols
        self.vals = vals
        self.deg = deg
        self.n = n
        self.k = k

    # -- construction -----------------------------------------------------

    @staticmethod
    def ell_from_scipy(W, k: int | None = None):
        """Host-only ELL assembly: ``(cols, vals, deg)`` numpy arrays.
        Lets planners work without a host→device→host round-trip (the
        remote-TPU tunnel makes each transfer expensive)."""
        import scipy.sparse as sp

        W = sp.csr_matrix(W)
        n = W.shape[0]
        deg_np = np.diff(W.indptr).astype(np.int32)
        kmax = int(deg_np.max()) if n > 0 and deg_np.size else 1
        if k is None:
            k = max(1, kmax)
        elif k < kmax:
            raise ValueError(f"k={k} < max row degree {kmax}")
        cols_np = np.repeat(np.arange(n, dtype=np.int32)[:, None], k, axis=1)
        vals_np = np.zeros((n, k), dtype=np.float64)
        # scatter CSR entries into the padded rows
        rows = np.repeat(np.arange(n), deg_np)
        slot = np.arange(W.indptr[-1]) - np.repeat(W.indptr[:-1], deg_np)
        cols_np[rows, slot] = W.indices.astype(np.int32)
        vals_np[rows, slot] = W.data
        return cols_np, vals_np, deg_np

    @staticmethod
    def from_ell_np(cols_np, vals_np, deg_np, dtype=None) -> "SparseGraph":
        """Transfer host-assembled ELL arrays to device (one transfer)."""
        dtype = dtype or config.float_dtype()
        n, k = cols_np.shape
        return SparseGraph(
            cols=jnp.asarray(cols_np, dtype=config.index_dtype),
            vals=jnp.asarray(vals_np, dtype=dtype),
            deg=jnp.asarray(deg_np, dtype=config.index_dtype),
            n=n,
            k=k,
        )

    @staticmethod
    def from_scipy(W, k: int | None = None, dtype=None) -> "SparseGraph":
        """Build from any scipy sparse matrix (host-side, one-time setup)."""
        cols_np, vals_np, deg_np = SparseGraph.ell_from_scipy(W, k=k)
        return SparseGraph.from_ell_np(cols_np, vals_np, deg_np, dtype=dtype)

    @staticmethod
    def from_coo(rows, cols, vals, n: int, k: int | None = None, dtype=None) -> "SparseGraph":
        import scipy.sparse as sp

        W = sp.coo_matrix((np.asarray(vals), (np.asarray(rows), np.asarray(cols))), shape=(n, n))
        return SparseGraph.from_scipy(W, k=k, dtype=dtype)

    @staticmethod
    def from_knn(knn_ind, knn_weight, n: int | None = None, dtype=None) -> "SparseGraph":
        """Build directly from a dense kNN result: ``knn_ind, knn_weight`` of
        shape ``(n, k)``.  All rows have full degree k — no padding waste.
        Device-side construction path (no scipy round-trip)."""
        knn_ind = jnp.asarray(knn_ind, dtype=config.index_dtype)
        dtype = dtype or config.float_dtype()
        knn_weight = jnp.asarray(knn_weight, dtype=dtype)
        n = n or knn_ind.shape[0]
        k = knn_ind.shape[1]
        deg = jnp.full((n,), k, dtype=config.index_dtype)
        return SparseGraph(cols=knn_ind, vals=knn_weight, deg=deg, n=n, k=k)

    # -- conversion -------------------------------------------------------

    def to_scipy(self):
        """Convert back to scipy CSR (host-side; drops padding)."""
        import scipy.sparse as sp

        cols = np.asarray(self.cols)
        vals = np.asarray(self.vals)
        deg = np.asarray(self.deg)
        mask = np.arange(self.k)[None, :] < deg[:, None]
        rows = np.repeat(np.arange(self.n), deg)
        W = sp.coo_matrix(
            (vals[mask], (rows, cols[mask])), shape=(self.n, self.n)
        )
        return W.tocsr()

    def todense(self):
        return np.asarray(self.to_scipy().todense())

    # -- basic properties -------------------------------------------------

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n, self.n)

    @property
    def nnz(self) -> int:
        return int(np.asarray(self.deg).sum())

    def mask(self):
        """(n, k) bool validity mask, recomputed on the fly (never stored)."""
        return (
            jax.lax.broadcasted_iota(jnp.int32, (self.n, self.k), 1)
            < self.deg[:, None]
        )

    def reorder_rcm(self):
        """Reverse-Cuthill-McKee reordering (host-side): returns
        ``(reordered_graph, perm)`` with ``perm`` mapping new→old indices.
        Minimises bandwidth so the banded Pallas SpMM kernel
        (``ops/pallas_spmm.py``) covers almost all edges in-window."""
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        W = self.to_scipy()
        perm = np.asarray(reverse_cuthill_mckee(W, symmetric_mode=True))
        Wp = W[perm, :][:, perm]
        return SparseGraph.from_scipy(Wp, dtype=self.vals.dtype), perm

    def transpose(self) -> "SparseGraph":
        """Transpose (host-side rebuild).  Symmetric graphs can skip this."""
        return SparseGraph.from_scipy(self.to_scipy().T.tocsr(), dtype=self.vals.dtype)

    def astype(self, dtype) -> "SparseGraph":
        return SparseGraph(self.cols, self.vals.astype(dtype), self.deg, self.n, self.k)

    def with_vals(self, vals) -> "SparseGraph":
        """Same sparsity pattern, new values (must already be 0 on padding)."""
        return SparseGraph(self.cols, vals, self.deg, self.n, self.k)

    def __repr__(self):
        return (
            f"SparseGraph(n={self.n}, k={self.k}, nnz={int(np.asarray(self.deg).sum())}, "
            f"dtype={self.vals.dtype})"
        )


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["main", "sp_rows", "sp_cols", "sp_vals"],
    meta_fields=["kcap", "m"],
)
class BucketedELL:
    """ELL+COO hybrid (SURVEY.md §7.3 'padded CSR load balance'): degree
    skew after symmetrization makes a single padded ELL wasteful — one hub
    of degree 255 pads EVERY row's gather to 255 slots.  ``main`` holds the
    first ``kcap`` slots per row; the tail of high-degree rows spills into
    flat COO arrays reduced with ``jax.ops.segment_*`` (spill slot count is
    a fixed, padded shape; padding rows carry id ``n`` and reduce into a
    discarded extra segment)."""

    def __init__(self, main: SparseGraph, sp_rows, sp_cols, sp_vals,
                 kcap: int, m: int):
        self.main = main
        self.sp_rows = sp_rows
        self.sp_cols = sp_cols
        self.sp_vals = sp_vals
        self.kcap = kcap
        self.m = m            # real (unpadded) spill count

    @staticmethod
    def from_ell_np(cols_np, vals_np, deg_np, kcap: int | None = None,
                    dtype=None):
        """Host-side split of padded-ELL arrays (from
        :meth:`SparseGraph.ell_from_scipy`)."""
        dtype = dtype or config.float_dtype()
        n, k = cols_np.shape
        if kcap is None:
            # 95th-percentile degree, multiple of 8: covers almost all
            # rows; hub tails spill
            kcap = int(np.percentile(deg_np, 95)) if n else 1
            kcap = max(8, _round_up(max(kcap, 1), 8))
        kcap = min(kcap, k)
        main_deg = np.minimum(deg_np, kcap).astype(np.int32)
        main = SparseGraph.from_ell_np(cols_np[:, :kcap], vals_np[:, :kcap],
                                       main_deg, dtype=dtype)
        hub = np.nonzero(deg_np > kcap)[0]
        rows, cols, vals = [], [], []
        for r in hub:
            d = int(deg_np[r])
            rows.append(np.full(d - kcap, r, np.int32))
            cols.append(cols_np[r, kcap:d].astype(np.int32))
            vals.append(vals_np[r, kcap:d])
        m = int(sum(len(x) for x in rows))
        mp = max(128, _round_up(m, 128))
        sp_rows = np.full(mp, n, np.int32)          # pad -> segment n (dropped)
        sp_cols = np.zeros(mp, np.int32)
        sp_vals = np.zeros(mp, np.float64)
        if m:
            sp_rows[:m] = np.concatenate(rows)
            sp_cols[:m] = np.concatenate(cols)
            sp_vals[:m] = np.concatenate(vals)
        return BucketedELL(main, jnp.asarray(sp_rows), jnp.asarray(sp_cols),
                           jnp.asarray(sp_vals, dtype=dtype),
                           kcap=int(kcap), m=m)

    @staticmethod
    def from_scipy(W, kcap: int | None = None, dtype=None):
        cols_np, vals_np, deg_np = SparseGraph.ell_from_scipy(W)
        return BucketedELL.from_ell_np(cols_np, vals_np, deg_np, kcap=kcap,
                                       dtype=dtype)

    @property
    def n(self):
        return self.main.n

    def spill_reduce(self, slot_vals, kind: str, fill):
        """Reduce per-spill-slot values into per-row values: (m_pad,) ->
        (n,) or (m_pad, C) -> (n, C).  ``kind`` in sum/min/max; rows with
        no spill get ``fill``."""
        n = self.main.n
        seg = {"sum": jax.ops.segment_sum, "min": jax.ops.segment_min,
               "max": jax.ops.segment_max}[kind]
        out = seg(slot_vals, self.sp_rows, num_segments=n + 1)[:n]
        if kind != "sum":
            has = jax.ops.segment_sum(
                jnp.ones_like(self.sp_rows, jnp.int32), self.sp_rows,
                num_segments=n + 1)[:n] > 0
            shape = has.reshape((-1,) + (1,) * (slot_vals.ndim - 1))
            out = jnp.where(shape, out, jnp.asarray(fill, out.dtype))
        return out
