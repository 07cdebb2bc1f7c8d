"""Degree-sorted segmented-ELL gather SpMM — the fast path for
band-hostile graphs.

High-dimensional kNN graphs (MNIST-style embeddings at 30+ dims) have no
usable band structure: measured on the 30-d Gaussian-mixture surrogate at
n=262k, the RCM band needs a 16k window to cover 44% of edges (occupancy
0.07%) and even cluster ordering caps at 64% coverage — every dense band
format is zero-stream-bound there (round-3 verdict, BASELINE_MEASURED
config-5a diagnosis).  The operative kernel is the row gather
(reference hot loop being replaced: ``utils.py:523`` scipy CSR SpMM).

Two measured facts on TPU v5e drive this design (scripts/gather_probe2.py
+ highdim_kernel_bench.py, 2026-08-21):

1. **The XLA row-gather rate cliffs on table BYTES**: ~4.5 ns/row while
   the gathered table is under ~100 MB, ~12.6 ns/row above (f32 X at
   n=262k d=128 is 134 MB -> slow; the bf16 copy is 67 MB -> fast).  A
   bf16 table with f32 accumulation ran 2.8x faster end-to-end at 4e-3
   relative error (fine for diffusion/threshold/GD solvers; exact CG
   keeps f32).  A hi/lo bf16x2 split-table was measured WORSE than f32
   (two tables re-enter the slow regime) — rejected.
2. **Slot padding is pure loss** at ~4.5 ns/slot: a single kcap=p95
   ELL pads the 30-d surrogate's 7.07M edges to 16.8M slots (2.4x).
   Sorting rows by degree and segmenting at power-of-2-ish boundaries
   bounds padding by the segment granularity instead.

``GatherSpMM`` = rows sorted by degree, split into static segments, each
segment a tight (rows_i, k_i) ELL gathered slot-by-slot; everything runs
in degree-sorted (permuted) space like ``AccelSpMM`` so chained solver
iterations pay the permutation twice total, not per step.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from graphlearning_tpu import config as _config

# segment kcap boundaries: padding within a segment is bounded by the
# gap to the next boundary (≤33%); degree-0 rows fold into the first
_BOUNDS = (4, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512,
           768, 1024, 2048, 4096)

# measured v5e gather-table cliff (see module docstring): tables under
# this stay at the ~4.5ns/row rate
_FAST_TABLE_BYTES = 100e6


class GatherSpMM:
    """Degree-sorted segmented gather SpMM for one graph.

    ``prec``: "f32" (exact) or "bf16" (table cast to bf16, f32
    accumulate — ~4e-3 rel err, 2.8x measured at n=262k d=128).
    "auto" picks bf16 only when the f32 table would cross the measured
    slow-table cliff for ``d_hint`` columns."""

    def __init__(self, W, prec: str = "f32", d_hint: int = 128):
        import scipy.sparse as sp

        W = sp.csr_matrix(W)
        n = W.shape[0]
        self.n = n
        self.nnz = int(W.nnz)
        deg = np.diff(W.indptr)
        order = np.argsort(deg, kind="stable")
        self.order = order
        self.inv = np.argsort(order)
        if prec == "auto":
            prec = ("bf16" if n * d_hint * 4 > _FAST_TABLE_BYTES
                    else "f32")
        self.prec = prec

        deg_s = deg[order]
        # segment ends at the last row whose degree fits each boundary
        self.segs = []          # (start, end, kcap) static metadata
        cols_list, vals_list = [], []
        start = 0
        for kcap in _BOUNDS:
            end = int(np.searchsorted(deg_s, kcap, side="right"))
            if end <= start:
                continue
            rows = order[start:end]
            a = W.indptr[rows].astype(np.int64)
            dseg = deg[rows].astype(np.int64)
            s_grid = np.arange(kcap, dtype=np.int64)[None, :]
            valid = s_grid < dseg[:, None]
            flat = np.minimum(a[:, None] + np.minimum(
                s_grid, np.maximum(dseg[:, None] - 1, 0)),
                max(self.nnz - 1, 0))
            # columns remapped to permuted space: the gather table is X
            # in degree-sorted order; invalid slots self-point with val 0
            cols = np.where(valid, self.inv[W.indices[flat]],
                            self.inv[rows][:, None]).astype(np.int32)
            vals = np.where(valid, W.data[flat], 0.0).astype(np.float32)
            cols_list.append(jnp.asarray(cols))
            vals_list.append(jnp.asarray(vals))
            self.segs.append((start, end, kcap))
            start = end
            if end == n:
                break
        assert start == n, "degree exceeds the largest segment boundary"
        self.cols = tuple(cols_list)
        self.vals = tuple(vals_list)
        self._order_dev = jnp.asarray(order)
        self._inv_dev = jnp.asarray(self.inv)

    # -- index maps (once per solve, outside iteration loops) -------------

    def to_perm(self, X):
        return jnp.take(jnp.asarray(X), self._order_dev, axis=0)

    def from_perm(self, Xp):
        return jnp.take(jnp.asarray(Xp), self._inv_dev, axis=0)

    # -- the SpMM (use inside jitted loops; all arrays are traced args) ---

    def spmm(self, Xp):
        """``(W @ X)`` in permuted space: ``Xp`` (n, d) degree-sorted."""
        return _seg_spmm(self.cols, self.vals, Xp,
                         segs=tuple(self.segs), prec=self.prec)


@functools.partial(jax.jit, static_argnames=("segs", "prec"))
def _seg_spmm(cols, vals, Xp, *, segs, prec):
    if prec == "bf16":
        table = Xp.astype(jnp.bfloat16)
    else:
        table = Xp
    outs = []
    for (start, end, kcap), c, v in zip(segs, cols, vals):
        acc = jnp.zeros((end - start, Xp.shape[1]), jnp.float32)
        for s in range(kcap):
            acc = acc + v[:, s:s + 1] * jnp.take(
                table, c[:, s], axis=0).astype(jnp.float32)
        outs.append(acc)
    return jnp.concatenate(outs, axis=0).astype(Xp.dtype)
