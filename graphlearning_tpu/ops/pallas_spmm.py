"""Pallas TPU SpMM kernel for banded ELL graphs.

XLA's dynamic gather on TPU costs ~10ns per index regardless of locality
(measured: 1e8 edges/s for any d — per-index overhead bound).  The
TPU-native fix (SURVEY.md §7.1 item 2): exploit the bandedness of
RCM-reordered kNN graphs and turn the gather into dense MXU work:

  * each row-block's edges fall inside a window of ``W`` feature rows,
    quantized to multiples of the tile size ``WT`` so the window tiles are
    ordinary ``BlockSpec`` inputs (Mosaic double-buffers the HBM→VMEM DMAs
    automatically),
  * per (row-block, window-tile) grid step, scatter the edge weights into
    a dense ``(R, WT)`` block ``A`` of the weight matrix via k VPU
    compare+select passes (no gather),
  * accumulate ``out += A @ x_tile`` on the MXU across the tile grid axis
    (the out block only depends on the row-block index, so Mosaic keeps it
    resident in VMEM between tile steps).

Edges falling outside the window (a tiny residual for RCM-reordered kNN
graphs — plan_banded auto-sizes W to make it ≈0) are handled by the
caller through the XLA gather path — the ELL+COO hybrid of SURVEY.md §7.3.

Replaces the reference's scipy CSR SpMM hot loop (utils.py:523) for the
single-chip fast path.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _banded_kernel(winstart_ref, cols_ref, vals_ref, x_ref, out_ref,
                   *, WT: int, k: int):
    i = pl.program_id(0)
    t = pl.program_id(1)
    base = winstart_ref[i] + t * WT                  # tile start (abs rows)

    R = cols_ref.shape[0]
    local = cols_ref[:] - base                       # (R, k) tile-local cols
    in_tile = (local >= 0) & (local < WT)
    local = jnp.clip(local, 0, WT - 1)
    w = jnp.where(in_tile, vals_ref[:], 0.0)

    # Dense (R, WT) block of the weight matrix: k VPU compare+select passes
    # (no gather).  Duplicate columns accumulate.
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, WT), 1)
    A = jnp.zeros((R, WT), dtype=out_ref.dtype)
    for j in range(k):
        A = A + jnp.where(
            col_ids == local[:, j][:, None], w[:, j][:, None], 0.0
        )

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # HIGHEST: f32 MXU via multi-pass bf16 decomposition — without it the
    # default single-pass bf16 gives ~1e-2 error vs the VPU reference
    out_ref[:] += jax.lax.dot_general(
        A, x_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=out_ref.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def banded_spmm(cols, vals, winstart, X, W: int = 1024, R: int = 512,
                WT: int = 1024, interpret: bool = False):
    """``out[i] = sum_j vals[i,j] * X[cols[i,j]]`` for edges inside each
    row-block's window ``[winstart[b], winstart[b]+W)``; out-of-window
    edges contribute 0 (caller adds the residual).

    Args:
      cols, vals: (n, k) ELL arrays, n a multiple of R and of WT.
      winstart: (n // R,) int32 window starts — multiples of WT,
        each in [0, n - W] (plan_banded quantizes).
      X: (n, d) features, d a multiple of 128 (pad first).
      W: window size (multiple of WT).
      WT: window tile size (the BlockSpec unit for X; multiple of 128).
    """
    n, k = cols.shape
    d = X.shape[1]
    WT = min(WT, W)
    assert (n % R == 0 and n % WT == 0 and W % WT == 0 and WT % 128 == 0
            and d % 128 == 0), (n, R, W, WT, d)
    grid = (n // R, W // WT)

    kernel = functools.partial(_banded_kernel, WT=WT, k=k)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((R, k), lambda i, t, ws: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, k), lambda i, t, ws: (i, 0),
                             memory_space=pltpu.VMEM),
                # window tile: index_map reads the prefetched winstart
                pl.BlockSpec((WT, d), lambda i, t, ws: (ws[i] // WT + t, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, d), lambda i, t, ws: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n, d), X.dtype),
        interpret=interpret,
    )(winstart, cols, vals, X)


# -- host-side planning ---------------------------------------------------


def plan_banded(cols_np, R: int = 512, W: int | None = None, WT: int = 1024,
                max_residual: float = 0.002, max_W: int = 16384):
    """Compute per-row-block window starts and the residual (out-of-window)
    edge list.

    When ``W is None``, auto-select the smallest window (multiple of WT,
    capped at ``max_W`` and at n) whose residual edge fraction is below
    ``max_residual`` — a zero/near-zero residual skips the expensive XLA
    scatter fallback entirely.  Window starts are quantized to multiples
    of ``WT`` (the kernel's BlockSpec unit).

    Returns ``(winstart, residual_rows, residual_slots, W)``.
    """
    n, k = cols_np.shape
    assert n % R == 0 and n % WT == 0
    nblocks = n // R
    blocks = cols_np.reshape(nblocks, R * k)
    med = np.median(blocks, axis=1)

    def residuals(Wc):
        ws = np.clip(med - Wc // 2, 0, max(0, n - Wc))
        ws = (ws // WT).astype(np.int64) * WT        # quantize to WT
        ws = np.clip(ws, 0, max(0, n - Wc)).astype(np.int32)
        lo = ws[:, None]
        out = (blocks < lo) | (blocks >= lo + Wc)
        return ws, out.reshape(n, k)

    if W is None:
        # A-build cost ∝ W: grow in WT increments (not doubling) to the
        # smallest window meeting the residual target.  For an RCM-ordered
        # graph of bandwidth B, the needed W ≈ R + 2B + WT quantization.
        cap = min(max_W, max(WT, (n // WT) * WT))
        W = WT
        while True:
            winstart, out_mask = residuals(W)
            if out_mask.mean() <= max_residual or W >= cap:
                break
            W += WT
    assert W % WT == 0 and W <= n, (W, WT, n)
    winstart, out_mask = residuals(W)
    ridx = np.argwhere(out_mask)
    return (winstart, ridx[:, 0].astype(np.int32),
            ridx[:, 1].astype(np.int32), int(W))


def spmm_banded_hybrid(g, X, plan, W: int | None = None, R: int = 512,
                       WT: int = 1024, interpret: bool = False):
    """Banded Pallas kernel + XLA gather for the residual edges
    (ELL+COO hybrid).  ``plan`` comes from :func:`plan_banded`; its
    auto-selected window is used unless ``W`` overrides it."""
    winstart, rrows, rslots, planW = plan
    if W is None:
        W = planW
    n, k = g.cols.shape
    d = X.shape[1]
    d_pad = (-d) % 128
    Xp = jnp.pad(X, ((0, 0), (0, d_pad))) if d_pad else X
    out = banded_spmm(g.cols, g.vals, jnp.asarray(winstart), Xp, W=W, R=R,
                      WT=WT, interpret=interpret)
    if len(rrows):
        # the kernel zeroed out-of-window edges; add their contribution here
        rcols = g.cols[rrows, rslots]
        rvals = g.vals[rrows, rslots]
        contrib = rvals[:, None] * jnp.take(Xp, rcols, axis=0)
        out = out.at[rrows].add(contrib)
    return out[:, :d] if d_pad else out
